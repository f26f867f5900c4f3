"""Bucketed range join semantics (operators/rangejoin.py)."""

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def tables(spark):
    points = spark.createDataFrame(
        [
            # (pid, key, ts)
            (0, "a", 0),
            (1, "a", 5),
            (2, "a", 10),   # exactly at a hi bound
            (3, "a", 17),
            (4, "b", 5),    # same time as pid 1, other key
            (5, "a", 100),  # far outside every interval
        ],
        "pid long, key string, ts long",
    )
    intervals = spark.createDataFrame(
        [
            # (iid, key, lo, hi)
            (10, "a", 0, 10),
            (11, "a", 5, 20),   # overlaps interval 10
            (12, "b", 0, 50),
            (13, "a", 30, 40),  # empty
        ],
        "iid long, key string, lo long, hi long",
    )
    return points, intervals


def _pairs(df):
    return {(r["pid"], r["iid"]) for r in df.collect()}


def test_matches_naive_theta_join(spark, tables):
    """Bucketed equi-join + filter == the naive BETWEEN theta join, and no
    (point, interval) pair is emitted twice, for every bucket width."""
    points, intervals = tables
    naive = points.join(
        intervals.withColumnRenamed("key", "ikey"),
        (F.col("key") == F.col("ikey")) & (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")),
    )
    want = _pairs(naive)
    assert want  # non-vacuous fixture
    for width in (1, 3, 7, 1000):  # narrower / comparable / wider than spans
        got_df = range_join(
            points, intervals, "ts", "lo", "hi", bucket_width=width, keys=["key"]
        )
        assert _pairs(got_df) == want
        assert got_df.count() == len(want)  # exactly-once, no dedup needed


def test_closed_both_includes_hi(spark, tables):
    points, intervals = tables
    left = _pairs(range_join(points, intervals, "ts", "lo", "hi", 7, keys=["key"]))
    both = _pairs(
        range_join(points, intervals, "ts", "lo", "hi", 7, keys=["key"], closed="both")
    )
    assert (2, 10) not in left  # ts == hi excluded half-open
    assert (2, 10) in both
    assert left < both


def test_no_keys_pure_time_join(spark, tables):
    """Without equality keys every containing interval matches regardless of
    key columns — drop the key columns so names don't collide."""
    points, intervals = tables
    p = points.drop("key")
    iv = intervals.drop("key")
    got = _pairs(range_join(p, iv, "ts", "lo", "hi", bucket_width=7))
    assert (4, 10) in got  # b-key point now matches a-key interval
    assert (5, 12) not in got  # time containment still enforced


def test_bad_closed_raises(spark, tables):
    points, intervals = tables
    with pytest.raises(ValueError, match="closed"):
        range_join(points, intervals, "ts", "lo", "hi", 7, closed="right")


from hypothesis import given, settings, strategies as st

ts_int = st.integers(min_value=-50, max_value=50)


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(ts_int, min_size=1, max_size=12),
    ivs=st.lists(st.tuples(ts_int, ts_int), min_size=1, max_size=8),
    width=st.sampled_from([1, 4, 9, 64]),
)
def test_property_matches_naive(spark, pts, ivs, width):
    """For arbitrary points/intervals (including degenerate hi < lo) and any
    bucket width, the bucketed join equals the naive theta join exactly."""
    p = spark.createDataFrame([(i, t) for i, t in enumerate(pts)], "pid long, ts long")
    iv = spark.createDataFrame([(i, lo, hi) for i, (lo, hi) in enumerate(ivs)], "iid long, lo long, hi long")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, iv, "ts", "lo", "hi", bucket_width=width).collect()
    }
    want = {
        (i, j)
        for i, t in enumerate(pts)
        for j, (lo, hi) in enumerate(ivs)
        if lo <= t < hi
    }
    assert got == want
