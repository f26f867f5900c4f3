"""Sessionize (operators/sessionize.py): the chunked hot-key-guarded form
matches the plain one-window form row-for-row, including on a synthetic hot
key, and the guard actually bounds per-window-group input."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.sessionize import sessionize


def _canon(df):
    return sorted(
        (r["user_id"], r["session_no"], r["n_events"], r["start"], r["end"])
        for r in df.collect()
    )


def test_chunked_matches_plain_on_fixture(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.select(
        "user_id", F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"), "event_id"
    )
    plain = sessionize(ev, "user_id", "sec", gap=1800, order_col="event_id")
    for span in (3600, 1800, 600):  # incl. spans smaller than the gap
        chunked = sessionize(
            ev, "user_id", "sec", gap=1800, order_col="event_id", chunk_span=span
        )
        assert _canon(chunked) == _canon(plain), f"span={span}"


@pytest.fixture(scope="module")
def hot_key_events(spark):
    """10^5 events on ONE key: dense 10 s cadence with silences > gap every
    10_000 events, plus a handful of cold keys."""
    hot = spark.range(100_000).select(
        F.lit(7).alias("user_id"),
        (F.col("id") * 10 + (F.col("id") / 10_000).cast("long") * 5_000).alias("sec"),
        F.col("id").alias("event_id"),
    )
    cold = spark.range(50).select(
        (F.col("id") % 5 + 100).alias("user_id"),
        (F.col("id") * 4000).alias("sec"),
        (F.col("id") + 1_000_000).alias("event_id"),
    )
    return hot.unionByName(cold).cache()


def test_chunked_matches_plain_on_hot_key(spark, hot_key_events):
    plain = sessionize(hot_key_events, "user_id", "sec", gap=1800, order_col="event_id")
    chunked = sessionize(
        hot_key_events, "user_id", "sec", gap=1800, order_col="event_id",
        chunk_span=50_000,
    )
    got = _canon(chunked)
    assert got == _canon(plain)
    # the silences every 10^4 events split the hot key into 10 sessions
    assert sum(1 for r in got if r[0] == 7) == 10


def _reference_sessions(rows, gap):
    """Driver-side oracle: sessions per key over (key, sec, eid) tuples."""
    out = []
    by_key = {}
    for k, sec, eid in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(k, []).append(sec)
    for k, secs in by_key.items():
        sess, start = 0, secs[0]
        n, last = 0, None
        for sec in secs:
            if last is not None and sec - last > gap:
                out.append((k, sess, n, start, last))
                sess, start, n = sess + 1, sec, 0
            n += 1
            last = sec
        out.append((k, sess, n, start, last))
    return sorted(out)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=2000),   # sec
        ),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    st.sampled_from([70, 100, 250, 997]),               # spans below/at/above gap
)
def test_property_parity_vs_reference(spark, pairs, span):
    """Plain == chunked == driver-side reference on random event sets, for
    chunk spans below, at, and above the gap (output must be span-invariant)."""
    rows = [(k, s, i) for i, (k, s) in enumerate(pairs)]
    ev = spark.createDataFrame(rows, "user_id long, sec long, event_id long")
    want = _reference_sessions(rows, gap=100)
    plain = sessionize(ev, "user_id", "sec", gap=100, order_col="event_id")
    chunked = sessionize(
        ev, "user_id", "sec", gap=100, order_col="event_id", chunk_span=span
    )
    assert _canon(plain) == want
    assert _canon(chunked) == want


def test_guard_bounds_window_group_size(spark, hot_key_events):
    """The plain form sorts the hot key's 10^5 rows in one window group; the
    guard caps every (key, chunk) group at chunk_span/cadence rows."""
    span = 50_000
    per_group = (
        hot_key_events.groupBy(
            "user_id", F.floor(F.col("sec") / span).cast("long").alias("chunk")
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_group <= span / 10 + 1  # bounded by the chunk, not the key
    plain_group = (
        hot_key_events.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert plain_group == 100_000
