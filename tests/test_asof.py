"""As-of join semantics (operators/asof.py)."""

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.asof import asof_join


def test_asof_join_backward_semantics(spark):
    """At-or-before matching: equal timestamps match, earlier left rows get
    null, the latest (not any) prior right row wins, keys don't leak."""
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 10, "d"), (3, 10, "e")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100), (1, 10, 200), (1, 15, 300), (2, 99, 400)],
        "k long, t long, payload long",
    )
    res = {
        r["name"]: r["payload"]
        for r in asof_join(
            left, right, key_col="k", left_time="t", right_time="t",
            payload_cols=["payload"],
        ).collect()
    }
    assert res["a"] is None  # before any right row
    assert res["b"] == 200  # equal timestamp matches (at-or-before)
    assert res["c"] == 300  # latest prior wins, not first
    assert res["d"] is None  # right row is in the future
    assert res["e"] is None  # key with no right rows at all


def test_asof_join_single_shuffle_plan(spark):
    """The plan must be union -> ONE exchange on the key -> window — never a
    range/nested-loop join."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.col("id").alias("v")
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.col("id").alias("p")
    )
    res = asof_join(left, right, "k", "t", "t", ["p"])
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_chunked_matches_unchunked(spark):
    """chunk_span output == single-window output on mixed semantics cases
    (cross-chunk carry, empty chunks between matches, chunk-boundary
    timestamps, keys with no right rows)."""
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (1, 1000, "far"),
         (2, 10, "d"), (3, 10, "e"), (1, 30, "bound")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100), (1, 10, 200), (1, 15, 300), (1, 30, 350), (2, 99, 400)],
        "k long, t long, payload long",
    )
    base = asof_join(left, right, "k", "t", "t", ["payload"])
    chunked = asof_join(left, right, "k", "t", "t", ["payload"], chunk_span=10)
    key = lambda r: (r["k"], r["t"], r["name"])
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, chunked.collect()))
    got = {r["name"]: r["payload"] for r in chunked.collect()}
    # 'far' at t=1000 crosses ~97 empty chunks back to the t=30 right row
    assert got["far"] == 350
    assert got["bound"] == 350  # right row exactly at a chunk boundary


def test_asof_join_hot_key_bounded_tasks(spark):
    """One key holding ~all rows (the 100-TB window failure): chunked mode
    must (a) produce the same rows as the unchunked join and (b) bound the
    biggest window partition to a chunk, not the whole key."""
    n = 100_000
    left = spark.range(n).select(
        F.lit(7).alias("k"), F.col("id").alias("t"), F.col("id").alias("event_id")
    )
    right = spark.range(n // 100).select(
        F.lit(7).alias("k"), (F.col("id") * 100).alias("t"), (F.col("id") * 10).alias("p")
    )
    span = 1000
    chunked = asof_join(left, right, "k", "t", "t", ["p"], chunk_span=span)
    # every event joins the latest prior update: p = (t // 100) * 10
    bad = chunked.filter(F.col("p") != (F.col("t") - F.col("t") % 100) / 100 * 10)
    assert bad.count() == 0
    assert chunked.count() == n
    # per-task bound: no (key, chunk) window partition exceeds one chunk's
    # rows (left span rows + right span/100 rows + 1 boundary)
    sizes = (
        left.select("k", (F.col("t") / span).cast("long").alias("c"))
        .groupBy("k", "c").count().agg(F.max("count")).collect()[0][0]
    )
    assert sizes <= span  # 100 chunks of ~1000 rows, never the 100k key


def test_asof_join_forward_semantics(spark):
    """At-or-after matching: equal timestamps match, the EARLIEST future
    right row wins, left rows after the last right row get null."""
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 16, "c"), (1, 99, "d"), (2, 10, "e")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100), (1, 10, 200), (1, 15, 300), (2, 5, 400)],
        "k long, t long, payload long",
    )
    res = {
        r["name"]: r["payload"]
        for r in asof_join(
            left, right, key_col="k", left_time="t", right_time="t",
            payload_cols=["payload"], direction="forward",
        ).collect()
    }
    assert res["a"] == 100  # earliest future, not any future
    assert res["b"] == 200  # equal timestamp matches (at-or-after)
    assert res["c"] is None  # no right row at-or-after 16 for key 1
    assert res["d"] is None  # after the last right row
    assert res["e"] is None  # right row is in the past


def test_asof_join_forward_chunked_matches_unchunked(spark):
    import random

    rng = random.Random(3)
    left = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), i) for i in range(300)],
        "k long, t long, rowid long",
    )
    right = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), 1000 + i) for i in range(150)],
        "k long, t long, payload long",
    )
    kw = dict(key_col="k", left_time="t", right_time="t", payload_cols=["payload"],
              direction="forward")
    plain = {(r["rowid"], r["payload"]) for r in asof_join(left, right, **kw).collect()}
    chunked = {
        (r["rowid"], r["payload"])
        for r in asof_join(left, right, chunk_span=100, **kw).collect()
    }
    assert plain == chunked


def test_forward_rejects_mixed_numeric_timestamp_time(spark):
    """Mixed numeric-left/timestamp-right forward calls would silently mix
    native units with micros (span unscaled, right side negated in micros) —
    must raise instead (ADVICE r6)."""
    import pytest
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame([(1, 100)], "k long, t long").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    )
    with pytest.raises(ValueError, match="same kind"):
        asof_join(left, right, "k", "t", "ts", payload_cols=["t"], direction="forward")
