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
