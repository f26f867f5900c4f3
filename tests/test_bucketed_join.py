"""Bucketed-layout co-located join (sources/readers.write_table bucket_by):
two tables bucketed on the same key join WITHOUT a shuffle — the layout
that turns the recurring vector-id joins (embedding fetch, keymap attach,
adjacency lookups) into exchange-free stages at 100 TB."""

from pyspark.sql import functions as F


def test_bucketed_join_plans_without_shuffle(spark, tmp_path, embeddings):
    from lmdiskann_jl_spark.sources.readers import write_table

    left = embeddings.select(F.col("vec_id").alias("id"), "label")
    right = embeddings.select(F.col("vec_id").alias("id"), "embedding")
    write_table(left, str(tmp_path / "l"), bucket_by=(8, "id"), table_name="bj_left")
    write_table(right, str(tmp_path / "r"), bucket_by=(8, "id"), table_name="bj_right")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table("bj_left").join(spark.table("bj_right"), "id")
        assert j.count() == embeddings.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point of the layout: NO exchange on either side
        assert "Exchange hashpartitioning" not in plan

        # contrast: the same join off plain (non-bucketed) files shuffles both sides
        plain = left.join(right.withColumnRenamed("embedding", "e2"), "id")
        plain.count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")
