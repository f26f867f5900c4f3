"""Salted skew join (operators/skew.py): result parity + salt spreading."""

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.skew import salted_join


def _fixture(spark):
    # key 7 is hot on the left (900 of 1000 rows); right has 3 rows per key
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id") % 10).cast("long").alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(30).select(
        (F.col("id") % 10).cast("long").alias("k"), F.col("id").alias("rval")
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _fixture(spark)
    plain = {(r["k"], r["lval"], r["rval"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["lval"], r["rval"])
        for r in salted_join(left, right, "k", hot_threshold=100, n_salt=8).collect()
    }
    assert salted == plain and len(plain) == 1000 * 3


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must occupy every salt bucket (that's the whole
    point — n_salt reducers instead of one)."""
    left, right = _fixture(spark)
    hot = spark.createDataFrame([(7,)], "k long")
    salts = (
        left.join(F.broadcast(hot.withColumn("_h", F.lit(1))), "k", "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_h").isNotNull(),
                F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(8)),
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8
