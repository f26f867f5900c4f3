"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real definitions live in ``lmdiskann_jl_spark.plans.queries`` — one entry
per operator from SURVEY.md §2 plus the training-data-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lmdiskann_jl_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact top-10 cosine
    neighbors of a probe vector over the embeddings table, with keys attached
    — the reference's `search()` contract end-to-end."""
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.001"
    result = Q.q_exact_topk_cosine(spark, sf_dir)
    keys = Q._key_map(spark, sf_dir)
    return (
        result.join(F.broadcast(keys), result.vec_id == keys.id, "left")
        .select("key", "vec_id", "dist")
        .orderBy("dist", "vec_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
