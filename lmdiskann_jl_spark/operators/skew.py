"""Skew mitigation for shuffle joins — the hot-key lever at 100 TB.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits oversized
SORT-MERGE partitions automatically and is the first line of defense (on by
default in session.get_spark).  This module covers the case AQE cannot:
a broadcast-ineligible join where one side's key distribution is so hot
(one user with 10^8 events) that even a split partition re-skews — the
classic fix is salting: spread each hot left key over ``n_salt`` synthetic
sub-keys and replicate ONLY the matching right rows ``n_salt`` times, so
the hot key's rows land on ``n_salt`` different reducers.

Replication is targeted: non-hot keys join untouched (salt 0, no copies),
so the overhead is n_salt copies of the hot keys' right rows only — not a
blanket n_salt x blowup of the whole right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    hot_keys: DataFrame | None = None,
    n_salt: int = 8,
    hot_threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot left keys spread over ``n_salt`` reducers.

    ``hot_keys``: single-column DataFrame of keys to salt; if None,
    ``hot_threshold`` triggers a count-based detection pass (one extra agg
    job — at scale, pass precomputed hot keys from table stats instead).
    Produces the same rows as ``left.join(right, key_col, how)``.
    """
    if how not in ("inner", "left", "left_semi"):
        # right/outer joins would surface each unmatched replicated right
        # row n_salt times — salt the other side instead
        raise ValueError(f"salted_join supports inner/left/left_semi, not {how}")
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_keys or hot_threshold")
        hot_keys = (
            left.groupBy(key_col).count().filter(F.col("count") > hot_threshold).select(key_col)
        )
    hot = F.broadcast(hot_keys.select(F.col(key_col)).distinct())

    # left: hot rows get a random-but-deterministic salt in [0, n_salt),
    # derived from all columns so replays agree; cold rows salt 0
    is_hot_l = F.col("_hot").isNotNull()
    salted_left = (
        left.join(hot.withColumn("_hot", F.lit(1)), key_col, "left")
        .withColumn(
            "_salt",
            F.when(
                is_hot_l,
                F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    # right: hot keys' rows are replicated once per salt value; cold rows once
    salted_right = (
        right.join(hot.withColumn("_hot", F.lit(1)), key_col, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salt - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot")
    )
    return salted_left.join(salted_right, [key_col, "_salt"], how).drop("_salt")
