"""As-of (backward) join — the time-series operator Spark has no native form of.

Beyond the reference (SURVEY.md §2.6 — no relational layer): for each left
row, attach the most recent right row of the same key with right_time <=
left_time (event attribution, point-in-time feature lookup, trade/quote
matching).

The scalable shape is NOT a range join (per-row inequality joins explode to
O(n*m) comparisons): both sides are unioned into one stream tagged by side,
shuffled ONCE on the key, and a per-key time-ordered window carries the
latest right payload forward (``last(..., ignorenulls=True)``) onto each
left row.  Cost = one exchange + one sort, identical to a groupBy — at
100 TB the only hazard is a hot key (one user with millions of events),
which salts the same way any window does (split the key's timeline into
chunks, carry the boundary row over).

At equal timestamps the right row sorts FIRST (side 0 < 1), so a right row
AT the left row's time matches — the `>=` (at-or-before) convention, same
as DuckDB's ``ASOF JOIN`` (which the oracle uses, plans/queries.py
``r_asof_attribution``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: left rows + the latest right payload at-or-before.

    Returns every left row with ``payload_cols`` from the matched right row
    (null when the key has no right row yet).  Payload column names must not
    collide with left column names.
    """
    rstruct = F.struct(*[F.col(c) for c in payload_cols])
    rtype = right.select(rstruct.alias("_s")).schema["_s"].dataType.simpleString()
    left_cols = [c for c in left.columns]

    tagged_right = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        rstruct.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    tagged_left = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype).alias("_rp"),
        *left_cols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_right.unionByName(tagged_left).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_match")[c].alias(c) for c in payload_cols],
    )
