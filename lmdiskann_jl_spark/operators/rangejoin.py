"""Bucketed range (interval) join — points matched to containing intervals.

Beyond the reference (SURVEY.md §2.6 — no relational layer): join a table of
timestamped points (events) to a table of [lo, hi) intervals (campaign
windows, maintenance windows, validity ranges) on containment, optionally
plus equality keys.  Spark has no native range-join optimization: the naive
``ON p.ts BETWEEN i.lo AND i.hi`` theta join compiles to a broadcast
nested-loop (or worse, a cartesian) — O(points x intervals) comparisons,
a scale-killer the moment neither side broadcasts.

The scalable shape is time bucketing: points hash into ONE bucket
(``floor(ts / width)``), intervals explode to every bucket they overlap,
and the match becomes an equi-join on the bucket id (+ the user's equality
keys) followed by the exact containment filter.  Each qualifying pair meets
in exactly one bucket — the point's — so no dedup pass is needed.  Cost:
one shuffle of each side on (keys..., bucket), with the interval side
inflated by ~``ceil(span / width)`` rows per interval.

Picking ``bucket_width``: ~the median interval span.  Too small inflates
the interval side (many buckets per interval); too large packs many points
and many intervals into the same bucket (the per-bucket join degenerates
toward all-pairs).  Either way output is identical — width is purely a
physical knob, which is what makes the operator safe to auto-tune later.

At 100 TB: both shuffles are plain hash exchanges AQE can re-plan; a hot
bucket (a burst hour) is an AQE skew-join case, and adding equality keys
(tenant, user) subdivides buckets the same way it does for any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "_rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
    closed: str = "left",
) -> DataFrame:
    """Inner-join points to every interval containing them.

    ``points``/``intervals`` must not share column names other than ``keys``
    (the result carries all columns of both).  ``closed``: "left" matches
    ``lo <= ts < hi`` (the half-open convention), "both" ``lo <= ts <= hi``.
    Numeric or epoch-seconds time columns; ``bucket_width`` in the same unit.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    keys = list(keys or [])

    p = points.withColumn(_B, F.floor(F.col(point_ts) / F.lit(bucket_width)))
    # degenerate intervals (hi < lo) can never contain a point, but left
    # unfiltered they'd make sequence() emit a DESCENDING bucket range —
    # wasted explode rows at best; drop them before the explode
    intervals = intervals.filter(F.col(hi_col) >= F.col(lo_col))
    # hi's bucket is included even for closed='left' (a point at hi itself is
    # pruned by the exact filter); sequence() is inclusive on both ends
    iv = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor(F.col(hi_col) / F.lit(bucket_width)),
            )
        ),
    )
    cond = F.col(point_ts) >= F.col(lo_col)
    if closed == "left":
        cond = cond & (F.col(point_ts) < F.col(hi_col))
    else:
        cond = cond & (F.col(point_ts) <= F.col(hi_col))
    return p.join(iv, on=keys + [_B], how="inner").filter(cond).drop(_B)
