"""As-of (backward) join — the time-series operator Spark has no native form of.

Beyond the reference (SURVEY.md §2.6 — no relational layer): for each left
row, attach the most recent right row of the same key with right_time <=
left_time (event attribution, point-in-time feature lookup, trade/quote
matching).

The scalable shape is NOT a range join (per-row inequality joins explode to
O(n*m) comparisons): both sides are unioned into one stream tagged by side,
shuffled ONCE on the key, and a per-key time-ordered window carries the
latest right payload forward (``last(..., ignorenulls=True)``) onto each
left row.  Cost = one exchange + one sort, identical to a groupBy.

At equal timestamps the right row sorts FIRST (side 0 < 1), so a right row
AT the left row's time matches — the `>=` (at-or-before) convention, same
as DuckDB's ``ASOF JOIN`` (which the oracle uses, plans/queries.py
``r_asof_attribution``).

**Hot-key guard** (``chunk_span``): at 100 TB the realistic failure of the
window shape is ONE hot key (a user with 10^8 events) serializing into one
task.  ``chunk_span`` splits each key's TIMELINE into fixed ranges
(``chunk = floor(time / chunk_span)``) so the big window partitions by
(key, chunk) — per-task input is bounded by a chunk's row count, not the
key's.  Cross-chunk correctness comes from a carry pass: per (key, chunk)
the final right payload is reduced (one row per chunk), a tiny per-key
window computes each chunk's carry-in (the latest right payload from any
EARLIER chunk), and the carry-in is injected as a synthetic boundary row
sorting before everything in its chunk.  Both extra stages shuffle the
same (key-derived) keys and the carry window runs over one row per
non-empty chunk — negligible next to the main exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# sorts before any real row in its chunk: right rows are side 0, left side 1
_BOUNDARY_SIDE = -1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    chunk_span: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the nearest right payload in ``direction``.

    direction='backward' (default): the LATEST right row at-or-before each
    left row — the reference semantics of every backward section below.
    direction='forward': the EARLIEST right row at-or-after — implemented
    by running the identical machinery on negated time (timestamps negate
    via unix_micros, exact to the microsecond), so both directions share
    one code path, one shuffle shape, and the same hot-key guard.  A
    'nearest' join composes from the two directions caller-side (include
    the right time in ``payload_cols`` and pick the smaller gap).

    Returns every left row with ``payload_cols`` from the matched right row
    (null when the key has no right row yet).  Payload column names must not
    collide with left column names.

    ``chunk_span``: optional hot-key guard — partition the carry window by
    (key, floor(time / chunk_span)) instead of (key) so no task ever sorts
    more than one timeline chunk of one key.  Output is identical (ties
    between right rows at the exact same timestamp are resolved by a payload
    hash in chunked mode; byte-identical to unchunked when per-(key, time)
    right rows are unique — the well-defined as-of case).  Units: the time
    column's own units for numeric time columns; SECONDS when the time
    column is a timestamp (the forward path converts timestamps to unix
    micros internally and scales chunk_span to match, so a seconds-tuned
    span keeps its meaning instead of creating ~10^6x more chunks).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if direction == "forward":
        is_ts = dict(left.dtypes)[left_time].startswith("timestamp")
        right_is_ts = dict(right.dtypes)[right_time].startswith("timestamp")
        if is_ts != right_is_ts:
            # _neg converts each side by its OWN dtype (timestamps to unix
            # micros, numerics as-is) and chunk_span scales off the LEFT
            # dtype — a mixed call would silently compare micros against
            # native units, producing wrong _t ordering and wrong chunking
            raise ValueError(
                f"asof_join forward: left time {left_time!r} is "
                f"{'timestamp' if is_ts else 'numeric'} but right time "
                f"{right_time!r} is {'timestamp' if right_is_ts else 'numeric'}; "
                "cast both sides to the same kind before joining"
            )

        def _neg(df: DataFrame, tcol: str) -> DataFrame:
            dt = dict(df.dtypes)[tcol]
            col = F.col(tcol)
            # unix_micros requires TIMESTAMP; _ntz casts losslessly (the
            # session timezone is pinned UTC in session.get_spark)
            e = -F.unix_micros(col.cast("timestamp")) if dt.startswith("timestamp") else -col
            return df.withColumn("_asof_negt", e)

        out = asof_join(
            _neg(left, left_time), _neg(right, right_time),
            key_col, "_asof_negt", "_asof_negt", payload_cols,
            # internal time is micros for timestamp columns — keep the
            # caller's seconds-denominated span meaningful
            chunk_span=(chunk_span * 1_000_000 if chunk_span and is_ts else chunk_span),
            direction="backward",
        )
        return out.drop("_asof_negt")

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
    unioned = tagged_right.unionByName(tagged_left)

    if chunk_span is None:
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
        return carried.filter(F.col("_side") == 1).select(
            *left_cols,
            *[F.col("_match")[c].alias(c) for c in payload_cols],
        )

    # ---------------- hot-key guard: timeline-chunked window ----------------
    chunked = unioned.withColumn("_c", F.floor(F.col("_t") / F.lit(chunk_span)))

    # per (key, chunk): the FINAL right payload of the chunk, reduced map-side
    # (max of an orderable struct — deterministic; _h breaks equal-time ties
    # the same way the main window's sort does)
    with_h = chunked.withColumn("_h", F.xxhash64(F.col("_rp")))
    chunk_final = (
        with_h.filter(F.col("_side") == 0)
        .groupBy("_k", "_c")
        .agg(F.max(F.struct("_t", "_h", "_rp")).alias("_fin"))
        .select("_k", "_c", F.col("_fin._rp").alias("_cf"))
    )
    # every chunk that holds ANY row needs a carry-in (a chunk of only left
    # rows still matches right rows from earlier chunks)
    all_chunks = chunked.select("_k", "_c").distinct()
    wc = (
        Window.partitionBy("_k")
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        all_chunks.join(chunk_final, ["_k", "_c"], "left")
        .withColumn("_carry", F.last("_cf", ignorenulls=True).over(wc))
        .filter(F.col("_carry").isNotNull())
    )
    boundary = carry_in.select(
        "_k",
        (F.col("_c") * chunk_span).cast(unioned.schema["_t"].dataType).alias("_t"),
        F.lit(_BOUNDARY_SIDE).alias("_side"),
        F.col("_carry").alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        "_c",
        F.xxhash64(F.col("_carry")).alias("_h"),
    )

    w = (
        Window.partitionBy("_k", "_c")
        .orderBy("_t", "_side", "_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = with_h.unionByName(boundary).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_match")[c].alias(c) for c in payload_cols],
    )
