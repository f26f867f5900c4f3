"""Gap-based sessionization with a hot-key guard.

Beyond the reference (SURVEY.md §2.6 — no relational layer): group each
key's events into sessions separated by silence longer than ``gap``.  The
textbook Spark form is a per-key window (lag + conditional cumsum) — one
exchange, one sort — but its 100-TB failure mode is ONE hot key (a bot with
10^8 events) serializing into a single task, the same failure
``operators/asof.chunk_span`` guards against.

**Guarded form** (``chunk_span``): two-level sessionize.
1. Events window by (key, chunk = floor(time / chunk_span)) — per-task
   input is bounded by a chunk's rows, not the key's.
2. Each (key, chunk, local_session) reduces to ONE summary row
   (n_events, start, end).
3. A per-key window over the summaries re-applies the same gap predicate
   to consecutive summaries (start - previous end > gap) and a cumsum
   assigns global session numbers; a final groupBy merges summaries that
   belong to the same global session.

Step 3's window is O(sessions of the hottest key), not O(events): the
chunked pass already collapsed gap-free runs — a bot hammering every
second yields ONE summary per chunk.  The predicate is re-evaluated across
every consecutive summary pair (not just adjacent chunks), so the output
is identical to the plain form for ANY chunk_span > 0; chunk_span only
tunes the summary count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    order_col: str | None = None,
    chunk_span: int | None = None,
) -> DataFrame:
    """Sessions per key: rows (key_col, session_no, n_events, start, end).

    ``session_no`` numbers a key's sessions 0.. in time order.  ``gap`` and
    ``ts_col`` share a unit (typically epoch seconds); a new session starts
    when an event arrives MORE than ``gap`` after its predecessor.
    ``order_col`` breaks equal-timestamp ties deterministically.
    ``chunk_span`` enables the hot-key guard (see module docstring); output
    is identical with or without it.
    """
    order = [F.col(ts_col).asc()]
    if order_col is not None:
        order.append(F.col(order_col).asc())

    if chunk_span is None:
        w = Window.partitionBy(key_col).orderBy(*order)
        marked = events.withColumn(
            "_new",
            F.when(F.col(ts_col) - F.lag(ts_col, 1).over(w) > gap, 1).otherwise(0),
        ).withColumn(
            "session_no",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        return marked.groupBy(key_col, "session_no").agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start"),
            F.max(ts_col).alias("end"),
        )

    chunked = events.withColumn(
        "_chunk", F.floor(F.col(ts_col) / F.lit(chunk_span)).cast("long")
    )
    wl = Window.partitionBy(key_col, "_chunk").orderBy(*order)
    local = (
        chunked.withColumn(
            "_new",
            F.when(F.col(ts_col) - F.lag(ts_col, 1).over(wl) > gap, 1).otherwise(0),
        )
        .withColumn(
            "_ls", F.sum("_new").over(wl.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy(key_col, "_chunk", "_ls")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start"),
            F.max(ts_col).alias("end"),
        )
    )
    # one row per local session — the same gap predicate over consecutive
    # summaries stitches sessions across chunk boundaries
    wk = Window.partitionBy(key_col).orderBy(
        F.col("start").asc(), F.col("_chunk").asc(), F.col("_ls").asc()
    )
    merged = local.withColumn(
        "_new",
        F.when(F.col("start") - F.lag("end", 1).over(wk) > gap, 1).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("_new").over(wk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return merged.groupBy(key_col, "session_no").agg(
        F.sum("n_events").alias("n_events"),
        F.min("start").alias("start"),
        F.max("end").alias("end"),
    )
