"""Streaming sessionization — native session windows with watermark state.

Beyond the reference (SURVEY.md §2.6 — no streaming runtime): the streaming
twin of ``operators/sessionize``.  Spark's ``session_window`` grows a
per-key window while events keep arriving within ``gap`` of the previous
one and CLOSES it once the watermark passes last_event + gap — closed
sessions emit exactly once (append mode) and their state is evicted, so
state is O(open sessions), not O(events) or O(history).

Boundary semantics: ``session_window`` merges two events when the second
arrives STRICTLY inside the previous event's gap extension
(``next < prev + gap``), while the batch operator splits on ``diff > gap``
(i.e. merges ``diff <= gap``).  For integer-second data the two agree for
every diff except ``diff == gap`` exactly; the parity test pins this down
by comparing against the batch operator at ``gap - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessions per key from a stream: (key, session_start, session_end,
    n_events).  ``events`` needs ``key_col`` and a TIMESTAMP ``ts_col``.

    Streaming input: watermarked ``session_window`` aggregation — a session
    emits once its close is final (watermark past last event + gap).
    Batch input: the same expression without a watermark (Spark evaluates
    session_window in batch too), which is the parity oracle.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
