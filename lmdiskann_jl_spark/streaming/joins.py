"""Watermarked stream-stream join — bounded-state event attribution.

Beyond the reference (SURVEY.md §2.6 — no streaming runtime): join two live
event streams (clicks and purchases) on key + event-time proximity.  The
batch form is a plain range-bounded equi-join; the streaming form is where
Spark's state semantics earn their keep: an UNBOUNDED stream-stream join
would buffer both streams forever, so both sides carry watermarks and the
join condition carries an explicit event-time range — together they let the
engine evict buffered rows the moment the watermark passes the last instant
a match could still arrive.

State size at 100 TB/day: O(rows inside the lag window per key partition),
not O(stream history) — the watermark is the knob that trades late-data
tolerance for state footprint, exactly as in the windowed rollup
(ingest.streaming_hourly_rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase matched to the same user's clicks within the preceding
    ``lag`` (inclusive on both ends — a click AT the purchase instant
    counts).  Both inputs need (user_id, ts TIMESTAMP, event_id); works on
    streaming and batch DataFrames alike (watermarks are a no-op in batch,
    which is what makes the batch twin an oracle for the streaming form).
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lag}"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )
