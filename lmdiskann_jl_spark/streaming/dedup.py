"""Streaming exact deduplication with watermark-bounded state.

Beyond the reference (SURVEY.md §2.6 — no streaming runtime): the streaming
twin of ``operators/dedup.exact_dedup``.  An at-least-once source (Kafka
replays, retried micro-batches, duplicated ingest files) re-delivers rows;
the unbounded fix (``dropDuplicates`` on a stream) keeps every key ever seen
in state forever — a guaranteed OOM at 100 TB/day.
``dropDuplicatesWithinWatermark`` keeps state only for keys whose event time
is within the watermark delay: a duplicate arriving inside the window is
dropped, and a key's state is evicted the moment the watermark passes it.

The knob is the usual streaming tradeoff — watermark delay bounds BOTH the
re-delivery horizon the dedup can absorb AND the state footprint
(O(distinct keys per watermark window), not O(stream history)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins dedup on ``key_cols`` with state bounded by
    ``watermark`` (event-time delay on ``ts_col``).

    Streaming input: emits the first row per key; duplicates landing while
    the key is still in state (within the watermark horizon) are dropped;
    once the watermark passes a key's event time its state is evicted, so a
    re-occurrence beyond the horizon is treated as a new row — the
    documented effectively-once contract, not a global-history guarantee.

    Batch input: deterministic min-by — per key, the row with the smallest
    ``(ts, remaining ORDERABLE columns)``.  The streaming path keeps the
    first row by ARRIVAL, and a source that replays in event-time order
    delivers the min-ts row first, so the batch twin is a full-row oracle
    (not just a key-set oracle) for streams whose duplicates land inside
    the watermark horizon in event-time order; ts ties break on the
    remaining orderable columns so the pick never depends on task
    scheduling.  Non-orderable columns (maps, or structs/arrays containing
    them) are excluded from the tiebreak — they still ride along in the
    kept row, but two duplicates identical on every orderable column and
    differing only in a map value tie arbitrarily.  One groupBy shuffle
    with map-side partial min_by — no global window, scale-safe.
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    others = [
        f.name
        for f in events.schema.fields
        if f.name not in keys and f.name != ts_col and _orderable(f.dataType)
    ]
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in others])
    return (
        events.groupBy(*keys)
        .agg(F.min_by(F.struct(*events.columns), ordk).alias("_r"))
        .select("_r.*")
    )
