"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming runtime (SURVEY.md §2.6); this is the
engine-level extension showing how a custom per-key stateful operator is
built on Structured Streaming: per-user running aggregates (event count,
cumulative value, last-seen timestamp) maintained in GroupState across
micro-batches, with processing-time timeout to expire idle users.

At scale: state lives in the state store (RocksDB provider on a real
cluster), partitioned by the grouping key; each micro-batch shuffles only
that batch's rows to their key partitions.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE, last_ts BIGINT"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def _make_update_user(idle_timeout_ms: int | None):
    def _update_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].max()))
        state.update((n, float(total), last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": last}]
        )

    return _update_user


def running_user_stats(
    events_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) over a stream of events
    with columns (user_id BIGINT, value DOUBLE, ts BIGINT).

    Emits the refreshed state row for every user touched by each micro-batch.

    ``idle_timeout_ms``: optionally expire users idle longer than this
    (state eviction for unbounded key domains — the thing that keeps state
    size O(active users) instead of O(all users ever) on a real cluster).
    Off by default: a ProcessingTimeTimeout schedules follow-up micro-batches
    to service expirations, so a Trigger.AvailableNow drain never goes idle —
    the query keeps running (and burning executors) after the data is done.
    Turn it on for genuinely continuous queries; leave it off for bounded
    catch-up/backfill drains.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_update_user(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
