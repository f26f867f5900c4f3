"""Streaming sessionization (streaming/sessions.py): the streamed session
set matches the batch twin AND the batch sessionize operator, and closed
sessions emit exactly once while an open session stays unemitted until the
watermark passes."""

import os

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.sessionize import sessionize
from lmdiskann_jl_spark.streaming.sessions import streaming_sessions

GAP_SEC = 1800


def _canon(rows):
    return sorted((r["user_id"], r["session_start"], r["n_events"]) for r in rows)


def test_streamed_sessions_match_batch_twins(spark, tmp_path, stream_schema, finish_stream, write_events):
    src = str(tmp_path / "events")
    os.makedirs(src)
    # user 1: two sessions (9:00-9:20, then 11:00); user 2: one session.
    # No inter-event diff sits exactly on the gap boundary (see module doc).
    write_events(
        [(1, 9, 0, 1), (1, 9, 20, 2), (1, 11, 0, 3), (2, 9, 5, 4), (2, 9, 15, 5)],
        src,
    )
    # a late sentinel far in the future closes every session above
    write_events([(9, 23, 0, 99)], src)

    batch_df = spark.read.schema(stream_schema).parquet(src)
    want = _canon(
        streaming_sessions(batch_df, gap=f"{GAP_SEC} seconds").collect()
    )
    # cross-check against the batch sessionize operator (gap-1: session_window
    # merges strictly-inside-gap, the operator merges at-or-inside)
    op = sessionize(
        batch_df.select(
            "user_id", F.unix_timestamp("ts").alias("sec"), "event_id"
        ),
        "user_id",
        "sec",
        gap=GAP_SEC - 1,
        order_col="event_id",
    ).collect()
    assert sorted((r["user_id"], r["n_events"]) for r in op) == sorted(
        (u, n) for u, _s, n in want
    )

    rows = []
    q = (
        streaming_sessions(
            spark.readStream.schema(stream_schema).parquet(src), gap=f"{GAP_SEC} seconds"
        )
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    finish_stream(q)
    # every session except the sentinel's own open one has emitted
    emitted = [r for r in rows if r["user_id"] != 9]
    assert _canon(emitted) == [w for w in want if w[0] != 9]


def test_open_session_holds_until_watermark(spark, tmp_path, stream_schema, finish_stream, write_events):
    """A session whose close isn't final yet does NOT emit; it emits exactly
    once after the watermark passes — the exactly-once append contract that
    bounds state to open sessions."""
    src = str(tmp_path / "events")
    os.makedirs(src)
    rows = []
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            streaming_sessions(
                spark.readStream.schema(stream_schema).parquet(src),
                gap=f"{GAP_SEC} seconds",
                watermark="1 hour",
            )
            .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        finish_stream(q)

    write_events([(1, 9, 0, 1), (1, 9, 10, 2)], src)
    drain()
    assert rows == []  # watermark hasn't passed 9:10 + gap yet — still open
    write_events([(9, 20, 0, 99)], src)  # advances the watermark
    drain()
    got = [(r["user_id"], r["n_events"]) for r in rows]
    assert got == [(1, 2)]  # the closed session emitted exactly once
