"""Watermarked stream-stream join (streaming/joins.py): streaming results
match the batch twin, and late-beyond-watermark rows are dropped."""

import os

from lmdiskann_jl_spark.streaming.joins import attribute_purchases_to_clicks


def test_stream_join_matches_batch_twin(spark, tmp_path, stream_schema, finish_stream, write_events):
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    os.makedirs(cdir)
    os.makedirs(pdir)
    # (user, hour, minute, event_id)
    write_events([(1, 9, 0, 100), (1, 9, 40, 101), (2, 9, 10, 102), (1, 11, 0, 103)], cdir)
    write_events([(1, 9, 50, 200), (2, 8, 0, 201), (1, 11, 0, 202)], pdir)

    batch = attribute_purchases_to_clicks(
        spark.read.schema(stream_schema).parquet(cdir), spark.read.schema(stream_schema).parquet(pdir)
    )
    want = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}
    # purchase 200 at 9:50 <- clicks 100 (9:00) + 101 (9:40); purchase 201 at
    # 8:00 predates every click; purchase 202 at 11:00 <- click 103 (same instant)
    assert want == {(200, 100), (200, 101), (202, 103)}

    out = attribute_purchases_to_clicks(
        spark.readStream.schema(stream_schema).parquet(cdir),
        spark.readStream.schema(stream_schema).parquet(pdir),
    )
    rows = []
    q = (
        out.writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    finish_stream(q)
    assert {(r["purchase_id"], r["click_id"]) for r in rows} == want


def test_stream_join_state_is_watermark_bounded(spark, tmp_path, stream_schema, finish_stream, write_events):
    """A click arriving after the watermark has passed its whole match range
    is dropped from join state — the property that bounds state at scale."""
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    os.makedirs(cdir)
    os.makedirs(pdir)
    write_events([(1, 9, 0, 100)], cdir)
    write_events([(1, 9, 30, 200)], pdir)

    out = attribute_purchases_to_clicks(
        spark.readStream.schema(stream_schema).parquet(cdir),
        spark.readStream.schema(stream_schema).parquet(pdir),
        lag="30 minutes",
        watermark="1 hour",
    )
    rows = []
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            out.writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        finish_stream(q)

    drain()
    assert {(r["purchase_id"], r["click_id"]) for r in rows} == {(200, 100)}

    # advance the watermark far past hour 9, then replay a click that would
    # have matched purchase 200: its match range is watermark-expired
    write_events([(9, 20, 0, 900)], cdir)
    write_events([(9, 20, 0, 901)], pdir)
    drain()
    write_events([(1, 9, 29, 101)], cdir)  # in-range for purchase 200, but late
    drain()
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    assert (901, 900) in got
    assert (200, 101) not in got  # late click was not admitted to join state
