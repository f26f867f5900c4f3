"""Streaming exact dedup (streaming/dedup.py): in-watermark duplicates
collapse to the batch twin's answer, and state is watermark-evicted (a key
re-occurring beyond the horizon is re-emitted, documenting the bounded-state
contract)."""

import os

from pyspark.sql import functions as F

from lmdiskann_jl_spark.streaming.dedup import dedup_stream


def _drain_factory(spark, src, ck, rows, stream_schema, finish_stream):
    stream = dedup_stream(
        spark.readStream.schema(stream_schema).parquet(src),
        key_cols=("event_id",),
        watermark="1 hour",
    )

    def drain():
        q = (
            stream.writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        finish_stream(q)

    return drain


def test_stream_dedup_matches_batch_twin(spark, tmp_path, stream_schema, finish_stream, write_events):
    src = str(tmp_path / "events")
    os.makedirs(src)
    rows = []
    drain = _drain_factory(spark, src, str(tmp_path / "ck"), rows, stream_schema, finish_stream)
    # (user, hour, minute, event_id) — event 100 delivered three times within
    # the watermark horizon, 101 twice, 102 once.  The re-deliveries land in
    # a SECOND drained micro-batch: which of two same-key rows wins INSIDE
    # one micro-batch is shuffle-order nondeterministic, but a row arriving
    # after the key is already in state always loses.
    write_events([(1, 9, 0, 100), (2, 9, 10, 101)], src)
    drain()
    write_events([(1, 9, 20, 100), (2, 9, 25, 101), (3, 9, 30, 102)], src)
    drain()

    batch = dedup_stream(spark.read.schema(stream_schema).parquet(src), key_cols=("event_id",))
    assert sorted(r["event_id"] for r in batch.collect()) == [100, 101, 102]
    assert sorted(r["event_id"] for r in rows) == [100, 101, 102]
    # first arrival wins: the kept rows are batch 1's deliveries
    kept = {r["event_id"]: r["ts"].minute for r in rows}
    assert kept[100] == 0
    assert kept[101] == 10


def test_stream_dedup_state_is_watermark_evicted(spark, tmp_path, stream_schema, finish_stream, write_events):
    """A key re-occurring after the watermark passed its state is re-emitted:
    the bounded-state contract (dedup horizon == watermark), and the reason
    this plan survives 100 TB where a global dropDuplicates cannot."""
    src = str(tmp_path / "events")
    os.makedirs(src)
    rows = []
    drain = _drain_factory(spark, src, str(tmp_path / "ck"), rows, stream_schema, finish_stream)

    write_events([(1, 9, 0, 100)], src)
    drain()
    # advance the watermark far past 10:00 (9:00 + 1h horizon) ...
    write_events([(9, 20, 0, 900)], src)
    drain()
    # ... then re-deliver key 100: its state was evicted, so it re-emits
    write_events([(1, 20, 30, 100)], src)
    drain()
    assert [r["event_id"] for r in rows].count(100) == 2
    assert [r["event_id"] for r in rows].count(900) == 1


def test_neardup_stream_first_seen_wins_across_batches(spark, tmp_path, finish_stream):
    """neardup_stream: a doc is flagged iff it LSH-collides with ANY
    earlier-arrived doc — including one that was itself a duplicate (dups
    enter the band store too), and including collisions that cross the
    micro-batch boundary via the persistent state table."""
    import shutil
    import time

    from lmdiskann_jl_spark.streaming.dedup import neardup_stream

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),                                  # original
        (1, base + " extra"),                       # near-dup of 0 (same batch)
        (2, "completely different text about spark shuffle partitions and joins"),
        # batch 2: near-dup of 1 (a dup itself) and a fresh doc
        (3, base + " extra"),                       # exact text of 1 -> collides
        (4, "yet another unrelated document mentioning watermark state eviction"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time()
    for tag, pred, mtime in (
        ("aa", F.col("doc_id") <= 2, t0 - 3600),
        ("zz", F.col("doc_id") > 2, t0 + 3600),
    ):
        tmp = str(tmp_path / f"half_{tag}")
        docs.filter(pred).coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"{tag}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = neardup_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    finish_stream(q)

    got = {
        r["doc_id"]: r["is_dup"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the oracle rule: is_dup iff an LSH pair partner with smaller doc_id
    from lmdiskann_jl_spark.operators.dedup import minhash_lsh_pairs

    later = {r["doc_b"] for r in minhash_lsh_pairs(docs).collect()}
    want = {i: (i in later) for i, _ in rows}
    assert got == want
    # the semantics this test exists to pin: 1 is a dup of 0; 3 (later
    # batch) is a dup via a partner that was itself a duplicate
    assert got[0] is False and got[1] is True and got[3] is True
    assert got[2] is False and got[4] is False


def test_neardup_stream_replay_does_not_self_collide(spark, tmp_path, finish_stream):
    """Crash-replay safety: if a micro-batch appended its bands to state
    but died before the checkpoint committed, the availableNow replay (same
    epoch id) must not collide with its own first attempt's bands — the
    state join reads strictly earlier epochs only."""
    from lmdiskann_jl_spark.streaming.dedup import _minhash_bands, neardup_stream

    rows = [
        (0, "one unique document about catalyst plans and pushdown"),
        (1, "another unique document about broadcast joins and skew salting"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "state")
    # pre-seed the state catalog with EXACTLY what a crashed first attempt
    # of epoch 0 would have appended (segment + pointer both landed)
    from lmdiskann_jl_spark.sources.tables import TableCatalog, write_meta

    cat = TableCatalog(spark, state)
    meta = cat.write(
        "bands",
        _minhash_bands(docs, 16, 4, "doc_id", "text").withColumn("_epoch", F.lit(0)),
        {"versions": {}},
    )
    meta["max_epoch"] = 0  # what the crashed attempt would have recorded
    # the crashed attempt minted the lineage token BEFORE its state append,
    # so both the checkpoint marker and the store meta carry it already
    import json

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "_neardup_lineage.json").write_text(json.dumps({"token": "run-a"}))
    meta["lineage_token"] = "run-a"
    write_meta(state, meta)

    docs.coalesce(1).write.parquet(str(tmp_path / "in"))
    q = neardup_stream(
        spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in")),
        state, str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    finish_stream(q)
    got = {
        r["doc_id"]: r["is_dup"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # both docs are unique: self-collision with the epoch-0 seed would
    # have flagged them
    assert got == {0: False, 1: False}


def test_neardup_stream_state_autocompacts(spark, tmp_path, finish_stream):
    """The band store's segment list is bounded: a long stream of
    micro-batches must leave <= NEARDUP_STATE_SEGMENTS + 1 segments (the
    compaction collapses the list back to one), with decisions unchanged."""
    from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta
    from lmdiskann_jl_spark.streaming.dedup import (
        NEARDUP_STATE_SEGMENTS,
        neardup_stream,
    )

    n = NEARDUP_STATE_SEGMENTS + 3  # enough batches to cross the bound
    # token sets are fully disjoint across docs, so no LSH collisions
    rows = [
        (i, " ".join(f"tok{i}word{j}" for j in range(8))) for i in range(n)
    ]
    # one doc per file -> one doc per micro-batch
    src = tmp_path / "in"
    src.mkdir()
    import shutil
    import time

    t0 = time.time()
    for i, text in rows:
        tmp = str(tmp_path / f"half_{i}")
        spark.createDataFrame([(i, text)], "doc_id long, text string").coalesce(
            1
        ).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"f{i:03d}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    q = neardup_stream(
        stream, state, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    finish_stream(q, timeout=300)

    meta = read_meta(state)
    cat = TableCatalog(spark, state)
    segs = cat._segments("bands", meta)
    assert len(segs) <= NEARDUP_STATE_SEGMENTS + 1
    # compaction must not lose rows: every doc's bands are still in state
    assert cat.read("bands", meta).select("doc_id").distinct().count() == n
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == n and got.filter("is_dup").count() == 0
    # disk is bounded too: the compaction batch vacuums superseded segment
    # dirs, so on-disk version count tracks the live segment list
    on_disk = [
        d for d in os.listdir(os.path.join(state, "bands")) if d.startswith("v=")
    ]
    assert len(on_disk) <= len(segs) + 1  # +1: post-compaction appends


def test_neardup_stream_rejects_foreign_checkpoint_lineage(spark, tmp_path, finish_stream):
    """Pointing a FRESH checkpoint at old state restarts epochs at 0, and
    the strictly-earlier state filter would silently hide all existing
    bands — the store's max_epoch high-water mark makes that a loud error
    instead."""
    import pytest

    from lmdiskann_jl_spark.sources.tables import TableCatalog, write_meta
    from lmdiskann_jl_spark.streaming.dedup import _minhash_bands, neardup_stream

    docs = spark.createDataFrame(
        [(0, "a document that was ingested long ago by the original query")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    cat = TableCatalog(spark, state)
    meta = cat.write(
        "bands",
        _minhash_bands(docs, 16, 4, "doc_id", "text").withColumn("_epoch", F.lit(39)),
        {"versions": {}},
    )
    meta["max_epoch"] = 39  # the original lineage got to epoch 39
    write_meta(state, meta)

    docs.coalesce(1).write.parquet(str(tmp_path / "in"))
    q = neardup_stream(
        spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in")),
        state, str(tmp_path / "out"), str(tmp_path / "fresh_ckpt"),
    )
    with pytest.raises(Exception, match="lineage violation"):
        q.processAllAvailable()
    q.stop()


def test_neardup_stream_rejects_fresh_checkpoint_at_epoch_zero(
    spark, tmp_path, finish_stream
):
    """The epoch-0 hole: a fresh checkpoint's first batch arrives with
    epoch 0, and a store whose newest epoch is ALSO 0 passes the high-water
    mark check (0 == 0 looks like a genuine replay) — the strictly-earlier
    state filter would then silently hide every epoch-0 band.  The lineage
    TOKEN closes it: the store remembers which checkpoint lineage wrote it,
    and a fresh checkpoint (new random token) mismatches loudly."""
    import pytest

    from lmdiskann_jl_spark.sources.tables import TableCatalog, write_meta
    from lmdiskann_jl_spark.streaming.dedup import _minhash_bands, neardup_stream

    docs = spark.createDataFrame(
        [(0, "the one document the original lineage ingested at its epoch zero")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    cat = TableCatalog(spark, state)
    meta = cat.write(
        "bands",
        _minhash_bands(docs, 16, 4, "doc_id", "text").withColumn("_epoch", F.lit(0)),
        {"versions": {}},
    )
    meta["max_epoch"] = 0  # original lineage stopped after its first batch
    meta["lineage_token"] = "the-original-run"
    write_meta(state, meta)

    docs.coalesce(1).write.parquet(str(tmp_path / "in"))
    q = neardup_stream(
        spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in")),
        state, str(tmp_path / "out"), str(tmp_path / "fresh_ckpt"),
    )
    with pytest.raises(Exception, match="lineage violation"):
        q.processAllAvailable()
    q.stop()


def test_embedding_neardup_stream_first_seen_wins_across_batches(
    spark, tmp_path, finish_stream
):
    """embedding_neardup_stream: a vector is flagged iff it LSH-collides
    AND exact-verifies (cosine >= threshold) against any EARLIER vector —
    across micro-batches via the bucket+vector state store, within a batch
    via the smaller-id sibling rule; near-but-below-threshold vectors that
    share a bucket die in the verify."""
    import os
    import shutil
    import time

    from lmdiskann_jl_spark.streaming.dedup import embedding_neardup_stream

    e0 = [1.0, 0.0, 0.0, 0.0]
    e1 = [0.0, 1.0, 0.0, 0.0]
    rows_b1 = [(0, e0), (1, e1), (2, e0)]        # 2 dups 0 in-batch
    rows_b2 = [(3, e0), (4, [0.0, 0.0, 1.0, 0.0]), (5, e1)]  # 3,5 dup vs state
    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time()
    for i, rows in enumerate((rows_b1, rows_b2)):
        tmp = str(tmp_path / f"half_{i}")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
            1
        ).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"f{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = embedding_neardup_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), threshold=0.99,
    )
    finish_stream(q, timeout=300)
    got = {
        r["vec_id"]: r["is_dup"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {0: False, 1: False, 2: True, 3: True, 4: False, 5: True}

    # the state store carries both tables with the lineage contract
    from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta

    meta = read_meta(str(tmp_path / "state"))
    assert "lineage_token" in meta and meta["max_epoch"] >= 1
    cat = TableCatalog(spark, str(tmp_path / "state"))
    assert cat.read("vecs", meta).count() == 6
    assert cat.read("buckets", meta).select("vec_id").distinct().count() == 6


def test_embedding_neardup_stream_multiprobe_state_economics(
    spark, tmp_path, finish_stream
):
    """probes=4 (round 13): identical dup flags on the identical-twin
    construction — twins agree on every sign bit, so they collide in the
    base bucket of any table — while the PERSISTENT bucket state stores
    ceil(T/4) tables instead of T: exactly the rows the stream must join,
    compact, and vacuum forever, shrunk ~4x.  Probe rows (the query-side
    bit-flip expansions) must never be appended to state."""
    import math
    import os
    import shutil
    import time

    from lmdiskann_jl_spark.operators.dedup import lsh_neardup_params
    from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta
    from lmdiskann_jl_spark.streaming.dedup import embedding_neardup_stream

    e0 = [1.0, 0.0, 0.0, 0.0]
    e1 = [0.0, 1.0, 0.0, 0.0]
    rows_b1 = [(0, e0), (1, e1), (2, e0)]
    rows_b2 = [(3, e0), (4, [0.0, 0.0, 1.0, 0.0]), (5, e1)]
    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time()
    for i, rows in enumerate((rows_b1, rows_b2)):
        tmp = str(tmp_path / f"half_{i}")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
            1
        ).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"f{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))

    got = {}
    bucket_rows = {}
    for probes in (1, 4):
        d = str(tmp_path / f"p{probes}")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = embedding_neardup_stream(
            stream, f"{d}/state", f"{d}/out", f"{d}/ckpt",
            threshold=0.99, probes=probes,
        )
        finish_stream(q, timeout=300)
        got[probes] = {
            r["vec_id"]: r["is_dup"]
            for r in spark.read.parquet(f"{d}/out").collect()
        }
        meta = read_meta(f"{d}/state")
        bucket_rows[probes] = TableCatalog(spark, f"{d}/state").read(
            "buckets", meta
        ).count()

    assert got[1] == got[4] == {
        0: False, 1: False, 2: True, 3: True, 4: False, 5: True
    }
    n_vecs = 6
    full_t = lsh_neardup_params(0.99)[1]
    assert bucket_rows[1] == n_vecs * full_t
    assert bucket_rows[4] == n_vecs * max(2, math.ceil(full_t / 4))
    assert bucket_rows[4] * 3 <= bucket_rows[1], (
        "multiprobe state must be ~4x smaller than the full-table store"
    )


def test_embedding_neardup_stream_rejects_foreign_lineage(
    spark, tmp_path, finish_stream
):
    """The embedding store shares the text store's enforced lineage
    contract (token + max_epoch) via the common helpers."""
    import json

    import pytest

    from lmdiskann_jl_spark.sources.tables import TableCatalog, write_meta
    from lmdiskann_jl_spark.streaming.dedup import embedding_neardup_stream

    docs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    state = str(tmp_path / "state")
    cat = TableCatalog(spark, state)
    meta = cat.write(
        "buckets",
        spark.createDataFrame(
            [(0, 0, 1, 0)], "vec_id long, lsh_table int, bucket long, _epoch long"
        ),
        {"versions": {}},
    )
    meta["max_epoch"] = 0
    meta["lineage_token"] = "someone-else"
    write_meta(state, meta)

    docs.coalesce(1).write.parquet(str(tmp_path / "in"))
    q = embedding_neardup_stream(
        spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in")),
        state, str(tmp_path / "out"), str(tmp_path / "fresh_ckpt"),
    )
    with pytest.raises(Exception, match="lineage violation"):
        q.processAllAvailable()
    q.stop()


def test_embedding_neardup_stream_rejects_config_mismatch(
    spark, tmp_path, finish_stream
):
    """Round 14: the (n_planes, n_tables, probes, seed) tuple is ENFORCED
    state identity, not just documented — a continuation of the same
    checkpoint lineage with a different probes value must raise at its
    first micro-batch instead of silently joining buckets computed under
    an incompatible table count (which would corrupt dup flags)."""
    import os
    import shutil
    import time

    import pytest

    from lmdiskann_jl_spark.sources.tables import read_meta
    from lmdiskann_jl_spark.streaming.dedup import embedding_neardup_stream

    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time()

    def add_file(i, rows):
        tmp = str(tmp_path / f"half_{i}")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
            1
        ).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"f{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))

    add_file(0, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])])
    state, out, ckpt = (
        str(tmp_path / "state"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    def start(probes):
        return embedding_neardup_stream(
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            state, out, ckpt, threshold=0.99, probes=probes,
        )

    q = start(4)
    finish_stream(q, timeout=300)
    cfg = read_meta(state).get("lsh_config")
    assert cfg is not None and int(cfg[2]) == 4, "resolved tuple must be stamped"

    # same lineage (same checkpoint), new data, DIFFERENT probes: the
    # lineage token matches, so only the config guard can catch this
    add_file(1, [(2, [1.0, 0.0, 0.0, 0.0])])
    q2 = start(1)
    with pytest.raises(Exception, match="config violation"):
        q2.processAllAvailable()
    q2.stop()

    # the original configuration still continues cleanly
    q3 = start(4)
    finish_stream(q3, timeout=300)
    got = {r["vec_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}
    assert got[2] is True  # twin of vec 0, seen earlier


def test_neardup_stream_rejects_band_config_mismatch(
    spark, tmp_path, finish_stream
):
    """Round 14: the text band store enforces its (n_perm, band_rows)
    identity the same way the embedding store enforces its LSH tuple — a
    continuation with different banding parameters raises instead of
    silently joining incompatible band signatures."""
    import os
    import shutil
    import time

    import pytest

    from lmdiskann_jl_spark.sources.tables import read_meta
    from lmdiskann_jl_spark.streaming.dedup import neardup_stream

    src = tmp_path / "in"
    src.mkdir()
    t0 = time.time()

    def add_file(i, rows):
        tmp = str(tmp_path / f"half_{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(src / f"f{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))

    add_file(0, [(0, "the quick brown fox jumps over the lazy dog")])
    state, out, ckpt = (
        str(tmp_path / "state"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    def start(n_perm):
        return neardup_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            state, out, ckpt, n_perm=n_perm,
        )

    q = start(32)
    finish_stream(q, timeout=300)
    assert [int(x) for x in read_meta(state)["band_config"]][0] == 32

    add_file(1, [(1, "an entirely different document body")])
    q2 = start(16)
    with pytest.raises(Exception, match="config violation"):
        q2.processAllAvailable()
    q2.stop()
