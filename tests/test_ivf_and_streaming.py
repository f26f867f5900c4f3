"""IVF index path + Structured Streaming operators."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.ivf import assign_cells, build_ivf, ivf_search, write_ivf
from lmdiskann_jl_spark.operators.topk import exact_topk


@pytest.fixture(scope="module")
def emb(embeddings):
    return embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).cache()


def test_ivf_build_partitions_all_vectors(emb):
    centroids, assigned = build_ivf(emb, n_cells=8)
    assert centroids.count() == 8
    assert assigned.count() == emb.count()
    # every vector in exactly one cell
    assert assigned.select("id").distinct().count() == emb.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_recall_meets_reference_bar(emb):
    # Same operating point as the declared a_ivf_recall gate (probe 8 of 16
    # cells).  The fixture's synthetic embeddings are near-isotropic (the
    # 2nd-nearest centroid is almost as close as the nearest for ~95% of
    # rows), so a few-probe/tiny-cell point (3 of 8) is init-noise-dominated
    # — measured 0.64-0.74 across k-means restarts — while the gate's 50%
    # probe fraction holds 0.82-0.88 for every init.
    centroids, assigned = build_ivf(emb, n_cells=16)
    assigned = assigned.cache()
    hits = 0.0
    qids = [1, 50, 150, 250, 350]
    for qid in qids:
        q = [float(x) for x in emb.filter(F.col("id") == qid).collect()[0]["vec"]]
        exact_ids = {r["id"] for r in exact_topk(emb, q, k=10, metric="euclidean").collect()}
        ivf_ids = {r["id"] for r in ivf_search(assigned, centroids, q, k=10, nprobe=8).collect()}
        hits += len(exact_ids & ivf_ids) / 10.0
    assert hits / len(qids) >= 0.70


def test_assign_cells_arrow_chunked_matches_hof(emb, monkeypatch):
    """The Arrow euclidean path computes squared distances over bounded
    cell CHUNKS (round 15 — the unchunked broadcast-difference form
    materialized a (batch x n_cells x dim) intermediate, ~5 GB/task at
    production cell counts).  Chunking must not change a single
    assignment: every float op is identical to the unchunked form, ties
    still resolve to the lowest cell.  Forced to 1-cell chunks here so the
    running-min merge across chunk boundaries is actually exercised."""
    from lmdiskann_jl_spark.operators import ivf as ivf_mod

    centroids, _ = build_ivf(emb, n_cells=8)
    monkeypatch.setattr(ivf_mod, "_ARROW_CHUNK_BYTES", 1)  # 1 cell per chunk
    for metric in ("euclidean", "sqeuclidean"):
        chunked = assign_cells(emb, centroids, metric, use_arrow=True)
        hof = assign_cells(emb, centroids, metric, use_arrow=False)
        assert chunked.exceptAll(hof).count() == 0
        assert hof.exceptAll(chunked).count() == 0


def test_ivf_partition_pruned_scan(emb, spark, tmp_path):
    """The written layout must partition-prune: probing 2 of 8 cells reads
    only those cell directories."""
    centroids, assigned = build_ivf(emb, n_cells=8)
    path = str(tmp_path / "ivf")
    write_ivf(assigned, path)
    on_disk = spark.read.parquet(path)
    q = [float(x) for x in emb.limit(1).collect()[0]["vec"]]
    res = ivf_search(on_disk, centroids, q, k=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # partition filter on cell must appear in the scan, not a post-filter
    assert "PartitionFilters" in plan and "cell" in plan
    assert len(res.collect()) == 5


def test_stateful_running_user_stats(spark, sf_dir, tmp_path, finish_stream):
    """applyInPandasWithState across two micro-batches accumulates state."""
    import pandas as pd

    from lmdiskann_jl_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    import os

    os.makedirs(src)
    rows1 = pd.DataFrame({"user_id": [1, 1, 2], "value": [1.0, 2.0, 5.0], "ts": [10, 20, 30]})
    rows1.to_parquet(src + "/b1.parquet")

    stream = spark.readStream.schema("user_id long, value double, ts long").parquet(src)
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ustats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    finish_stream(q)
    got = {r["user_id"]: r for r in spark.sql("SELECT * FROM ustats").collect()}
    assert got[1]["n_events"] == 2 and got[1]["total_value"] == pytest.approx(3.0)
    assert got[2]["n_events"] == 1 and got[2]["last_ts"] == 30

    # second micro-batch: state carries over (memory sink can't recover a
    # checkpoint, so round 2 drains through foreachBatch, which can)
    rows2 = pd.DataFrame({"user_id": [1], "value": [10.0], "ts": [40]})
    rows2.to_parquet(src + "/b2.parquet")
    collected: dict[int, dict] = {}

    def _drain(batch_df, _epoch):
        for r in batch_df.collect():
            collected[r["user_id"]] = r.asDict()

    q2 = (
        out.writeStream.foreachBatch(_drain)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    finish_stream(q2)
    assert collected[1]["n_events"] == 3
    assert collected[1]["total_value"] == pytest.approx(13.0)
    assert collected[1]["last_ts"] == 40


def test_ivf_invalidated_by_mutation(spark, tmp_path):
    """A mutation after build_ivf must invalidate the cell layout: auto mode
    stops selecting it, explicit ivf mode refuses with a clear error, and a
    rebuild restores it — stale probes would return deleted ids and miss
    inserts."""
    import random

    import pytest as _pytest

    import lmdiskann_jl_spark as pkg

    random.seed(3)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(120)]
    batch = spark.createDataFrame(rows, "k string, vec array<float>")
    idx = pkg.create_index(spark, str(tmp_path / "ivfidx"), dim=4, maxdegree=4)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=4)
    assert idx._ivf_fresh()
    q = rows[5][1]
    assert idx.search(q, topk=3, mode="ivf").count() == 3

    idx.delete_batch(keys=["k-5"])
    assert not idx._ivf_fresh()
    with _pytest.raises(ValueError, match="stale|IVF"):
        idx.search(q, topk=3, mode="ivf")
    # auto silently falls back to a fresh strategy — and must NOT return k-5
    res = idx.search(q, topk=3, mode="auto").collect()
    assert "k-5" not in {r["key"] for r in res}

    idx.build_ivf(n_cells=4)
    assert idx._ivf_fresh()
    res2 = idx.search(q, topk=3, mode="ivf").collect()
    assert "k-5" not in {r["key"] for r in res2}


def test_stream_dedup_ingest_across_batches(spark, tmp_path, finish_stream):
    """Content accepted once across micro-batches: in-batch dups collapse to
    the min id, later batches drop digests already seen, and restarts resume
    from the on-disk digest state."""
    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.streaming.ingest import stream_dedup_ingest

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema  # 3 dups 1 in-batch
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    q = stream_dedup_ingest(stream, str(out), str(ckpt))
    finish_stream(q)

    acc1 = {(r["doc_id"], r["text"]) for r in spark.read.parquet(str(out / "accepted")).collect()}
    assert acc1 == {(1, "alpha"), (2, "beta")}

    # second wave: one seen content, one new — only the new one lands
    spark.createDataFrame([(10, "beta"), (11, "gamma")], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b2"))
    q2 = stream_dedup_ingest(
        spark.readStream.schema(schema).parquet(str(src) + "/*"),
        str(out),
        str(ckpt),
    )
    finish_stream(q2)

    acc2 = {(r["doc_id"], r["text"]) for r in spark.read.parquet(str(out / "accepted")).collect()}
    assert acc2 == {(1, "alpha"), (2, "beta"), (11, "gamma")}
    n_digests = spark.read.parquet(str(out / "digests")).distinct().count()
    assert n_digests == 3


def test_ivf_incremental_maintenance(spark, tmp_path):
    """maintain_ivf=True keeps the cell layout live across mutations: deletes
    become probe-time tombstones, inserts are assigned to existing centroids
    and appended — no KMeans rebuild, and mode='ivf' keeps answering."""
    import random

    import lmdiskann_jl_spark as pkg

    random.seed(11)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(120)]
    batch = spark.createDataFrame(rows, "k string, vec array<float>")
    idx = pkg.create_index(spark, str(tmp_path / "ivfinc"), dim=4, maxdegree=4)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=4)

    q = rows[5][1]
    idx.delete_batch(keys=["k-5"], maintain_ivf=True)
    assert idx._ivf_fresh()  # layout survives the delete
    res = idx.search(q, topk=3, mode="ivf").collect()
    assert "k-5" not in {r["key"] for r in res} and len(res) == 3

    new = spark.createDataFrame([("new-1", q)], "k string, vec array<float>")
    idx.insert_batch(new, vec_col="vec", key_col="k", maintain_ivf=True)
    assert idx._ivf_fresh() and idx.meta["ivf"]["n_appended"] == 1
    res2 = idx.search(q, topk=3, mode="ivf").collect()
    assert res2[0]["key"] == "new-1" and res2[0]["dist"] == pytest.approx(0.0, abs=1e-6)

    # compact() folds the tombstones into a rewritten cell table AND keeps
    # the fresh layout fresh (round 9; the standalone slow-tier test covers
    # the vacuum pruning of the superseded dir)
    assert idx.meta["ivf"].get("tombstones") is True
    idx.compact()
    assert idx._ivf_fresh(), "compaction must not stale a fresh IVF layout"
    assert "tombstones" not in idx.meta["ivf"]
    assert idx.meta["ivf"]["n_compactions"] == 1
    res3 = idx.search(q, topk=3, mode="ivf").collect()
    assert "k-5" not in {r["key"] for r in res3} and len(res3) == 3

    # a rebuild clears the incremental state (fresh dir, no tombstones)
    idx.build_ivf(n_cells=4)
    assert "tombstones" not in idx.meta["ivf"] and idx.meta["ivf"].get("n_appended", 0) == 0


def test_ivf_drift_autorefit_keeps_recall(spark, tmp_path):
    """Drift policy stress (round 10): push maintained batches from a NEW
    cluster the frozen centroids never saw.  Within the budget
    (n_appended <= IVF_AUTOREFIT_DRIFT * built_n) inserts append under
    frozen assignment; the batch that crosses it triggers an automatic cell
    refit inside insert_batch (fresh k-means over the current corpus, new
    built_n snapshot, n_refits bumped) — so the layout never silently
    degrades: after every batch the index is fresh AND recall@10 vs the
    exact scan stays >= the reference's 0.70 bar (test/runtests.jl:454)."""
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.index import IVF_AUTOREFIT_DRIFT

    random.seed(23)
    base = [(f"b-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(200)]
    idx = pkg.create_index(spark, str(tmp_path / "drift"), dim=4, maxdegree=4)
    idx.insert_batch(
        spark.createDataFrame(base, "k string, vec array<float>"),
        vec_col="vec", key_col="k",
    )
    idx.build_ivf(n_cells=4)
    assert idx.meta["ivf"]["built_n"] == 200

    def recall_at_10(q):
        ivf_ids = {r["id"] for r in idx.search(q, topk=10, mode="ivf", nprobe=2).collect()}
        exact_ids = {r["id"] for r in idx.search(q, topk=10, mode="exact").collect()}
        return len(ivf_ids & exact_ids) / 10

    # three 40-row batches centered at (5,5,5,5): a cluster no frozen
    # centroid covers — exactly the ingest pattern that decays recall
    probe_q = [5.0, 5.0, 5.0, 5.0]
    for wave in range(3):
        rows = [
            (f"n{wave}-{i}", [5.0 + random.gauss(0, 0.3) for _ in range(4)])
            for i in range(40)
        ]
        idx.insert_batch(
            spark.createDataFrame(rows, "k string, vec array<float>"),
            vec_col="vec", key_col="k", maintain_ivf=True,
        )
        assert idx._ivf_fresh(), "maintained layout must never go silently stale"
        drift = idx.stats()["ivf_drift"]
        assert drift is not None and drift <= IVF_AUTOREFIT_DRIFT, (
            f"wave {wave}: drift {drift} exceeds the refit budget — policy did not fire"
        )
        assert recall_at_10(probe_q) >= 0.70

    # wave 0: 40 <= 0.25*200 -> frozen append; wave 1: 80 > 50 -> refit
    # (built_n resnapshots to 280, counter resets); wave 2: 40 <= 70 -> append
    ivf = idx.meta["ivf"]
    assert ivf.get("n_refits", 0) == 1
    assert ivf["built_n"] == 280
    assert ivf.get("n_appended", 0) == 40
    assert idx.stats()["ivf_drift"] == pytest.approx(40 / 280)


def test_ivf_churn_deletes_count_toward_drift(spark, tmp_path):
    """Churn stress (round 11): deletes must MOVE the drift meter.  A
    maintained delete of 40% of the corpus leaves the frozen centroids
    describing rows that no longer exist; counting only appends would read
    that as 0 drift.  With tombstones in the numerator (_layout_drift_n),
    stats() crosses the budget loudly right after the delete, and the next
    maintained insert — just 10% of the corpus — fires the auto-refit."""
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.index import IVF_AUTOREFIT_DRIFT

    random.seed(29)
    base = [(f"b-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(200)]
    idx = pkg.create_index(spark, str(tmp_path / "churn"), dim=4, maxdegree=4)
    idx.insert_batch(
        spark.createDataFrame(base, "k string, vec array<float>"),
        vec_col="vec", key_col="k",
    )
    idx.build_ivf(n_cells=4)
    assert idx.meta["ivf"]["built_n"] == 200

    # delete 40% maintained: tombstones, not a refit — but the meter moves
    dead_ids = [int(r["id"]) for r in idx.vectors.select("id").collect()][:80]
    idx.delete_batch(ids=dead_ids, maintain_ivf=True)
    drift = idx.stats()["ivf_drift"]
    assert drift == pytest.approx(80 / 200), "deletes must count toward drift"
    assert drift > IVF_AUTOREFIT_DRIFT, "40% churn must cross the budget loudly"
    assert idx._ivf_fresh()
    # deleted ids never surface from a tombstoned probe
    q = [0.0, 0.0, 0.0, 0.0]
    assert not ({r["id"] for r in idx.search(q, topk=10, mode="ivf", nprobe=4).collect()}
                & set(dead_ids))

    # a 10%-sized maintained insert now fires the refit (20 + 80 > 0.25*200)
    rows = [(f"n-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(20)]
    idx.insert_batch(
        spark.createDataFrame(rows, "k string, vec array<float>"),
        vec_col="vec", key_col="k", maintain_ivf=True,
    )
    ivf = idx.meta["ivf"]
    assert ivf.get("n_refits", 0) == 1, "churn past the budget must refit"
    assert ivf["built_n"] == 140  # 200 - 80 + 20: fit on the live corpus
    assert not ivf.get("tombstones"), "refit reads live rows — tombstones die"
    assert idx.stats()["ivf_drift"] == 0.0
    # refit layout: correct membership and healthy recall
    got = {r["id"] for r in idx.search(q, topk=10, mode="ivf", nprobe=2).collect()}
    exact = {r["id"] for r in idx.search(q, topk=10, mode="exact").collect()}
    assert not (got & set(dead_ids))
    assert len(got & exact) / 10 >= 0.70


def test_ivf_search_batch_matches_single_probes(emb, spark):
    """The batched probe must return the same per-query top-k as running the
    single-query probe per qid, in one job, with the scan pruned to the
    probed-cell union."""
    centroids, assigned = build_ivf(emb, n_cells=8)
    assigned = assigned.cache()
    from lmdiskann_jl_spark.operators.ivf import ivf_search_batch

    qids = [1, 50, 150]
    queries = emb.filter(F.col("id").isin(qids)).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    batch = ivf_search_batch(assigned, centroids, queries, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["id"]))
    for qid in qids:
        q = [float(x) for x in emb.filter(F.col("id") == qid).collect()[0]["vec"]]
        single = [r["id"] for r in ivf_search(assigned, centroids, q, k=5, nprobe=3).collect()]
        assert [i for _, i in sorted(got[qid])] == single


def test_streaming_rollup_drops_late_rows(spark, tmp_path, finish_stream):
    """Rows older than the watermark (2h) when it advances must be dropped:
    after batch 1 moves the watermark forward, batch 2's very-late row never
    surfaces in append-mode output while its fresh row does."""
    import os

    import pandas as pd

    from lmdiskann_jl_spark.streaming.ingest import streaming_hourly_rollup

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    H = 3_600

    def write(name, rows):
        pd.DataFrame(
            {
                "event_id": list(range(len(rows))),
                "ts": pd.to_datetime([int(t) for t, _ in rows], unit="s").astype(
                    "datetime64[us]"
                ),
                "user_id": [1] * len(rows),
                "event_type": [e for _, e in rows],
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(f"{src}/{name}.parquet")

    # batch 1: events across hours 0 and 10 — watermark advances to 10h-2h=8h
    write("b1", [(0 * H + 10, "w0"), (10 * H + 10, "w10")])
    out = streaming_hourly_rollup(spark, src)

    def drain():
        rows = []

        def _collect(batch_df, _epoch):
            rows.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(_collect)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        finish_stream(q)
        return {(r["bucket"], r["event_type"]): r["n"] for r in rows}

    got1 = drain()
    # append mode emits only windows below the watermark: hour-0 is closed
    assert (0, "w0") in got1 and (10 * H, "w10") not in got1

    # batch 2: one row in closed hour 1 (LATE — dropped), one fresh at hour 11
    write("b2", [(1 * H + 5, "late"), (11 * H + 5, "w11")])
    got2 = drain()
    assert all(et != "late" for _, et in got2)  # late row dropped by watermark

    # batch 3 advances the watermark to 12h, closing hours 10 and 11 — the
    # late hour-1 row must STILL never surface
    write("b3", [(14 * H + 5, "w14")])
    got3 = drain()
    assert any(et == "w10" for _, et in got3)
    assert any(et == "w11" for _, et in got3)
    assert all(et != "late" for _, et in got3)


def test_streaming_rollup_matches_batch_twin(spark, tmp_path, finish_stream):
    """Stream/batch parity: the watermarked streaming rollup over the
    driver fixture's events (drained with availableNow, complete mode so
    open windows emit) must produce EXACTLY the batch q_events_hourly
    result — same buckets, same counts, same sums."""
    import shutil

    from lmdiskann_jl_spark.plans.queries import q_events_hourly
    from lmdiskann_jl_spark.streaming.ingest import streaming_hourly_rollup

    sf_dir = "/root/testdata/sf0.001"
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    out = streaming_hourly_rollup(spark, str(src))
    rows = []

    def _collect(batch_df, _epoch):
        rows.clear()  # complete mode re-emits the full state each epoch
        rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(_collect)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    finish_stream(q)

    got = {(r["bucket"], r["event_type"]): (r["n"], r["sum_value_cents"]) for r in rows}
    want = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_stateless_stream_clean_equals_batch_under_multibatch_slicing(
    spark, sf_dir, tmp_path, finish_stream
):
    """The property s_stream_clean pins: a STATELESS streaming transform
    equals the batch projection regardless of micro-batch slicing.  Force
    worst-case slicing (many input files, maxFilesPerTrigger=1 => one
    micro-batch per file) and assert bit-equality with the batch result."""
    from lmdiskann_jl_spark.functions.text import langid_expr, quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    src = tmp_path / "in"
    docs.repartition(8).write.parquet(str(src))  # 8 files -> 8 micro-batches

    def clean(df):
        return df.select(
            "doc_id",
            langid_expr(F.col("text")).alias("pred_lang"),
            quality_features(F.col("text"))["quality_score"].alias("q"),
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        clean(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .start(str(tmp_path / "out"))
    )
    finish_stream(q)
    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {tuple(r) for r in clean(docs).collect()}
    assert got == want


def test_stateful_sessions_equal_batch_under_multibatch_slicing(
    spark, tmp_path, finish_stream
):
    """The q_stream_sessions gate writes ONE input file because its
    0-second watermark makes single-batch load-bearing (any cross-batch
    disorder would be late).  This pins the GENERAL stateful contract the
    gate's sentinel flush relies on: with a watermark delay >= the
    stream's event-time span, the same session_window aggregation +
    far-future sentinel equals the batch twin under worst-case slicing
    (arbitrary 6-way split, maxFilesPerTrigger=1 => one micro-batch per
    file, only the sentinel pinned to arrive last)."""
    from lmdiskann_jl_spark.streaming.sessions import streaming_sessions

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_df = ev.select(
        "user_id", F.timestamp_seconds(F.unix_timestamp("ts")).alias("tsec")
    )
    lo, hi = src_df.agg(
        F.min(F.unix_timestamp("tsec")), F.max(F.unix_timestamp("tsec"))
    ).first()
    gap_sec, delay = 1800, int(hi - lo) + 1
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(int(hi) + delay + gap_sec + 1)).alias("tsec"),
    )
    src = str(tmp_path / "in")
    src_df.repartition(6).write.parquet(src)
    sent_dir = str(tmp_path / "sent")
    sentinel.coalesce(1).write.parquet(sent_dir)
    import glob
    import os
    import shutil
    import time

    for f in glob.glob(f"{sent_dir}/part-*.parquet"):
        shutil.copy(f, f"{src}/zz-sentinel.parquet")
    t = time.time() + 3600
    os.utime(os.path.join(src, "zz-sentinel.parquet"), (t, t))

    stream = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = streaming_sessions(
        stream, key_col="user_id", ts_col="tsec",
        gap=f"{gap_sec} seconds", watermark=f"{delay} seconds",
    )
    q = (
        sess.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .start(str(tmp_path / "out"))
    )
    finish_stream(q)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(str(tmp_path / "out"))
        .filter(F.col("user_id") >= 0)
        .collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in streaming_sessions(
            src_df, key_col="user_id", ts_col="tsec", gap=f"{gap_sec} seconds"
        ).collect()
    }
    assert got == want


def test_stateful_rollup_equal_batch_under_multibatch_slicing(
    spark, tmp_path, finish_stream
):
    """Same multi-batch hardening for the tumbling-window rollup gate:
    span-sized watermark delay + last-arriving sentinel => the windowed
    cents aggregation equals the batch twin under one-file-per-batch
    slicing."""
    import os
    import time

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_df = ev.select(
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("tsec"),
        "event_type",
        "value",
    )
    lo, hi = src_df.agg(
        F.min(F.unix_timestamp("tsec")), F.max(F.unix_timestamp("tsec"))
    ).first()
    delay = int(hi - lo) + 1
    sentinel = spark.range(1).select(
        F.timestamp_seconds(F.lit(int(hi) + delay + 7200)).alias("tsec"),
        F.lit("__sentinel__").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    src = str(tmp_path / "in")
    src_df.repartition(6).write.parquet(src)
    sent_dir = str(tmp_path / "sent")
    sentinel.coalesce(1).write.parquet(sent_dir)
    import glob
    import shutil

    for f in glob.glob(f"{sent_dir}/part-*.parquet"):
        shutil.copy(f, f"{src}/zz-sentinel.parquet")
    t = time.time() + 3600
    os.utime(os.path.join(src, "zz-sentinel.parquet"), (t, t))

    def rolled(df, wm=None):
        base = df.withWatermark("tsec", wm) if wm else df
        return (
            base.groupBy(F.window("tsec", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("sum_value_cents"),
            )
            .select(
                F.unix_timestamp("w.start").alias("bucket"),
                "event_type", "n", "sum_value_cents",
            )
        )

    stream = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        rolled(stream, wm=f"{delay} seconds")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .start(str(tmp_path / "out"))
    )
    finish_stream(q)
    got = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in spark.read.parquet(str(tmp_path / "out"))
        .filter(F.col("event_type") != "__sentinel__")
        .collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in rolled(src_df).collect()
    }
    assert got == want


@pytest.mark.slow
def test_stream_insert_maintains_blocks(spark, tmp_path, finish_stream):
    """stream_insert(maintain_blocks=True): every micro-batch keeps the
    LM-DiskANN block layout fresh (touched rows append as merge-on-read
    segments), so beam search stays on the one-fetch path mid-stream and
    finds points from every batch.  maxFilesPerTrigger=1 forces the two
    source files into SEPARATE micro-batches."""
    import random

    import lmdiskann_jl_spark as pkg

    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.streaming.ingest import stream_insert

    random.seed(11)
    base = spark.createDataFrame(
        [(f"seed-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(40)],
        "k string, vec array<float>",
    )
    idx = pkg.create_index(spark, str(tmp_path / "idx"), dim=8, maxdegree=6)
    idx.insert_batch(base, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4)
    assert idx._blocks_fresh()

    src = tmp_path / "vsrc"
    src.mkdir()
    probe_a = [0.11 * j for j in range(8)]
    probe_b = [-0.13 * j for j in range(8)]
    schema = "k string, vec array<float>"
    spark.createDataFrame([("stream-a", probe_a)], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame([("stream-b", probe_b)], schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = stream_insert(
        idx, stream, str(tmp_path / "ckpt"), vec_col="vec", key_col="k",
        maintain_blocks=True,
    )
    finish_stream(q)

    assert idx._blocks_fresh(), "layout must stay fresh across micro-batches"
    assert idx.meta["beam_blocks"]["n_appended"] == 2
    for key, probe in (("stream-a", probe_a), ("stream-b", probe_b)):
        top = idx.search(probe, topk=1, mode="beam", ef=40, n_entrypoints=4).collect()
        assert top[0]["key"] == key


@pytest.mark.slow
def test_compact_folds_ivf_tombstones_and_keeps_fresh(spark, tmp_path):
    """compact() on an index with maintained-IVF tombstones: the cell table
    rewrites live-only into a new catalog version (pointer swap), the
    tombstone flag clears and the tombstone table unlists, probes stay
    correct, and freshness survives the compaction — previously compacting
    the base tables silently staled a fresh IVF layout."""
    import os
    import random

    import lmdiskann_jl_spark as pkg

    random.seed(13)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(100)]
    batch = spark.createDataFrame(rows, "k string, vec array<float>")
    idx = pkg.create_index(spark, str(tmp_path / "ivfc"), dim=4, maxdegree=4)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=4)
    idx.delete_batch(keys=["k-3", "k-9"], maintain_ivf=True)
    assert idx.meta["ivf"].get("tombstones") is True
    assert "ivf_tombstones" in idx.meta["versions"]
    old_v = idx.meta["versions"]["ivf_cells"]
    old_dir = str(tmp_path / "ivfc" / "ivf_cells" / f"v={old_v}")

    idx.compact()
    assert idx._ivf_fresh(), "compaction must not stale a fresh IVF layout"
    ivf = idx.meta["ivf"]
    assert "tombstones" not in ivf and ivf["n_compactions"] == 1
    assert idx.meta["versions"]["ivf_cells"] != old_v
    assert "ivf_tombstones" not in idx.meta["versions"]
    # dead rows are physically gone from the new cell table
    cells = idx._ivf_assigned()
    dead_ids = {idx.get_id_from_key(k) for k in ("k-3", "k-9")}
    assert dead_ids == {None}  # keys resolved to nothing post-delete
    assert cells.count() == 98
    res = idx.search(rows[3][1], topk=3, mode="ivf").collect()
    assert "k-3" not in {r["key"] for r in res} and len(res) == 3
    # vacuum prunes the superseded cell version and the tombstone table
    # once no retained commit references them
    idx.vacuum(keep=0, min_age_seconds=0)
    assert not os.path.isdir(old_dir)
    tomb_root = str(tmp_path / "ivfc" / "ivf_tombstones")
    assert not os.path.isdir(tomb_root) or not any(
        e.startswith("v=") for e in os.listdir(tomb_root)
    )
    new_dir = str(
        tmp_path / "ivfc" / "ivf_cells" / f"v={idx.meta['versions']['ivf_cells']}"
    )
    assert os.path.isdir(new_dir)


def test_stream_insert_maintains_ivf(spark, tmp_path, finish_stream):
    """stream_insert(maintain_ivf=True): each micro-batch assigns its rows
    to the nearest frozen centroid and appends — mode='ivf' keeps answering
    mid-stream and finds points from every batch."""
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.streaming.ingest import stream_insert

    random.seed(17)
    base = spark.createDataFrame(
        [(f"seed-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(60)],
        "k string, vec array<float>",
    )
    idx = pkg.create_index(spark, str(tmp_path / "idx"), dim=4, maxdegree=4)
    idx.insert_batch(base, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=4)

    src = tmp_path / "vsrc"
    src.mkdir()
    probe_a = [0.2, -0.4, 0.6, -0.8]
    probe_b = [-0.5, 0.3, -0.1, 0.7]
    schema = "k string, vec array<float>"
    spark.createDataFrame([("stream-a", probe_a)], schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([("stream-b", probe_b)], schema).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = stream_insert(
        idx, stream, str(tmp_path / "ckpt"), vec_col="vec", key_col="k",
        maintain_ivf=True,
    )
    finish_stream(q)

    assert idx._ivf_fresh() and idx.meta["ivf"]["n_appended"] == 2
    for key, probe in (("stream-a", probe_a), ("stream-b", probe_b)):
        res = idx.search(probe, topk=1, mode="ivf").collect()
        assert res[0]["key"] == key and res[0]["dist"] == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_ivf_compact_edge_cases(spark, tmp_path):
    """Two compaction edges: (a) repeated tombstone-fold cycles write new
    ivf_cells catalog versions inside the index root (round 12 moved the
    cell store into the TableCatalog — the old out-of-catalog '.cN'
    suffix dirs, and their path-mangling hazard, no longer exist) with the
    tombstone table unlisted after each fold; (b) tombstoning EVERY cell
    row then compacting drops the layout instead of writing a schema-less
    0-row partitioned dir that would break later reads."""
    import os
    import random

    import lmdiskann_jl_spark as pkg

    random.seed(29)

    # (a) two fold cycles ('.c' in the path stays harmless — everything is
    # root-relative catalog versions now)
    root = tmp_path / "proj.cache" / "idx"
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(40)]
    idx = pkg.create_index(spark, str(root), dim=4, maxdegree=4)
    idx.insert_batch(spark.createDataFrame(rows, "k string, vec array<float>"),
                     vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=2)
    v0 = idx.meta["versions"]["ivf_cells"]
    idx.delete_batch(keys=["k-1"], maintain_ivf=True)
    idx.compact()
    assert idx._ivf_fresh() and idx.meta["ivf"]["n_compactions"] == 1
    v1 = idx.meta["versions"]["ivf_cells"]
    assert v1 != v0
    new_dir = os.path.normpath(str(root / "ivf_cells" / f"v={v1}"))
    assert os.path.isdir(new_dir)
    assert idx._ivf_assigned().count() == 39
    assert "ivf_tombstones" not in idx.meta["versions"]
    # a second fold cycle: another new version, counter increments
    idx.delete_batch(keys=["k-2"], maintain_ivf=True)
    idx.compact()
    assert idx.meta["ivf"]["n_compactions"] == 2
    assert idx.meta["versions"]["ivf_cells"] not in (v0, v1)
    assert idx._ivf_assigned().count() == 38

    # (b) EVERY cell row tombstoned (maintained delete of all keys keeps
    # the IVF layout with full tombstone coverage) -> compact() must DROP
    # the layout, not write a schema-less 0-row partitioned dir
    root2 = tmp_path / "idx2"
    rows2 = [(f"j-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(20)]
    idx2 = pkg.create_index(spark, str(root2), dim=4, maxdegree=4)
    idx2.insert_batch(spark.createDataFrame(rows2, "j string, vec array<float>"),
                      vec_col="vec", key_col="j")
    idx2.build_ivf(n_cells=2)
    idx2.delete_batch(keys=[f"j-{i}" for i in range(20)], maintain_ivf=True)
    assert idx2.meta.get("ivf", {}).get("tombstones") is True
    idx2.compact()
    assert "ivf" not in idx2.meta  # layout covers nothing -> dropped
    with pytest.raises(ValueError, match="no IVF layout"):
        idx2.search([0.0, 0.0, 0.0, 0.0], topk=1, mode="ivf")


def test_stream_delete_maintains_layouts_and_counts_drift(spark, tmp_path, finish_stream):
    """stream_delete: a stream of doomed keys runs the maintained batch
    delete per micro-batch — deleted keys stop surfacing from ivf and beam
    searches mid-churn, both layouts stay FRESH, replayed keys are
    idempotent, and the tombstones move the round-11 drift meter."""
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.streaming.ingest import stream_delete

    random.seed(41)
    base = spark.createDataFrame(
        [(f"seed-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(60)],
        "k string, vec array<float>",
    )
    idx = pkg.create_index(spark, str(tmp_path / "idx"), dim=4, maxdegree=4)
    idx.insert_batch(base, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=4)
    idx.build_beam_blocks(n_entrypoints=4)

    src = tmp_path / "dsrc"
    src.mkdir()
    doomed = [f"seed-{i}" for i in range(10)]
    # two files -> two micro-batches; seed-3 appears in both (replay must
    # be idempotent: the second delete of it is a no-op)
    spark.createDataFrame([(k,) for k in doomed[:5]], "k string").coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([(k,) for k in doomed[4:]] + [("seed-3",)], "k string").coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = stream_delete(
        idx, stream, str(tmp_path / "ckpt"), key_col="k",
        maintain_ivf=True, maintain_blocks=True,
    )
    finish_stream(q)

    assert idx._ivf_fresh() and idx._blocks_fresh()
    assert idx.meta["num_points"] == 50
    # 10 distinct rows died; the replayed key must not double-count drift
    assert idx.meta["ivf"].get("n_deleted", 0) == 10
    assert idx.stats()["ivf_drift"] == pytest.approx(10 / 60)
    survivors = {r["key"] for r in idx.key_map.collect()}
    assert not (set(doomed) & survivors)
    probe = base.filter(F.col("k") == "seed-1").collect()[0]["vec"]
    for mode in ("ivf", "beam", "exact"):
        got = {r["key"] for r in idx.search([float(x) for x in probe], topk=5, mode=mode).collect()}
        assert not (got & set(doomed)), f"mode={mode} surfaced a deleted key"

    with pytest.raises(ValueError, match="exactly one"):
        stream_delete(idx, stream, str(tmp_path / "ckpt2"))


def test_stream_churn_gate_equals_batch_survivor_topk(spark):
    """The s_stream_churn gate (stream_insert wave + stream_delete wave +
    exact search) must equal the batch twin computed directly over the
    survivor set — the same equivalence the driver's DuckDB oracle pins,
    kept in pytest so it survives correctness-window rotation."""
    from lmdiskann_jl_spark.operators.topk import batch_topk
    from lmdiskann_jl_spark.plans import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    got = {tuple(r) for r in Q.q_stream_churn(spark, sf_dir).collect()}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    survivors = emb.filter(
        F.col("vec_id") % Q.CHURN_DOOMED_MOD != Q.CHURN_DOOMED_REM
    ).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    qdf = emb.filter(F.col("vec_id").isin(Q.RECALL_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    want = {
        tuple(r)
        for r in batch_topk(qdf, survivors, k=Q.CHURN_K, metric="euclidean")
        .select(
            "qid",
            F.col("id").alias("vec_id"),
            F.round("dist", 4).alias("dist"),
            F.col("rank").cast("long").alias("rank"),
        )
        .collect()
    }
    assert len(got) == len(Q.RECALL_QIDS) * Q.CHURN_K
    assert got == want


@pytest.mark.slow
def test_maintained_ivf_cell_segments_are_bounded(spark, tmp_path):
    """Round 12: maintained inserts append one ivf_cells catalog segment
    per batch (streaming: per micro-batch), so without a bound a long
    ingest would make every probe union an unbounded dir list.  The inline
    autocompact rule (TABLES_AUTOCOMPACT_SEGMENTS) must collapse the cell
    table, keep the layout fresh, and change no probe decision."""
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.index import TABLES_AUTOCOMPACT_SEGMENTS

    random.seed(41)
    # large built_n so ~20 single-row maintained waves never cross the
    # 25% drift budget (a refit would collapse segments for free and the
    # test would prove nothing)
    base = [(f"b-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(400)]
    idx = pkg.create_index(spark, str(tmp_path / "segbound"), dim=4, maxdegree=4)
    idx.insert_batch(
        spark.createDataFrame(base, "k string, vec array<float>"),
        vec_col="vec", key_col="k",
    )
    idx.build_ivf(n_cells=4)

    n_waves = TABLES_AUTOCOMPACT_SEGMENTS + 3
    for i in range(n_waves):
        row = [(f"n-{i}", [random.gauss(0, 1) for _ in range(4)])]
        idx.insert_batch(
            spark.createDataFrame(row, "k string, vec array<float>"),
            vec_col="vec", key_col="k", maintain_ivf=True,
        )
    ivf = idx.meta["ivf"]
    assert ivf.get("n_refits", 0) == 0, "waves must stay below the drift budget"
    assert idx._ivf_fresh()
    segs = idx.catalog._segments("ivf_cells", idx.meta)
    assert len(segs) <= TABLES_AUTOCOMPACT_SEGMENTS, (
        f"{len(segs)} live ivf_cells segments — the inline bound did not fire"
    )
    # no row lost to the collapse: every base + appended id still probes
    assert idx._ivf_assigned().count() == 400 + n_waves
    probe = base[7][1]
    res = idx.search(probe, topk=1, mode="ivf", nprobe=4).collect()
    assert res[0]["key"] == "b-7" and res[0]["dist"] == pytest.approx(0.0, abs=1e-6)


def test_maintained_ivf_tombstone_segments_are_bounded(spark, tmp_path, monkeypatch):
    """Round 12: each maintained delete appends one ivf_tombstones catalog
    segment; past the lowered bound the violating delete collapses the
    table inline (ids are insert-only — the union IS the merge), so the
    probe anti-join never unions an unbounded dir list.  Decisions are
    unchanged: every tombstoned key stays invisible."""
    import random

    import lmdiskann_jl_spark as pkg
    import lmdiskann_jl_spark.index as idx_mod

    monkeypatch.setattr(idx_mod, "TABLES_AUTOCOMPACT_SEGMENTS", 3)
    random.seed(43)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(120)]
    idx = pkg.create_index(spark, str(tmp_path / "tbound"), dim=4, maxdegree=4)
    idx.insert_batch(
        spark.createDataFrame(rows, "k string, vec array<float>"),
        vec_col="vec", key_col="k",
    )
    idx.build_ivf(n_cells=4)
    doomed = [f"k-{i}" for i in range(5)]
    for k in doomed:
        idx.delete_batch(keys=[k], maintain_ivf=True)
    assert idx._ivf_fresh() and idx.meta["ivf"].get("tombstones")
    segs = idx.catalog._segments("ivf_tombstones", idx.meta)
    assert len(segs) <= 3, f"{len(segs)} tombstone segments — bound did not fire"
    # no tombstone lost to the collapse
    assert idx.catalog.read("ivf_tombstones", idx.meta).count() == 5
    got = {
        r["key"]
        for r in idx.search(rows[1][1], topk=10, mode="ivf", nprobe=4).collect()
    }
    assert not (got & set(doomed))


def test_legacy_ivf_dir_layout_guarded(spark, tmp_path):
    """An index whose meta carries the pre-round-12 IVF shape (an
    out-of-catalog meta['ivf']['dir'], no ivf_cells catalog entry) must
    (a) raise the curated rebuild error on an IVF probe instead of a raw
    KeyError, and (b) keep its legacy dir protected from vacuum — a live
    legacy store must never be physically destroyed by an upgrade."""
    import os
    import random

    import lmdiskann_jl_spark as pkg
    from lmdiskann_jl_spark.sources.tables import write_meta

    random.seed(47)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(30)]
    path = str(tmp_path / "legacy")
    idx = pkg.create_index(spark, path, dim=4, maxdegree=4)
    idx.insert_batch(
        spark.createDataFrame(rows, "k string, vec array<float>"),
        vec_col="vec", key_col="k",
    )
    # hand-build the legacy shape: centroids in the catalog (as pre-r12
    # code kept them), the CELL store in an out-of-catalog dir
    legacy_dir = os.path.join(path, "ivf_cells_legacy")
    idx.vectors.selectExpr("id", "vec", "id % 2 AS cell").write.partitionBy(
        "cell"
    ).parquet(legacy_dir)
    centroids = spark.createDataFrame(
        [(0, [0.5, 0.0, 0.0, 0.0]), (1, [-0.5, 0.0, 0.0, 0.0])],
        "cell int, centroid array<double>",
    )
    meta = idx.catalog.write("ivf_centroids", centroids, idx.meta)
    meta["ivf"] = {
        "n_cells": 2, "seed": 42, "dir": legacy_dir,
        "built_from": meta["versions"]["vectors"], "built_n": 30,
    }
    write_meta(path, meta)
    idx = pkg.load_index(spark, path)
    # round 13: a legacy layout is never fresh — it cannot be probed,
    # appended to, or tombstoned through the versioned contract, so every
    # maintenance path (and auto-mode selection) must treat it as absent
    assert not idx._ivf_fresh()

    with pytest.raises(ValueError, match="legacy IVF layout"):
        idx.search([0.0] * 4, topk=3, mode="ivf")
    # exact/beam still serve
    assert idx.search(rows[0][1], topk=1, mode="exact").collect()[0]["key"] == "k-0"

    # vacuum must protect the legacy dir (it is referenced by the current
    # meta), and build_ivf upgrades the layout into the catalog
    idx.vacuum(keep=0, min_age_seconds=0)
    assert os.path.isdir(legacy_dir)
    idx.build_ivf(n_cells=2)
    assert "ivf_cells" in idx.meta["versions"] and "dir" not in idx.meta["ivf"]
    got = idx.search(rows[0][1], topk=1, mode="ivf", nprobe=2).collect()
    assert got[0]["key"] == "k-0"
