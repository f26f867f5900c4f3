"""LM-DiskANN block layout (index.build_beam_blocks + beam_search_batch_blocks).

The block layout is the LM-DiskANN PAPER's defining disk format (section 4,
Pan/Sun/Yu, IEEE BigData 2023): each node's record holds its vector, neighbor ids, AND copies of
the neighbor vectors, so expanding a node during beam search costs exactly
one read.  (The reference Julia source keeps vectors and adjacency in two
separate mmapped files — its parity surface here is the exact final re-rank,
src/LMDiskANN.jl:465-471, and the search semantics.)
These tests pin the Spark re-expression: result parity with the two-fetch
beam path, freshness invalidation on mutation, the one-fetch-per-hop job
shape, and the stored-entrypoint seeding.
"""

import shutil

import pytest
from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark.operators.beam import (
    beam_search_batch,
    beam_search_batch_blocks,
)


@pytest.fixture()
def idx_path(tmp_path):
    p = str(tmp_path / "idx")
    yield p
    shutil.rmtree(p, ignore_errors=True)


@pytest.fixture(scope="module")
def batch(spark):
    import random

    random.seed(7)
    rows = [
        (f"key-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, "k string, vec array<float>")


@pytest.fixture(scope="module")
def queries(spark, batch):
    rows = batch.limit(6).collect()
    return spark.createDataFrame(
        [(i, list(r["vec"])) for i, r in enumerate(rows)],
        "qid long, qvec array<float>",
    )


def _built(spark, idx_path, batch):
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4)
    return idx


def test_blocks_match_two_fetch_beam(spark, idx_path, batch, queries):
    """Same seeds, same graph -> the block path and the two-fetch path must
    retrieve the same candidate id set per query (scoring from exact vector
    copies, so only summation order differs — never membership)."""
    idx = _built(spark, idx_path, batch)
    seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]

    via_blocks = beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), queries,
        ef=40, metric="euclidean", seeds=seeds, max_hops=8,
    )
    via_two_fetch = beam_search_batch(
        idx.vectors, idx.adjacency, queries,
        ef=40, metric="euclidean", entrypoints=seeds, max_hops=8,
        vectors_fetch=idx._fetcher("vectors"),
        adjacency_fetch=idx._fetcher("adjacency"),
    )
    rows_a = via_blocks.collect()
    rows_b = via_two_fetch.collect()
    a = {(r["qid"], r["id"]) for r in rows_a}
    b = {(r["qid"], r["id"]) for r in rows_b}
    # both walks expand the same frontier from the same seeds; tiny dist
    # ties at the ef boundary may swap an id, so require near-identity
    assert len(a & b) >= 0.9 * max(len(a), len(b))

    # and the per-query TOP-3 (what search_batch actually returns) must
    # agree EXACTLY — truncate each side by (dist, id) before comparing
    def top3(rows):
        per = {}
        for r in rows:
            per.setdefault(r["qid"], []).append((r["dist"], r["id"]))
        return {
            q: [i for _, i in sorted(v)[:3]] for q, v in per.items()
        }

    assert top3(rows_a) == top3(rows_b)


def test_search_batch_routes_through_blocks_and_finds_self(spark, idx_path, batch, queries):
    idx = _built(spark, idx_path, batch)
    assert idx._blocks_fresh()
    res = idx.search_batch(queries, topk=1, mode="beam", ef=40,
                           n_entrypoints=4, max_hops=8).collect()
    by_qid = {r["qid"]: r for r in res}
    for i in range(6):
        assert by_qid[i]["key"] == f"key-{i}"
        assert by_qid[i]["dist"] == pytest.approx(0.0, abs=1e-5)


def test_one_fetch_per_hop_and_bounded_scan(spark, idx_path, batch, queries):
    """The block path's whole point: hops == block fetch rounds, and the
    number of blocks fetched stays far below n * hops (the pruned point-
    lookup contract)."""
    idx = _built(spark, idx_path, batch)
    seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]
    stats = {}
    beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), queries,
        ef=20, metric="euclidean", seeds=seeds, max_hops=6, stats=stats,
    ).collect()
    assert stats["hops"] >= 2
    n = batch.count()
    assert stats["blocks_fetched"] <= n, "fetched more blocks than nodes exist"
    # every fetch is pruned: total rows fetched across ALL hops stays below
    # (queries x frontier cap x hops), never O(n * hops)
    assert stats["blocks_fetched"] < 6 * (20 // 4 + 1) * 6


def test_mutation_invalidates_blocks_and_beam_falls_back(spark, idx_path, batch, queries):
    idx = _built(spark, idx_path, batch)
    assert idx._blocks_fresh()
    extra = spark.createDataFrame(
        [("key-new", [0.05 * j for j in range(8)])], "k string, vec array<float>"
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k")
    assert not idx._blocks_fresh(), "insert must invalidate the block layout"
    # beam still answers (two-fetch fallback) and finds the new point
    q = spark.createDataFrame(
        [(0, [0.05 * j for j in range(8)])], "qid long, qvec array<float>"
    )
    res = idx.search_batch(q, topk=1, mode="beam", ef=40, n_entrypoints=4,
                           max_hops=8).collect()
    assert res[0]["key"] == "key-new"
    # rebuild re-freshens
    idx.build_beam_blocks(n_entrypoints=4)
    assert idx._blocks_fresh()


def test_blocks_rows_are_self_contained(spark, idx_path, batch):
    """Each block row must carry aligned neighbors/nbr_vecs arrays whose
    copies equal the neighbors' own stored vectors (the self-containment
    invariant the one-read-per-expansion contract rests on)."""
    idx = _built(spark, idx_path, batch)
    blocks = idx.catalog.read("beam_blocks", idx.meta, merge_key="id")
    bad_align = blocks.filter(F.size("neighbors") != F.size("nbr_vecs")).count()
    assert bad_align == 0
    # spot-check copies against the flat vectors table via an explode-join
    ex = blocks.select("id", F.posexplode("neighbors").alias("pos", "nbr"),
                       "nbr_vecs")
    ex = ex.select("id", "nbr", F.col("nbr_vecs")[F.col("pos")].alias("copy"))
    joined = ex.join(
        idx.vectors.select(F.col("id").alias("nbr"), F.col("vec").alias("own")),
        "nbr",
    )
    mismatches = joined.filter(F.col("copy") != F.col("own")).count()
    assert mismatches == 0


def test_pq_blocks_recall_and_exact_rerank(spark, idx_path, batch, queries):
    """compress='pq' (the paper's actual block format): traversal orders by
    ADC lookups, the final fetch re-ranks exact — returned distances must be
    TRUE euclidean (match the exact scan bit-for-bit on the same ids) and
    self-queries must still come back first."""
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    assert idx.meta["beam_blocks"]["compress"] == "pq"
    assert idx._blocks_fresh()

    res = idx.search_batch(queries, topk=3, mode="beam", ef=40,
                           n_entrypoints=4, max_hops=8)
    rows = res.collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    emb = {int(r["id"]): r for r in idx.vectors.collect()}
    qrows = {r["qid"]: r["qvec"] for r in queries.collect()}
    import math

    for qid, rs in by_qid.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert rs[0]["key"] == f"key-{qid}", "self-match must rank first"
        assert rs[0]["dist"] == pytest.approx(0.0, abs=1e-5)
        # every returned dist is the TRUE euclidean distance, not ADC
        for r in rs:
            v, q = emb[r["id"]]["vec"], qrows[qid]
            true_d = math.sqrt(sum((a - b) ** 2 for a, b in zip(v, q)))
            assert r["dist"] == pytest.approx(true_d, rel=1e-9, abs=1e-9)


def test_pq_blocks_cosine_via_normalization(spark, idx_path, batch, queries):
    """Cosine indexes BUILD the PQ block layout (round 9): payloads are
    L2-normalized at build time — for unit vectors cosine_dist =
    ||a - b||^2 / 2, so the sqeuclidean ADC decomposition is exact — the
    layout carries normalized=True, search routes through it, returned
    distances are true cosine (exact re-rank), and recall holds the
    reference's 0.70 bar (test/runtests.jl:454; the reference's own surface
    is half cosine, test/runtests.jl:31-67)."""
    from lmdiskann_jl_spark.operators.topk import batch_topk, recall_at_k

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6, metric="cosine")
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    assert idx.meta["beam_blocks"]["normalized"] is True
    assert idx._blocks_usable()
    approx = idx.search_batch(queries, topk=5, mode="beam", ef=40,
                              n_entrypoints=4, max_hops=8)
    exact = batch_topk(queries, idx.vectors, k=5, metric="cosine").select("qid", "id")
    assert recall_at_k(approx.select("qid", "id"), exact, k=5) >= 0.70
    # returned distances are TRUE cosine (exact re-rank), not ADC scores:
    # each query is its own vector, so its self-hit must score ~0
    self_hits = {r["qid"]: r["dist"] for r in approx.filter(F.col("rank") == 1).collect()}
    assert all(d == pytest.approx(0.0, abs=1e-9) for d in self_hits.values())


def test_pq_blocks_cosine_maintained_insert_keeps_normalization(spark, idx_path, batch, queries):
    """maintain_blocks on a cosine PQ layout must encode the DELTA payloads
    with the same normalization the build used — a raw-encoded delta would
    silently mis-rank every neighbor copy the insert touched."""
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6, metric="cosine")
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    import random

    random.seed(23)
    extra = spark.createDataFrame(
        [(f"x-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(6)],
        "k string, vec array<float>",
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
    assert idx._blocks_fresh() and idx.meta["beam_blocks"]["normalized"] is True
    # a new node must be findable through the maintained blocks with a
    # true-cosine 0 self-distance
    qv = [float(x) for x in extra.collect()[0]["vec"]]
    res = idx.search(qv, topk=1, mode="beam").collect()
    assert res and res[0]["key"] == "x-0" and res[0]["dist"] == pytest.approx(0.0, abs=1e-9)


def test_pq_blocks_recall_meets_reference_bar(spark, idx_path, batch, queries):
    """ADC ordering + exact re-rank must hold recall@k >= 0.70 (the
    reference's bar) against the exact scan on the fixture."""
    from lmdiskann_jl_spark.operators.topk import batch_topk, recall_at_k

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    approx = idx.search_batch(queries, topk=5, mode="beam", ef=40,
                              n_entrypoints=4, max_hops=8).select("qid", "id")
    vecs = idx.vectors
    exact = batch_topk(queries, vecs, k=5, metric="euclidean").select("qid", "id")
    assert recall_at_k(approx, exact, k=5) >= 0.70


@pytest.mark.slow
def test_single_query_search_routes_through_blocks(spark, idx_path, batch):
    """idx.search(mode='beam') on a blocks-fresh index runs as a 1-row batch
    through the one-fetch path — same facade contract (key/id/dist, self
    first), raw and pq layouts both."""
    for compress in (None, "pq"):
        shutil.rmtree(idx_path, ignore_errors=True)
        idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
        idx.insert_batch(batch, vec_col="vec", key_col="k")
        kw = {"pq_m": 4, "pq_k": 16} if compress else {}
        idx.build_beam_blocks(n_entrypoints=4, compress=compress, **kw)
        q = [float(x) for x in batch.collect()[3]["vec"]]
        top = idx.search(q, topk=2, mode="beam", ef=40, n_entrypoints=4).collect()
        assert top[0]["key"] == "key-3", f"compress={compress}"
        assert top[0]["dist"] == pytest.approx(0.0, abs=1e-5)


@pytest.mark.slow
def test_vacuum_prunes_superseded_layout_dirs(spark, idx_path, batch):
    """Rebuilding blocks / IVF (both catalog tables since round 12) leaves
    superseded O(corpus) copies; vacuum must remove them while keeping the
    live ones."""
    import os

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4)
    idx.build_ivf(n_cells=4)

    def layout_dirs():
        return (
            os.path.join(
                idx_path, "beam_blocks", f"v={idx.meta['versions']['beam_blocks']}"
            ),
            os.path.join(
                idx_path, "ivf_cells", f"v={idx.meta['versions']['ivf_cells']}"
            ),
        )

    first_blocks, first_ivf = layout_dirs()
    # mutate -> stale -> rebuild writes NEW versions
    extra = spark.createDataFrame(
        [("key-x", [0.01 * j for j in range(8)])], "k string, vec array<float>"
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4)
    idx.build_ivf(n_cells=4)
    second_blocks, second_ivf = layout_dirs()
    assert first_blocks != second_blocks and first_ivf != second_ivf
    assert all(os.path.isdir(d) for d in (first_blocks, second_blocks, first_ivf, second_ivf))
    # keep=0: nothing but the current commit is retained, so the
    # superseded layout snapshots (referenced only by pre-rebuild commits)
    # must die while the live ones survive
    idx.vacuum(keep=0, min_age_seconds=0)
    assert not os.path.isdir(first_blocks), "superseded blocks snapshot must be pruned"
    assert not os.path.isdir(first_ivf), "superseded IVF snapshot must be pruned"
    assert os.path.isdir(second_blocks) and os.path.isdir(second_ivf)
    # the live layouts still search
    q = [float(x) for x in batch.collect()[1]["vec"]]
    assert idx.search(q, topk=1, mode="beam", ef=40, n_entrypoints=4).collect()[0]["key"] == "key-1"
    assert idx.search(q, topk=1, mode="ivf", nprobe=4).collect()[0]["key"] == "key-1"


def test_maintained_insert_keeps_blocks_fresh(spark, idx_path, batch):
    """insert_batch(maintain_blocks=True) appends the touched block rows as
    a merge-on-read segment: the layout stays FRESH (no fallback), the new
    point is reachable through the one-fetch path, and back-linked existing
    blocks resolve latest-wins."""
    idx = _built(spark, idx_path, batch)  # raw blocks
    assert idx._blocks_fresh()
    extra = spark.createDataFrame(
        [("key-new", [0.05 * j for j in range(8)])], "k string, vec array<float>"
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
    assert idx._blocks_fresh(), "maintained insert must keep the layout fresh"
    assert idx.meta["beam_blocks"]["n_appended"] == 1
    q = spark.createDataFrame(
        [(0, [0.05 * j for j in range(8)])], "qid long, qvec array<float>"
    )
    res = idx.search_batch(q, topk=1, mode="beam", ef=40, n_entrypoints=4,
                           max_hops=8).collect()
    assert res[0]["key"] == "key-new"
    # self-containment holds across the merged read: copies == own vectors
    blocks = idx.catalog.read("beam_blocks", idx.meta, merge_key="id")
    ex = blocks.select("id", F.posexplode("neighbors").alias("pos", "nbr"), "nbr_vecs")
    ex = ex.select("nbr", F.col("nbr_vecs")[F.col("pos")].alias("copy"))
    joined = ex.join(
        idx.vectors.select(F.col("id").alias("nbr"), F.col("vec").alias("own")), "nbr"
    )
    assert joined.filter(F.col("copy") != F.col("own")).count() == 0


@pytest.mark.slow
def test_maintained_insert_pq_blocks(spark, idx_path, batch):
    """PQ layout maintenance encodes new copies with the FROZEN codebook
    (IVF's frozen-centroid contract) — layout stays fresh and searchable."""
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    extra = spark.createDataFrame(
        [("key-new", [0.05 * j for j in range(8)])], "k string, vec array<float>"
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
    assert idx._blocks_fresh()
    q = spark.createDataFrame(
        [(0, [0.05 * j for j in range(8)])], "qid long, qvec array<float>"
    )
    res = idx.search_batch(q, topk=1, mode="beam", ef=40, n_entrypoints=4,
                           max_hops=8).collect()
    assert res[0]["key"] == "key-new"
    assert res[0]["dist"] == pytest.approx(0.0, abs=1e-5)  # exact re-rank


def test_pq_blocks_codebook_drift_autorefit(spark, idx_path, batch):
    """PQ codebook drift policy stress (round 10, the IVF policy's twin):
    maintained inserts from a cluster the codebook never saw accumulate
    under frozen encoding only up to BLOCKS_PQ_REFIT_DRIFT of the
    build-time corpus; the batch that crosses it triggers a full layout
    rebuild with a REFIT codebook inside insert_batch — layout fresh after
    every wave, drift bounded, counter and built_n resnapshot, and search
    still lands exact hits in the new region through the refit layout."""
    import random

    from lmdiskann_jl_spark.index import BLOCKS_PQ_REFIT_DRIFT

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")  # 80 rows ~N(0,1)
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    assert idx.meta["beam_blocks"]["built_n"] == 80
    old_codebook = idx.meta["beam_blocks"]["codebook"]

    random.seed(31)
    # wave 0: 12 <= 0.25*80 -> frozen-codebook delta append; wave 1:
    # 24 > 20 -> inline refit (built_n resnapshots to 104, counter resets)
    for wave in range(2):
        rows = [
            (f"n{wave}-{i}", [6.0 + random.gauss(0, 0.2) for _ in range(8)])
            for i in range(12)
        ]
        idx.insert_batch(
            spark.createDataFrame(rows, "k string, vec array<float>"),
            vec_col="vec", key_col="k", maintain_blocks=True,
        )
        assert idx._blocks_fresh(), "maintained PQ layout must never go silently stale"
        drift = idx.stats()["blocks_pq_drift"]
        assert drift is not None and drift <= BLOCKS_PQ_REFIT_DRIFT

    bb = idx.meta["beam_blocks"]
    assert bb.get("n_refits") == 1
    assert bb["built_n"] == 104
    assert bb.get("n_appended", 0) == 0
    assert bb["codebook"] != old_codebook, "refit must re-train the codebook"
    # the rebuild replaces the MOR segments with one fresh snapshot
    assert idx.stats()["blocks_segments"] == 1
    # the refit is MATERIAL, not just different bytes: the new codebook
    # reconstructs a new-region vector at a fraction of the frozen
    # codebook's quantization error (the frozen one never saw the cluster,
    # so its ADC distances there were routing noise)
    import numpy as np

    def recon_err(cb, v):
        cb = np.asarray(cb, dtype=float)  # [m][k][width]
        m, _, w = cb.shape
        return sum(
            (((cb[s] - v[s * w:(s + 1) * w]) ** 2).sum(axis=1)).min()
            for s in range(m)
        )

    probe = np.array([6.0 + 0.1 * j for j in range(8)])
    assert recon_err(bb["codebook"], probe) < 0.25 * recon_err(old_codebook, probe)


def test_pq_blocks_deletes_count_toward_codebook_drift(spark, idx_path, batch):
    """Churn stress for the PQ twin (round 11): maintained DELETES move the
    codebook drift meter too — delete 40% of an 80-row PQ layout and
    stats() crosses the refit budget loudly with zero inserts; the next
    small maintained insert (10%) then fires the layout refit."""
    from lmdiskann_jl_spark.index import BLOCKS_PQ_REFIT_DRIFT

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")  # 80 rows
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    assert idx.meta["beam_blocks"]["built_n"] == 80

    dead = [int(r["id"]) for r in idx.vectors.select("id").collect()][:32]  # 40%
    idx.delete_batch(ids=dead, maintain_blocks=True)
    assert idx._blocks_fresh()
    drift = idx.stats()["blocks_pq_drift"]
    assert drift == pytest.approx(32 / 80), "deletes must count toward pq drift"
    assert drift > BLOCKS_PQ_REFIT_DRIFT

    import random

    random.seed(37)
    rows = [(f"c-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(8)]
    idx.insert_batch(
        spark.createDataFrame(rows, "k string, vec array<float>"),
        vec_col="vec", key_col="k", maintain_blocks=True,
    )
    bb = idx.meta["beam_blocks"]
    assert bb.get("n_refits") == 1, "churn past the budget must refit the layout"
    assert bb["built_n"] == 56  # 80 - 32 + 8: codebook fit on the live corpus
    assert bb.get("n_deleted", 0) == 0 and bb.get("n_appended", 0) == 0
    assert idx.stats()["blocks_pq_drift"] == 0.0
    # refit layout still searches: a live vector finds itself exactly.
    # Probe a stored ENTRYPOINT's vector — reachable by construction
    # (it seeds the beam at dist 0).  limit(1) picked an arbitrary row
    # and, on some task schedules, one the 40%-delete repair had left
    # outside the 4 seeds' reach in this tiny 56-node graph — a
    # reachability coin-flip, not the refit property this asserts
    # (graph connectivity under churn has its own gates:
    # test_beam_recall_survives_churn and the alpha-prune suite).
    ep = int(bb["entrypoints"][0])
    probe = idx.vectors.filter(F.col("id") == ep).collect()[0]
    got = idx.search([float(x) for x in probe["vec"]], topk=3, mode="beam")
    assert int(got.collect()[0]["id"]) == ep


def test_refresh_entrypoints_reaches_ingested_island(spark, idx_path, batch):
    """Opt-in navigability aid for the documented nearest-k-pruning caveat:
    a far-away maintained batch islands (its nodes interlink, inbound
    back-links get distance-pruned), so beam search from the ORIGINAL seeds
    can never route into it — but insert_batch(refresh_entrypoints=True)
    re-picks the spread seeds over old∪new ids, a seed lands inside the
    island (hash-uniform over 43% of the id space — deterministic for this
    fixture), and beam retrieves exact island hits."""
    import random

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")  # ids 0..79 ~N(0,1)
    idx.build_beam_blocks(n_entrypoints=6)
    old_seeds = list(idx.meta["beam_blocks"]["entrypoints"])

    random.seed(47)
    island = spark.createDataFrame(
        [(f"isl-{i}", [6.0 + random.gauss(0, 0.2) for _ in range(8)])
         for i in range(60)],  # ids 80..139
        "k string, vec array<float>",
    )
    idx.insert_batch(
        island, vec_col="vec", key_col="k",
        maintain_blocks=True, refresh_entrypoints=True,
    )
    assert idx._blocks_fresh()
    seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]
    assert len(seeds) == 6  # configured count preserved
    assert any(s >= 80 for s in seeds), (
        f"refresh must spread seeds over new ids too (got {seeds}, "
        f"old {old_seeds})"
    )
    res = idx.search([6.0] * 8, topk=3, mode="beam", ef=40,
                     n_entrypoints=6).collect()
    assert res[0]["key"].startswith("isl-")
    assert res[0]["dist"] < 1.0  # inside the island, not the old corpus


def test_alpha_prune_keeps_ingested_island_connected(spark, idx_path, batch):
    """The STRUCTURAL islanding fix (round 11): with
    create_index(alpha=1.2), the maintained insert's re-prune runs
    alpha-diversified — near-cluster neighbors dominate each other and
    collapse, so a touched old node KEEPS its back-link to the far batch —
    and beam search reaches the island from the ORIGINAL seeds, without
    refresh_entrypoints.  Same fixture as
    test_refresh_entrypoints_reaches_ingested_island, stronger claim: the
    graph itself stays connected, not just enterable."""
    import random

    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6, alpha=1.2)
    idx.insert_batch(batch, vec_col="vec", key_col="k")  # ids 0..79 ~N(0,1)
    idx.build_beam_blocks(n_entrypoints=6)
    old_seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]

    random.seed(47)
    island = spark.createDataFrame(
        [(f"isl-{i}", [6.0 + random.gauss(0, 0.2) for _ in range(8)])
         for i in range(60)],  # ids 80..139
        "k string, vec array<float>",
    )
    idx.insert_batch(island, vec_col="vec", key_col="k", maintain_blocks=True)
    assert idx._blocks_fresh()
    # seeds are untouched (no refresh): all pre-island ids
    seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]
    assert seeds == old_seeds and all(s < 80 for s in seeds)
    res = idx.search([6.0] * 8, topk=3, mode="beam", ef=40,
                     n_entrypoints=6).collect()
    assert res[0]["key"].startswith("isl-"), (
        f"alpha-pruned graph must route into the island from old seeds; "
        f"got {[(r['key'], round(r['dist'], 2)) for r in res]}"
    )
    assert res[0]["dist"] < 1.0
    # the prune invariant holds on the alpha path too
    deg = idx.adjacency.select(F.size("neighbors").alias("d")).agg(
        F.max("d").alias("m")
    ).collect()[0]["m"]
    assert deg <= 6


def test_query_chunking_matches_single_sweep(spark, idx_path, batch, queries):
    """query_chunk bounds driver memory by splitting the batch into
    sequential sweeps — results must equal the single-sweep run exactly
    (each sweep is independent: per-query state never crosses queries)."""
    idx = _built(spark, idx_path, batch)
    seeds = [int(e) for e in idx.meta["beam_blocks"]["entrypoints"]]
    one = beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), queries,
        ef=40, metric="euclidean", seeds=seeds, max_hops=8,
    )
    chunked = beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), queries,
        ef=40, metric="euclidean", seeds=seeds, max_hops=8, query_chunk=2,
    )
    a = {(r["qid"], r["id"], round(r["dist"], 9)) for r in one.collect()}
    b = {(r["qid"], r["id"], round(r["dist"], 9)) for r in chunked.collect()}
    assert a == b


def test_maintained_delete_repairs_blocks(spark, idx_path, batch):
    """delete_batch(maintain_blocks=True): the layout stays fresh, deleted
    keys never surface through the one-fetch path (repaired survivor blocks
    drop the dead neighbor; dead rows become unreachable), and stored
    entrypoints are re-picked if a seed died."""
    idx = _built(spark, idx_path, batch)
    assert idx._blocks_fresh()
    target = batch.collect()[0]  # key-0
    # delete one stored entrypoint too, forcing seed repair
    seed0 = int(idx.meta["beam_blocks"]["entrypoints"][0])
    dead_keys = ["key-0", idx.get_key_from_id(seed0)]
    idx.delete_batch(keys=sorted(set(dead_keys)), maintain_blocks=True)
    assert idx._blocks_fresh(), "maintained delete must keep the layout fresh"
    dead_ids = {0, seed0}
    assert not dead_ids & {int(e) for e in idx.meta["beam_blocks"]["entrypoints"]}
    res = idx.search(list(target["vec"]), topk=10, mode="beam", ef=40,
                     n_entrypoints=4).collect()
    assert set(dead_keys) & {r["key"] for r in res} == set()
    # repaired survivor blocks no longer reference any dead id
    blocks = idx.catalog.read("beam_blocks", idx.meta, merge_key="id")
    live = idx.vectors.select("id")
    refs = blocks.join(live, "id", "left_semi").select(F.explode("neighbors").alias("nbr"))
    dead_refs = refs.join(live.withColumnRenamed("id", "nbr"), "nbr", "left_anti").count()
    assert dead_refs == 0


@pytest.mark.slow
def test_compact_collapses_block_segments_and_drops_dead_rows(spark, idx_path, batch):
    """compact(): maintained-mutation segments collapse to one snapshot and
    dead nodes' unreachable block rows disappear — the layout stays fresh
    and searchable afterwards."""
    idx = _built(spark, idx_path, batch)
    extra = spark.createDataFrame(
        [("key-new", [0.05 * j for j in range(8)])], "k string, vec array<float>"
    )
    idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
    idx.delete_batch(keys=["key-2"], maintain_blocks=True)
    dead_id_rows = idx.catalog.read("beam_blocks", idx.meta, merge_key="id").join(
        idx.vectors.select("id"), "id", "left_anti"
    )
    assert dead_id_rows.count() >= 1, "pre-compact: dead row is expected garbage"
    idx.compact()
    blocks = idx.catalog.read("beam_blocks", idx.meta, merge_key="id")
    assert blocks.join(idx.vectors.select("id"), "id", "left_anti").count() == 0
    assert blocks.count() == idx.vectors.count()
    # compaction rewrites bytes, not data: a fresh layout STAYS fresh
    assert idx._blocks_fresh(), "compact must not stale a fresh layout"
    q = [float(x) for x in batch.collect()[1]["vec"]]
    assert idx.search(q, topk=1, mode="beam", ef=40, n_entrypoints=4).collect()[0]["key"] == "key-1"


@pytest.mark.slow
def test_filtered_beam_search_on_blocks(spark, idx_path, batch):
    """where= on mode='beam' with a fresh block layout: filter-during-search
    — every returned key matches the predicate, the best allowed neighbor is
    found even when it ranks below the routing beam's view, and raw + pq
    layouts behave alike."""
    import math

    for compress in (None, "pq"):
        shutil.rmtree(idx_path, ignore_errors=True)
        idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
        idx.insert_batch(batch, vec_col="vec", key_col="k")
        kw = {"pq_m": 4, "pq_k": 16} if compress else {}
        idx.build_beam_blocks(n_entrypoints=4, compress=compress, **kw)

        rows = batch.collect()
        q = [float(x) for x in rows[3]["vec"]]
        # allow only keys ending in an even digit — a ~50% filter
        res = idx.search(q, topk=5, mode="beam", ef=40, n_entrypoints=4,
                         where="key rlike '[02468]$'").collect()
        assert res, f"compress={compress}: filtered beam returned nothing"
        assert all(int(r["key"].rsplit("-", 1)[1]) % 2 == 0 for r in res)
        # exact filtered baseline: top-1 among allowed must match
        vecs = {r["k"]: [float(x) for x in r["vec"]] for r in rows}
        allowed = {k: v for k, v in vecs.items() if int(k.rsplit("-", 1)[1]) % 2 == 0}
        exact_top = min(
            allowed, key=lambda k: math.dist(allowed[k], q)
        )
        assert res[0]["key"] == exact_top, f"compress={compress}"


def test_filtered_beam_requires_blocks(spark, idx_path, batch):
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    q = [float(x) for x in batch.collect()[0]["vec"]]
    with pytest.raises(ValueError, match="block layout|over-fetch"):
        idx.search(q, topk=3, mode="beam", where="key rlike '0$'")
    # exact pre-filter path still works regardless
    res = idx.search(q, topk=3, mode="exact", where="key rlike '0$'").collect()
    assert all(r["key"].endswith("0") for r in res)


def test_filtered_search_batch(spark, idx_path, batch, queries):
    """search_batch(where=...): exact pre-filter and blocks filter-during-
    search return only matching keys; per-qid top-1 agrees between the two
    paths on the fixture."""
    idx = _built(spark, idx_path, batch)
    pred = "key rlike '[02468]$'"
    exact = idx.search_batch(queries, topk=3, mode="exact", where=pred).collect()
    beam = idx.search_batch(queries, topk=3, mode="beam", ef=40,
                            n_entrypoints=4, max_hops=8, where=pred).collect()
    for rows in (exact, beam):
        assert rows
        assert all(int(r["key"].rsplit("-", 1)[1]) % 2 == 0 for r in rows)
    top_exact = {r["qid"]: r["key"] for r in exact if r["rank"] == 1}
    top_beam = {r["qid"]: r["key"] for r in beam if r["rank"] == 1}
    agree = sum(top_exact[q] == top_beam.get(q) for q in top_exact)
    assert agree >= 0.8 * len(top_exact)
    # ivf + where raises
    idx.build_ivf(n_cells=4)
    with pytest.raises(ValueError, match="filtered search_batch"):
        idx.search_batch(queries, topk=3, mode="ivf", where=pred)


def test_allowed_dataframe_membership_bounded_driver_state(spark, idx_path, batch, queries):
    """A LARGE allowed set (forced via driver_set_limit=0 on this fixture)
    must (a) return the same results as the driver-side set form, (b) never
    materialize the full set driver-side — the membership cache holds only
    ids the sweep actually scored — and (c) batch membership into at most
    one lookup job per hop, prefetched inside the hop's own block-fetch
    job.  A fixture-sized set passed as a raw DataFrame takes the
    driver-set fast path instead (see the dedicated test below)."""
    from lmdiskann_jl_spark.operators.beam import _AllowedMembership

    idx = _built(spark, idx_path, batch)
    seeds = idx._blocks_seeds(4)
    all_ids = [int(r["id"]) for r in idx.vectors.select("id").collect()]
    even = sorted(i for i in all_ids if i % 2 == 0)
    allowed_df = spark.createDataFrame([(i,) for i in even], "id long")

    MAX_HOPS = 8
    stats: dict = {}
    m = _AllowedMembership(allowed_df, driver_set_limit=0)
    try:
        via_df = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
            max_hops=MAX_HOPS, allowed=m, stats=stats,
        )
        via_set = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
            max_hops=MAX_HOPS, allowed=set(even),
        )
        as_rows = lambda df: {(r["qid"], r["id"], round(r["dist"], 9)) for r in df.collect()}
        assert as_rows(via_df) == as_rows(via_set)
        assert all(i % 2 == 0 for _, i, _ in as_rows(via_df))
        # membership is PREFETCHED inside each hop's block-fetch job (one
        # column-pruned union branch over the same pruned scan), so filtered
        # traversal adds ZERO standalone lookup jobs — resolve()'s fallback
        # job never fires on the block path
        assert stats.get("allowed_lookups", 0) == 0
        assert stats.get("allowed_prefetches", 0) >= 1
        # bounded state: the membership cache holds only ids the sweep saw
        assert 0 < len(m._known) < len(all_ids) + len(even)
        assert m._set is None  # executor path: no full-set collect
    finally:
        m.close()

    # bounded state via resolve(): caches only the ids it was asked about
    m = _AllowedMembership(allowed_df, driver_set_limit=0)
    got = m.resolve(all_ids[:10])
    assert got == {i for i in all_ids[:10] if i % 2 == 0}
    assert len(m._known) == 10  # NOT len(even): no full-set collect
    # the id projection is snapshotted once at construction (per-hop
    # lookups must not re-execute the allowed frame's lineage) and
    # released by close() — the batch entry point calls it in finally
    assert m._cached.storageLevel.useMemory or m._cached.storageLevel.useDisk
    m.close()
    assert not (m._cached.storageLevel.useMemory or m._cached.storageLevel.useDisk)


def test_allowed_small_set_resolves_driver_side(spark, idx_path, batch, queries):
    """A small allowed set (<= _DRIVER_SET_LIMIT) passed as a raw DataFrame
    is collected once into a driver-side frozenset: results are identical
    to the executor-side path, and the traversal runs ZERO membership jobs
    — no prefetch branch, no fallback lookup (optimization round 14)."""
    from lmdiskann_jl_spark.operators.beam import _AllowedMembership

    idx = _built(spark, idx_path, batch)
    seeds = idx._blocks_seeds(4)
    all_ids = [int(r["id"]) for r in idx.vectors.select("id").collect()]
    even = sorted(i for i in all_ids if i % 2 == 0)
    allowed_df = spark.createDataFrame([(i,) for i in even], "id long")

    stats: dict = {}
    via_df = beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
        max_hops=8, allowed=allowed_df, stats=stats,
    )
    forced = _AllowedMembership(allowed_df, driver_set_limit=0)
    try:
        via_exec = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
            max_hops=8, allowed=forced,
        )
        as_rows = lambda df: {(r["qid"], r["id"], round(r["dist"], 9)) for r in df.collect()}
        assert as_rows(via_df) == as_rows(via_exec)
        assert all(i % 2 == 0 for _, i, _ in as_rows(via_df))
    finally:
        forced.close()
    assert stats.get("allowed_lookups", 0) == 0
    assert stats.get("allowed_prefetches", 0) == 0
    # resolve() on the driver set is a pure local lookup: no cache growth
    m = _AllowedMembership(allowed_df)
    assert m._set is not None
    assert m.resolve(all_ids[:10]) == {i for i in all_ids[:10] if i % 2 == 0}
    assert len(m._known) == 0
    m.close()


def test_allowed_membership_stale_seed_stays_zero_lookup_jobs(
    spark, idx_path, batch, queries
):
    """A requested id with NO block row — a stored entrypoint whose node
    was deleted, a stale neighbor pointer — enters the hop-0 candidate set
    but used to miss the membership probe (built only from RETURNED block
    rows), so resolve()'s standalone fallback job fired exactly for those
    ids.  The probe now unions the requested id list itself, so the
    zero-extra-jobs invariant holds on indexes with stale seeds too.
    Forced onto the executor path (driver_set_limit=0) — fixture-sized
    sets otherwise resolve driver-side and never probe at all."""
    from lmdiskann_jl_spark.operators.beam import _AllowedMembership

    idx = _built(spark, idx_path, batch)
    seeds = idx._blocks_seeds(4)
    all_ids = [int(r["id"]) for r in idx.vectors.select("id").collect()]
    even = sorted(i for i in all_ids if i % 2 == 0)
    allowed_df = spark.createDataFrame([(i,) for i in even], "id long")
    dead_seed = max(all_ids) + 1_000  # never inserted: no block row exists

    stats: dict = {}
    m = _AllowedMembership(allowed_df, driver_set_limit=0)
    try:
        out = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40,
            seeds=list(seeds) + [dead_seed], max_hops=8,
            allowed=m, stats=stats,
        )
        rows = out.collect()
    finally:
        m.close()
    assert rows and all(r["id"] % 2 == 0 for r in rows)
    assert dead_seed not in {r["id"] for r in rows}
    # the dead seed's membership was learned inside the hop's fetch job —
    # the standalone lookup fallback never fires
    assert stats.get("allowed_lookups", 0) == 0
    assert stats.get("allowed_prefetches", 0) >= 1


def test_prebuilt_allowed_membership_amortizes_snapshot(
    spark, idx_path, batch, queries
):
    """Passing a pre-built _AllowedMembership amortizes the allowed-set
    snapshot across repeated searches with the same filter: the entry
    point must NOT close it (the caller owns the lifecycle), and the
    second search reuses the cached projection + learned memberships."""
    from lmdiskann_jl_spark.operators.beam import _AllowedMembership

    idx = _built(spark, idx_path, batch)
    seeds = idx._blocks_seeds(4)
    all_ids = [int(r["id"]) for r in idx.vectors.select("id").collect()]
    even = sorted(i for i in all_ids if i % 2 == 0)
    allowed_df = spark.createDataFrame([(i,) for i in even], "id long")

    m = _AllowedMembership(allowed_df, driver_set_limit=0)
    try:
        first = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
            max_hops=8, allowed=m,
        ).collect()
        # entry point did not close the caller-owned snapshot
        assert m._cached.storageLevel.useMemory or m._cached.storageLevel.useDisk
        known_after_first = len(m._known)
        assert known_after_first > 0
        second = beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=40, seeds=seeds,
            max_hops=8, allowed=m,
        ).collect()
        key = lambda rows: {(r["qid"], r["id"], round(r["dist"], 9)) for r in rows}
        assert key(first) == key(second)
        assert all(i % 2 == 0 for _, i, _ in key(first))
        # same traversal, memberships already learned: cache only grew by
        # ids the second sweep saw that the first didn't (none here)
        assert len(m._known) == known_after_first
    finally:
        m.close()
    assert not (m._cached.storageLevel.useMemory or m._cached.storageLevel.useDisk)


def test_blocks_empty_seeds_raise(spark, idx_path, batch, queries):
    """Queries with an empty seed list is a mis-seeded call, not 'no
    matches' — it must raise, never return an empty frame."""
    idx = _built(spark, idx_path, batch)
    with pytest.raises(ValueError, match="seeds is empty"):
        beam_search_batch_blocks(
            spark, idx._blocks_fetcher(), queries, ef=10, seeds=[]
        )
    # an empty QUERY set still short-circuits to an empty result
    empty_q = queries.limit(0)
    out = beam_search_batch_blocks(
        spark, idx._blocks_fetcher(), empty_q, ef=10, seeds=[]
    )
    assert out.count() == 0


@pytest.mark.slow
def test_blocks_autocompact_bounds_segment_count(spark, idx_path, batch):
    """Maintained inserts append MOR segments; once
    BLOCKS_AUTOCOMPACT_SEGMENTS accumulate the maintenance path collapses
    them inline — segment count stays bounded, the layout stays FRESH
    across the compaction, and search still finds every maintained row."""
    from lmdiskann_jl_spark.index import BLOCKS_AUTOCOMPACT_SEGMENTS

    idx = _built(spark, idx_path, batch)
    import random

    random.seed(31)
    max_live_segments = 0
    n_batches = BLOCKS_AUTOCOMPACT_SEGMENTS + 2
    for i in range(n_batches):
        extra = spark.createDataFrame(
            [(f"seg-{i}-{j}", [random.gauss(0, 1) for _ in range(8)]) for j in range(3)],
            "k string, vec array<float>",
        )
        idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
        assert idx._blocks_fresh(), f"layout went stale at batch {i}"
        segs = idx.meta.get("segments", {}).get("beam_blocks") or [1]
        max_live_segments = max(max_live_segments, len(segs))
    assert idx.meta["beam_blocks"].get("n_autocompactions", 0) >= 1
    assert max_live_segments <= BLOCKS_AUTOCOMPACT_SEGMENTS
    # post-compaction searches still resolve a maintained row exactly
    last_key = f"seg-{n_batches - 1}-0"
    qv = [float(x) for x in idx.vectors.join(
        idx.key_map.filter(F.col("key") == last_key), "id"
    ).collect()[0]["vec"]]
    res = idx.search(qv, topk=1, mode="beam").collect()
    assert res[0]["key"] == last_key and res[0]["dist"] == pytest.approx(0.0, abs=1e-6)


def test_adc_cosine_identity_numpy():
    """The normalized-cosine ADC math, pinned without Spark: (a) the cosine
    table is the sqeuclidean table of the normalized query (lookup halves
    it), and (b) for unit-vector payloads whose PQ reconstruction is exact,
    ADC cosine equals TRUE cosine distance — the identity
    cosine_dist(a, b) = ||a - b||^2 / 2 for unit vectors."""
    import numpy as np

    from lmdiskann_jl_spark.operators.beam import _adc_lookup, _adc_table

    rng = np.random.default_rng(5)
    m, k, w = 4, 16, 2  # dim 8, 16 codewords per subspace
    n = 16

    # (a) halved-sqeuclidean equivalence on an arbitrary codebook
    cb = rng.normal(size=(m, k, w))
    q = rng.normal(size=m * w)
    codes = rng.integers(0, k, size=(n, m))
    d_cos = _adc_lookup("cosine", _adc_table("cosine", cb, q, normalized=True), codes)
    qn = q / np.linalg.norm(q)
    d_sq = _adc_lookup("sqeuclidean", _adc_table("sqeuclidean", cb, qn), codes)
    assert np.allclose(d_cos, d_sq / 2.0)

    # (b) exact-reconstruction case: each unit vector is its own codeword
    vecs = rng.normal(size=(n, m * w))
    units = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cb_exact = np.stack([units[:, s * w : (s + 1) * w] for s in range(m)])  # (m, n, w)
    codes_exact = np.tile(np.arange(n)[:, None], (1, m))
    d_adc = _adc_lookup(
        "cosine", _adc_table("cosine", cb_exact, q, normalized=True), codes_exact
    )
    truth = 1.0 - units @ (q / np.linalg.norm(q))
    assert np.allclose(d_adc, truth)

    # (c) cosine ADC without a normalized layout is a contract violation
    with pytest.raises(ValueError, match="normalized"):
        _adc_table("cosine", cb, q, normalized=False)


def test_blocks_autocompact_fires_fast(spark, idx_path, batch, monkeypatch):
    """Default-suite twin of the full autocompaction lifecycle test (which
    is slow-marked): with the threshold lowered to 3, two maintained
    batches are enough to drive the inline collapse — segment list back to
    one snapshot, layout still FRESH, counter bumped."""
    import lmdiskann_jl_spark.index as idx_mod

    monkeypatch.setattr(idx_mod, "BLOCKS_AUTOCOMPACT_SEGMENTS", 3)
    idx = _built(spark, idx_path, batch)
    import random

    random.seed(41)
    for i in range(2):
        extra = spark.createDataFrame(
            [(f"fast-{i}", [random.gauss(0, 1) for _ in range(8)])],
            "k string, vec array<float>",
        )
        idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_blocks=True)
    assert idx.meta["beam_blocks"].get("n_autocompactions", 0) >= 1
    assert len(idx.meta.get("segments", {}).get("beam_blocks") or [1]) < 3
    assert idx._blocks_fresh()
    qv = [float(x) for x in idx.vectors.join(
        idx.key_map.filter(F.col("key") == "fast-1"), "id"
    ).collect()[0]["vec"]]
    assert idx.search(qv, topk=1, mode="beam").collect()[0]["key"] == "fast-1"


@pytest.mark.slow
def test_pq_blocks_cosine_maintained_delete_repairs(spark, idx_path, batch):
    """Maintained DELETE on a cosine PQ layout: survivor blocks re-encode
    with the frozen codebook over NORMALIZED payloads (the delete path
    shares _block_rows with the insert path), dead ids leave every
    neighbor list, and post-delete beam search returns true-cosine
    distances with the deleted key gone."""
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=6, metric="cosine")
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=4, compress="pq", pq_m=4, pq_k=16)
    victim = "key-3"
    vq = [float(x) for x in idx.vectors.join(
        idx.key_map.filter(F.col("key") == victim), "id"
    ).collect()[0]["vec"]]
    idx.delete_batch(keys=[victim], maintain_blocks=True)
    assert idx._blocks_fresh() and idx.meta["beam_blocks"]["normalized"] is True
    res = idx.search(vq, topk=5, mode="beam", ef=40, n_entrypoints=4).collect()
    assert res and victim not in {r["key"] for r in res}
    # victim's key resolves to nothing, and no live block references it
    assert idx.get_id_from_key(victim) is None
    blocks = idx.catalog.read("beam_blocks", idx.meta, merge_key="id")
    live_ids = {int(r["id"]) for r in idx.vectors.select("id").collect()}
    ex = blocks.join(idx.vectors.select("id"), "id", "left_semi").select(
        F.explode("neighbors").alias("nbr")
    )
    assert {int(r["nbr"]) for r in ex.distinct().collect()} <= live_ids


def test_oversubscribed_entrypoints_warn_not_silent(spark, idx_path, batch, queries):
    """Round 14 (advisor): requesting more seeds than the layout stores
    must SURFACE the divergence — a per-decade probe-width rule would
    otherwise measure a weaker probe than it claims.  The search still
    runs with every stored seed."""
    import warnings

    idx = _built(spark, idx_path, batch)  # stores 4 spread seeds
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        seeds = idx._blocks_seeds(16)
        assert len(seeds) <= 4
        assert any(
            "n_entrypoints=16" in str(x.message) and "stores only" in str(x.message)
            for x in w
        ), "oversubscription must warn"
    # within-budget requests stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        idx._blocks_seeds(4)
        assert not [x for x in w if issubclass(x.category, RuntimeWarning)]
