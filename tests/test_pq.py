"""Product quantization (operators/pq.py): encode shape, ADC plan, recall."""

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.pq import (
    DEFAULT_K,
    DEFAULT_M,
    build_pq,
    pq_adc_topk,
    pq_encode,
    pq_search,
)
from lmdiskann_jl_spark.operators.topk import exact_topk

DIM = 64


@pytest.fixture(scope="module")
def emb(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def pq(emb):
    cb = build_pq(emb, dim=DIM).cache()
    codes = pq_encode(emb, cb, dim=DIM).cache()
    return cb, codes


def test_pq_encode_shape_and_range(emb, pq):
    cb, codes = pq
    assert cb.count() == DEFAULT_M * DEFAULT_K
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["codes"]) == DEFAULT_M
        assert all(0 <= c < DEFAULT_K for c in r["codes"])


def test_pq_adc_is_scan_stage_topk(emb, pq, tmp_path_factory):
    """The compressed scan must be shuffle-free up to the final top-k: the
    lookup table is a literal, so over a stored codes table the plan is
    Scan -> Project -> TakeOrderedAndProject — no join, no exchange."""
    cb, codes = pq
    path = str(tmp_path_factory.mktemp("pq") / "codes")
    codes.write.parquet(path)
    stored = codes.sparkSession.read.parquet(path)
    q = [float(x) for x in emb.filter(F.col("id") == 0).collect()[0]["vec"]]
    res = pq_adc_topk(stored, cb, q, k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_pq_rerank_recall_meets_reference_bar(emb, pq):
    cb, codes = pq
    hits = 0.0
    qids = [1, 50, 150, 250, 350]
    for qid in qids:
        q = [float(x) for x in emb.filter(F.col("id") == qid).collect()[0]["vec"]]
        exact_ids = {r["id"] for r in exact_topk(emb, q, k=10, metric="euclidean").collect()}
        got = {r["id"] for r in pq_search(codes, cb, emb, q, k=10, rerank=100).collect()}
        hits += len(exact_ids & got) / 10.0
    assert hits / len(qids) >= 0.70  # the reference's own recall bar


def test_ivfpq_recall_meets_reference_bar(emb, pq, spark):
    """The composed IVF+PQ path (cell pruning + compressed scoring + exact
    rerank) must clear the same recall bar as each piece alone."""
    from lmdiskann_jl_spark.operators.ivf import build_ivf
    from lmdiskann_jl_spark.operators.pq import ivfpq_search

    cb, codes = pq
    cell_centroids, assigned = build_ivf(emb, n_cells=16)
    assigned_codes = assigned.select("id", "cell").join(codes, "id").cache()
    hits = 0.0
    qids = [1, 50, 150, 250, 350]
    for qid in qids:
        q = [float(x) for x in emb.filter(F.col("id") == qid).collect()[0]["vec"]]
        exact_ids = {r["id"] for r in exact_topk(emb, q, k=10, metric="euclidean").collect()}
        got = {
            r["id"]
            for r in ivfpq_search(
                assigned_codes, cell_centroids, cb, emb, q, k=10, nprobe=6, rerank=100
            ).collect()
        }
        hits += len(exact_ids & got) / 10.0
    assert hits / len(qids) >= 0.70
