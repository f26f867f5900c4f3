"""Exact top-k search vs a numpy brute-force oracle.

Mirrors the reference's oracle style: ``brute_force_topk``
(test/runtests.jl:403-408) computes norm(q - v) per vector, sorts, takes k.
Exact mode must match it EXACTLY (recall 1.0 >= the 0.70 bar of :454)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.topk import batch_topk, exact_topk, recall_at_k


@pytest.fixture(scope="module")
def emb(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["id"] for r in rows])
    mat = np.array([r["vec"] for r in rows], dtype=np.float64)
    return ids, mat


def np_topk(ids, mat, q, k, metric="euclidean"):
    q = np.asarray(q, dtype=np.float64)
    if metric == "euclidean":
        d = np.linalg.norm(mat - q, axis=1)
    elif metric == "cosine":
        d = 1 - (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    else:
        raise ValueError(metric)
    order = np.lexsort((ids, d))
    return [int(ids[i]) for i in order[:k]]


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_exact_topk_matches_numpy(emb, emb_np, metric):
    ids, mat = emb_np
    q = mat[7]
    got = [r["id"] for r in exact_topk(emb, q, k=10, metric=metric).collect()]
    assert got == np_topk(ids, mat, q, 10, metric)


def test_exact_topk_k_larger_than_n(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [1.0, 1.0])], "id long, vec array<double>")
    got = exact_topk(df, [0.0, 0.0], k=10).collect()
    assert [r["id"] for r in got] == [1, 2]  # min(topk, n), :473


def test_exact_topk_empty(spark):
    df = spark.createDataFrame([], "id long, vec array<double>")
    assert exact_topk(df, [0.0], k=5).collect() == []  # empty-index guard, :459-461


def test_batch_topk_matches_per_query(emb, emb_np, spark):
    ids, mat = emb_np
    qids = [3, 11, 42]
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[list(ids).index(i)]]) for i in qids],
        "qid long, qvec array<double>",
    )
    res = batch_topk(queries, emb, k=5, metric="euclidean").collect()
    by_q = {}
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        by_q.setdefault(r["qid"], []).append(r["id"])
    for qid in qids:
        expect = np_topk(ids, mat, mat[list(ids).index(qid)], 5)
        assert by_q[qid] == expect


def test_recall_at_k_perfect_and_partial(spark):
    exact = spark.createDataFrame([(1, 10), (1, 11), (2, 20), (2, 21)], "qid long, id long")
    assert recall_at_k(exact, exact, k=2) == pytest.approx(1.0)
    approx = spark.createDataFrame([(1, 10), (1, 99), (2, 98), (2, 97)], "qid long, id long")
    assert recall_at_k(approx, exact, k=2) == pytest.approx(0.25)


def test_knn_classify_majority_and_leave_one_out(spark):
    from lmdiskann_jl_spark.operators.topk import knn_classify

    # two well-separated labeled clusters
    rows = [(i, 0, [0.0 + i * 0.01, 0.0]) for i in range(5)]
    rows += [(10 + i, 1, [10.0 + i * 0.01, 10.0]) for i in range(5)]
    vecs = spark.createDataFrame(rows, "id long, label long, vec array<float>")

    # external query near cluster 1 (qid outside the id space)
    q = spark.createDataFrame([(100, [10.0, 10.0])], "qid long, qvec array<float>")
    r = knn_classify(q, vecs, k=3, exclude_self=False).collect()
    assert len(r) == 1 and r[0]["pred_label"] == 1 and r[0]["votes"] == 3

    # leave-one-out: corpus point 0 must be classified by its PEERS (its own
    # row excluded), still label 0
    q0 = spark.createDataFrame([(0, [0.0, 0.0])], "qid long, qvec array<float>")
    r0 = knn_classify(q0, vecs, k=3, exclude_self=True).collect()
    assert r0[0]["pred_label"] == 0 and r0[0]["votes"] == 3
