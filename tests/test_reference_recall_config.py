"""The reference's headline recall configuration, reproduced end-to-end.

BASELINE.md row 1 / test/runtests.jl:410-459: n=2000 vectors, dim=100,
30 queries, k=10, maxdegree=64, seed fixed -> avg recall@10 >= 0.70 vs the
brute-force oracle.  Here the graph is the batch-built kNN graph and search
is the batched beam operator — the engine's equivalents of the reference's
sequential insert + greedy search.
"""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.beam import beam_search_batch
from lmdiskann_jl_spark.operators.graph import build_adjacency
from lmdiskann_jl_spark.operators.topk import batch_topk, recall_at_k

N, DIM, N_QUERIES, K, MAXDEG = 2000, 100, 30, 10, 64


def _beam_recall(spark, vectors, metric, n_queries, k, maxdeg, ef=300, **beam_kw):
    adj = build_adjacency(vectors, maxdegree=maxdeg, metric=metric).cache()
    adj.count()
    queries = vectors.filter(F.col("id") < n_queries).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    exact = batch_topk(queries, vectors, k=k, metric=metric).select("qid", "id")
    beam_kw.setdefault("entrypoint", 0)
    cand = beam_search_batch(vectors, adj, queries, ef=ef, metric=metric, **beam_kw)
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    beam = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).select("qid", "id")
    return recall_at_k(beam, exact, k=k)


@pytest.fixture(scope="module")
def ref_vectors(spark):
    rng = random.Random(1)  # the reference seeds Random.seed!(1)
    rows = [(i, [rng.random() for _ in range(DIM)]) for i in range(N)]
    return spark.createDataFrame(rows, "id long, vec array<float>").repartition(8).cache()


@pytest.mark.slow
def test_reference_headline_recall(spark, ref_vectors):
    """BASELINE.md row 1: n=2000, dim=100, 30 queries, k=10, Euclidean."""
    r = _beam_recall(spark, ref_vectors, "euclidean", N_QUERIES, K, MAXDEG)
    assert r >= 0.70, f"avg recall@10 {r:.3f} below the reference's bar (runtests.jl:454)"


def test_reference_cosine_recall(spark):
    """BASELINE.md row 4: n=500, dim=32, 20 queries, k=10, CosineDist
    (test/runtests.jl:37-67)."""
    rng = random.Random(1)
    rows = [(i, [rng.random() for _ in range(32)]) for i in range(500)]
    vecs = spark.createDataFrame(rows, "id long, vec array<float>").repartition(8).cache()
    r = _beam_recall(spark, vecs, "cosine", 20, 10, MAXDEG)
    assert r >= 0.70, f"avg cosine recall@10 {r:.3f} below the reference's bar (runtests.jl:61)"


@pytest.mark.parametrize(
    "n,dim,n_queries,k",
    [
        (3000, 100, 10, 20),  # runtests.jl:540-541 scenario 1
        (10_000, 10, 10, 20),  # runtests.jl:544-545 scenario 2
    ],
)
@pytest.mark.slow
def test_reference_scenario_recall(spark, n, dim, n_queries, k):
    """The reference's two 'Larger Tests' scenarios
    (test/runtests.jl:490-546): n random vectors, 10 queries drawn from the
    dataset, top-20 vs full brute force, avg recall >= 0.70."""
    rng = random.Random(1)
    rows = [(i, [rng.random() for _ in range(dim)]) for i in range(n)]
    vecs = spark.createDataFrame(rows, "id long, vec array<float>").repartition(16).cache()
    r = _beam_recall(spark, vecs, "euclidean", n_queries, k, MAXDEG)
    assert r >= 0.70, f"scenario dim={dim} n={n}: recall@{k} {r:.3f} < 0.70 (runtests.jl:532)"


@pytest.mark.parametrize(
    "n,dim,n_queries,k",
    [
        (3000, 100, 10, 20),  # runtests.jl:540-541 scenario 1
        (10_000, 10, 10, 20),  # runtests.jl:544-545 scenario 2
    ],
)
@pytest.mark.slow
def test_scenario_recall_multi_entrypoint_fewer_hops(spark, n, dim, n_queries, k):
    """Multi-entrypoint seeding (SURVEY §4's natural Spark generalization of
    the reference's single stored entrypoint): 8 spread seeds must hold the
    0.70 bar at HALF the hop budget (6 vs the default 12) on both reference
    scenarios — the seeds land the walk near the query's region, so
    convergence needs fewer frontier expansions."""
    rng = random.Random(1)
    rows = [(i, [rng.random() for _ in range(dim)]) for i in range(n)]
    vecs = spark.createDataFrame(rows, "id long, vec array<float>").repartition(16).cache()
    stats = {}
    r = _beam_recall(
        spark, vecs, "euclidean", n_queries, k, MAXDEG,
        entrypoint=None, n_entrypoints=8, max_hops=6, stats=stats,
    )
    assert r >= 0.70, f"multi-seed dim={dim} n={n}: recall@{k} {r:.3f} < 0.70"
    assert 0 < stats["hops"] <= 6, f"hop budget exceeded: {stats}"
