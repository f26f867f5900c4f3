"""MMR diversification (operators/topk.mmr_rerank): matches an independent
greedy reference, actually diversifies clustered candidates, and enforces
its bounded-candidate contract."""

import math

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.topk import (
    MMR_MAX_CANDIDATES,
    mmr_rerank,
    mmr_rerank_distributed,
)


def _reference_mmr(rows, k, lam):
    """Independent greedy: rows = [(id, rel, vec)]."""

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    out, selected = [], []
    remaining = list(range(len(rows)))
    for _ in range(min(k, len(rows))):
        def score(i):
            pen = max((cos(rows[i][2], rows[j][2]) for j in selected), default=0.0)
            return lam * rows[i][1] - (0 if not selected else (1 - lam) * pen)

        pick = min(remaining, key=lambda i: (-score(i), rows[i][0]))
        out.append(rows[pick][0])
        selected.append(pick)
        remaining.remove(pick)
    return out


CANDS = [
    # two tight clusters + one outlier; rel favors cluster A
    (0, 0.95, [1.0, 0.0, 0.0, 0.01]),
    (1, 0.94, [1.0, 0.0, 0.01, 0.0]),
    (2, 0.93, [0.99, 0.01, 0.0, 0.0]),
    (3, 0.80, [0.0, 1.0, 0.0, 0.02]),
    (4, 0.79, [0.0, 0.99, 0.01, 0.0]),
    (5, 0.40, [0.0, 0.0, 0.0, 1.0]),
]


def test_mmr_matches_reference(spark):
    df = spark.createDataFrame(CANDS, "id long, rel double, vec array<double>")
    got = [r["id"] for r in mmr_rerank(df, k=4, lam=0.5).orderBy("rank").collect()]
    assert got == _reference_mmr(CANDS, k=4, lam=0.5)


def test_mmr_diversifies_vs_plain_topk(spark):
    df = spark.createDataFrame(CANDS, "id long, rel double, vec array<double>")
    got = [r["id"] for r in mmr_rerank(df, k=3, lam=0.5).collect()]
    # plain top-rel = the three near-duplicates of cluster A; MMR keeps the
    # best of each cluster instead
    assert got[0] == 0  # first pick is always max rel
    assert set(got) == {0, 3, 5}


def test_mmr_lambda_one_is_plain_topk(spark):
    df = spark.createDataFrame(CANDS, "id long, rel double, vec array<double>")
    got = [r["id"] for r in mmr_rerank(df, k=3, lam=1.0).collect()]
    assert got == [0, 1, 2]


def test_mmr_negative_similarity_boosts(spark):
    """An anti-correlated candidate's penalty term is NEGATIVE (a boost);
    a zero-floored penalty would misrank it.  Signed vectors, verified
    against the independent reference."""
    cands = CANDS + [
        (6, 0.50, [-1.0, 0.0, 0.0, 0.0]),   # anti-correlated with cluster A
        (7, 0.45, [0.0, -1.0, 0.05, 0.0]),  # anti-correlated with cluster B
    ]
    df = spark.createDataFrame(cands, "id long, rel double, vec array<double>")
    for lam in (0.3, 0.5, 0.7):
        got = [r["id"] for r in mmr_rerank(df, k=5, lam=lam).orderBy("rank").collect()]
        assert got == _reference_mmr(cands, k=5, lam=lam), f"lam={lam}"


def test_mmr_preserves_id_type(spark):
    df = spark.createDataFrame(
        [(str(i), r, v) for i, r, v in CANDS], "id string, rel double, vec array<double>"
    )
    got = mmr_rerank(df, k=3, lam=0.5)
    assert dict(got.dtypes)["id"] == "string"
    assert got.count() == 3


def test_mmr_two_stage_matches_exact_multi_partition(spark):
    """The two-stage form (per-partition greedy prune -> driver greedy over
    pooled winners) must reproduce the exact greedy on a multi-partition
    candidate set small enough to also run exactly."""
    import random

    rng = random.Random(7)
    cands = [
        (i, rng.random(), [rng.gauss(0, 1) for _ in range(8)]) for i in range(400)
    ]
    df = spark.createDataFrame(
        cands, "id long, rel double, vec array<double>"
    ).repartition(8)
    for lam in (0.4, 0.7):
        exact = [
            r["id"] for r in mmr_rerank(df, k=10, lam=lam).orderBy("rank").collect()
        ]
        two = [
            r["id"]
            for r in mmr_rerank_distributed(df, k=10, lam=lam)
            .orderBy("rank")
            .collect()
        ]
        assert two == exact, f"lam={lam}"


def test_mmr_past_cap_auto_dispatches(spark):
    """Past MMR_MAX_CANDIDATES the call no longer raises: it WARNS (the
    silent-approximation guard), runs the two-stage form, and still
    returns k ranked rows with the global max-rel candidate first;
    exact=True restores the old hard-failure contract."""
    n = MMR_MAX_CANDIDATES + 500
    big = spark.range(n).select(
        F.col("id"),
        (F.col("id") / F.lit(float(n))).alias("rel"),
        F.array(F.lit(1.0), (F.col("id") % 17).cast("double")).alias("vec"),
    )
    with pytest.warns(UserWarning, match="two-stage"):
        res = mmr_rerank(big, k=5).orderBy("rank").collect()
    assert [r["rank"] for r in res] == [1, 2, 3, 4, 5]
    assert res[0]["id"] == n - 1  # first pick is always max rel
    with pytest.raises(ValueError, match="exact=True"):
        mmr_rerank(big, k=5, exact=True)


def test_mmr_oversized_k_contract(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(1.0).alias("rel"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("vec"),
    )
    with pytest.raises(ValueError, match="not a rerank"):
        mmr_rerank_distributed(df, k=MMR_MAX_CANDIDATES)


def test_mmr_distributed_tolerates_empty_partitions(spark):
    """A frame with more partitions than rows must not crash the
    per-partition kernel (pd.concat of an empty batch iterator)."""
    df = spark.range(20).select(
        F.col("id"),
        (F.col("id") / 20.0).alias("rel"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("vec"),
    ).repartition(64)
    out = mmr_rerank_distributed(df, k=5).collect()
    assert len(out) == 5
    assert max(r["id"] for r in out) == 19  # max-rel row survives


def test_mmr_strict_fold_matches_numpy_kernel(spark):
    """strict_fold (left-to-right folds, the a_mmr_rerank oracle's
    arithmetic) must pick the same id sequence as the production numpy
    kernel; scores may differ by summation-order ulps only."""
    import random

    random.seed(7)
    cands = [
        (i, round(random.uniform(-1, 1), 4), [random.gauss(0, 1) for _ in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(cands, "id long, rel double, vec array<double>")
    base = mmr_rerank(df, k=10, lam=0.7).orderBy("rank").collect()
    strict = mmr_rerank(df, k=10, lam=0.7, strict_fold=True).orderBy("rank").collect()
    assert [r["id"] for r in base] == [r["id"] for r in strict]
    # numpy path rounds scores to 6 decimals; strict returns raw
    for b, s in zip(base, strict):
        assert abs(b["mmr_score"] - s["mmr_score"]) <= 5e-7
