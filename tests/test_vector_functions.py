"""Distance expressions vs numpy ground truth (reference: the metric layer,
src/LMDiskANN.jl:62 + Distances.jl semantics exercised in test/runtests.jl)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import (
    cosine_distance,
    dot_product,
    euclidean_distance,
    l2_norm,
    manhattan_distance,
    query_vector_lit,
    resolve_metric,
    sq_euclidean_distance,
)

random.seed(1)  # the reference seeds Random.seed!(1), test/runtests.jl:8
DIM = 16
N = 50


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = [
        (
            i,
            [random.gauss(0, 1) for _ in range(DIM)],
            [random.gauss(0, 1) for _ in range(DIM)],
        )
        for i in range(N)
    ]
    return spark.createDataFrame(rows, "i long, a array<double>, b array<double>"), rows


def _check(pairs_df, expr_fn, np_fn, tol=1e-9):
    df, rows = pairs_df
    got = {
        r["i"]: r["d"]
        for r in df.select("i", expr_fn(F.col("a"), F.col("b")).alias("d")).collect()
    }
    for i, a, b in rows:
        expect = np_fn(np.array(a), np.array(b))
        assert math.isclose(got[i], expect, rel_tol=tol, abs_tol=tol), (i, got[i], expect)


def test_euclidean(pairs_df):
    _check(pairs_df, euclidean_distance, lambda a, b: float(np.linalg.norm(a - b)))


def test_sq_euclidean(pairs_df):
    _check(pairs_df, sq_euclidean_distance, lambda a, b: float(((a - b) ** 2).sum()))


def test_manhattan(pairs_df):
    _check(pairs_df, manhattan_distance, lambda a, b: float(np.abs(a - b).sum()))


def test_dot(pairs_df):
    _check(pairs_df, dot_product, lambda a, b: float(a @ b))


def test_cosine(pairs_df):
    _check(
        pairs_df,
        cosine_distance,
        lambda a, b: float(1 - (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))),
    )


def test_l2_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    assert df.select(l2_norm(F.col("a")).alias("n")).collect()[0]["n"] == pytest.approx(5.0)


def test_resolve_metric_names():
    assert resolve_metric("euclidean") is euclidean_distance
    assert resolve_metric("COSINE") is cosine_distance
    with pytest.raises(ValueError):
        resolve_metric("nope")


def test_resolve_metric_callable_passthrough():
    fn = lambda a, b: F.lit(0.0)  # noqa: E731 — user-supplied metric surface
    assert resolve_metric(fn) is fn


def test_float32_input_coerced(spark):
    # reference converts inputs to the index eltype on insert/query (:462,546)
    df = spark.createDataFrame([([1.0, 2.0], [1.0, 2.0])], "a array<float>, b array<float>")
    d = df.select(euclidean_distance(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert d == pytest.approx(0.0)


def test_query_vector_lit(spark):
    df = spark.range(1)
    out = df.select(query_vector_lit([1.5, 2.5]).alias("q")).collect()[0]["q"]
    assert out == [1.5, 2.5]


def test_reduce_dim_preserves_distance_structure(spark, embeddings):
    """Random projection to 8 dims: deterministic across calls, and
    pairwise distances in the projected space correlate with the original
    ones (the Johnson-Lindenstrauss property, loosely checked — 8 dims is
    lossy but structure must survive)."""
    import numpy as np

    from lmdiskann_jl_spark.plans.queries import q_reduce_dim

    a = q_reduce_dim(spark, "/root/testdata/sf0.001").orderBy("vec_id").limit(50).collect()
    b = q_reduce_dim(spark, "/root/testdata/sf0.001").orderBy("vec_id").limit(50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # seeded planes

    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter("vec_id < 50").collect()
    }
    proj = {r["vec_id"]: np.array([r[f"c{j}"] for j in range(8)]) for r in a}
    ids = sorted(set(orig) & set(proj))
    # gaussian projections are unbiased norm estimators:
    # E[(p·x)^2] = ||x||^2 per plane, so mean_j c_j^2 ≈ ||x||^2 — averaged
    # over vectors the ratio concentrates near 1 (per-vector variance is
    # large at 8 planes; correlation-style checks are NOT stable here)
    ratios = [
        (proj[i] @ proj[i]) / 8.0 / (orig[i] @ orig[i]) for i in ids
    ]
    mean_ratio = float(np.mean(ratios))
    assert 0.7 < mean_ratio < 1.3, f"norm-preservation ratio {mean_ratio:.3f}"
