"""Element-type parameterization (reference test style 4,
test/runtests.jl:74-98,552-638) + the physical strategy selector."""

import random

import pytest
from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark.plans.strategy import SearchContext, choose_search_strategy

random.seed(1)


@pytest.mark.parametrize(
    "eltype,sql_type,tol",
    [
        ("float32", "float", 1e-5),
        ("float64", "double", 1e-12),
        # float16: the reference's third tested eltype (runtests.jl:610-638);
        # emulated as float32 storage of exact half roundings, so the
        # round-trip tolerance is half precision (:631-634 uses atol=1e-2)
        ("float16", "float", 1e-2),
    ],
)
def test_index_eltype_roundtrip(spark, tmp_path, eltype, sql_type, tol):
    """Create with eltype, insert float64 python values, retrieve within
    dtype tolerance (the reference's cross-type conversion, :462,546)."""
    rows = [(f"k{i}", [random.gauss(0, 1) for _ in range(6)]) for i in range(8)]
    batch = spark.createDataFrame(rows, "k string, vec array<double>")
    idx = pkg.create_index(spark, str(tmp_path / eltype), dim=6, maxdegree=4, eltype=eltype)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    # stored vector column has the requested element type
    el = dict(idx.vectors.dtypes)["vec"]
    assert el == f"array<{sql_type}>"
    got = idx.get_embedding_from_key("k3")
    assert got == pytest.approx(rows[3][1], abs=tol)
    if eltype == "float16":
        # stored values are EXACT half-precision numbers, not merely close
        import numpy as np

        assert all(
            float(np.float16(x)) == x for x in got
        ), "float16 storage must hold exact half roundings"
    # search still exact on the coerced values
    top = idx.search(rows[5][1], topk=1).collect()[0]
    assert top["key"] == "k5"


def test_unsupported_eltype_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="eltype"):
        pkg.create_index(spark, str(tmp_path / "bad"), dim=4, eltype="int8")


def test_strategy_selector():
    # small table -> exact regardless of indexes
    assert choose_search_strategy(SearchContext(n_vectors=10_000, has_ivf=True)) == "exact"
    # big table, IVF available -> ivf
    assert choose_search_strategy(SearchContext(n_vectors=10**9, has_ivf=True)) == "ivf"
    # big table, only graph, few queries -> beam
    assert choose_search_strategy(SearchContext(n_vectors=10**9, has_graph=True)) == "beam"
    # big table, no index, huge batch -> lsh bucketed join
    assert choose_search_strategy(SearchContext(n_vectors=10**9, n_queries=10_000)) == "lsh"
    # batch size pushes past the exact budget
    assert choose_search_strategy(SearchContext(n_vectors=10**6, n_queries=1)) == "exact"
    assert choose_search_strategy(SearchContext(n_vectors=10**6, n_queries=200)) == "lsh"


def test_auto_prefers_beam_for_big_batches_when_blocks_exist():
    # without blocks: big batch on a huge graph-only index -> lsh
    assert (
        choose_search_strategy(
            SearchContext(n_vectors=10**9, n_queries=10_000, has_graph=True)
        )
        == "lsh"
    )
    # WITH a fresh block layout the hop ladder amortizes across the batch
    assert (
        choose_search_strategy(
            SearchContext(
                n_vectors=10**9, n_queries=10_000, has_graph=True, has_blocks=True
            )
        )
        == "beam"
    )
