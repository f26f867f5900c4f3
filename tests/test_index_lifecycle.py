"""Index lifecycle integration — mirrors the reference's "Minimal" and
"Integration" suites (test/runtests.jl:216-397): create -> insert -> search ->
retrieve -> delete -> verify-gone, plus key-map semantics (:108-209)."""

import shutil

import pytest
from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark import kvmap


@pytest.fixture()
def idx_path(tmp_path):
    p = str(tmp_path / "idx")
    yield p
    shutil.rmtree(p, ignore_errors=True)


@pytest.fixture(scope="module")
def small_batch(spark):
    # 10 vectors, dim 5 — the reference's integration fixture shape (:294-397)
    import random

    random.seed(1)
    rows = [(f"key-{i}", [random.gauss(0, 1) for _ in range(5)]) for i in range(10)]
    return spark.createDataFrame(rows, "k string, vec array<float>")


def test_create_insert_search_roundtrip(spark, idx_path, small_batch):
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    assert idx.meta["num_points"] == 10
    assert idx.count_entries() == 10

    # every inserted vector is found by searching for itself (:330-339)
    rows = small_batch.collect()
    for r in rows[:4]:
        top = idx.search(list(r["vec"]), topk=1).collect()[0]
        assert top["key"] == r["k"]
        assert top["dist"] == pytest.approx(0.0, abs=1e-5)

    # exact embedding round-trip (:341-358)
    v = idx.get_embedding_from_key("key-3")
    expect = [x for x in rows[3]["vec"]]
    assert v == pytest.approx(expect, abs=1e-6)


def test_delete_then_excluded(spark, idx_path, small_batch):
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    target = small_batch.collect()[0]
    idx.delete_batch(keys=["key-0"])
    assert idx.meta["num_points"] == 9
    # post-delete search exclusion (:362-393)
    res = idx.search(list(target["vec"]), topk=9).collect()
    assert "key-0" not in {r["key"] for r in res}
    with pytest.raises(KeyError):
        idx.get_embedding_from_key("key-0")
    # adjacency no longer references the deleted id
    dead_id = 0
    assert idx.adjacency.filter(F.array_contains("neighbors", dead_id)).count() == 0


def test_load_persistence(spark, idx_path, small_batch):
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    idx2 = pkg.load_index(spark, idx_path)
    assert idx2.meta["num_points"] == 10
    assert sorted(idx2.list_all_keys()) == sorted(f"key-{i}" for i in range(10))


def test_auto_key_generation(spark, idx_path, small_batch):
    # auto-key = string(1-based id) when no key supplied (:553-556)
    idx = pkg.create_index(spark, idx_path, dim=5)
    idx.insert_batch(small_batch.select("vec"), vec_col="vec")
    keys = set(idx.list_all_keys())
    assert keys == {str(i) for i in range(1, 11)}


def test_kvmap_ops(spark):
    km = spark.createDataFrame([("a", 1), ("b", 2)], kvmap.KEY_MAP_SCHEMA)
    assert kvmap.get_id_from_key(km, "a") == 1
    assert kvmap.get_id_from_key(km, "zz") is None  # missing -> None (:68-74)
    assert kvmap.get_key_from_id(km, 2) == "b"
    assert kvmap.get_key_from_id(km, 99) is None
    assert kvmap.count_entries(km) == 2
    assert kvmap.list_all_keys(km) == ["a", "b"]
    km2 = kvmap.insert_keys(km, spark.createDataFrame([("a", 7), ("c", 3)], kvmap.KEY_MAP_SCHEMA))
    got = {r["key"]: r["id"] for r in km2.collect()}
    assert got == {"a": 7, "b": 2, "c": 3}  # upsert overwrites like LevelDB put
    assert kvmap.count_entries(kvmap.delete_by_keys(km2, ["a", "c"])) == 1
    assert kvmap.count_entries(kvmap.clear(km2)) == 0


def test_incremental_insert_two_batches(spark, idx_path, small_batch):
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    rows = small_batch.collect()
    first = spark.createDataFrame(rows[:6], "k string, vec array<float>")
    second = spark.createDataFrame(rows[6:], "k string, vec array<float>")
    idx.insert_batch(first, vec_col="vec", key_col="k")
    idx.insert_batch(second, vec_col="vec", key_col="k")
    assert idx.meta["num_points"] == 10
    assert idx.vectors.count() == 10
    # ids stay unique and dense
    ids = sorted(r["id"] for r in idx.vectors.select("id").collect())
    assert ids == list(range(10))
    # new points are searchable
    top = idx.search(list(rows[8]["vec"]), topk=1).collect()[0]
    assert top["key"] == rows[8]["k"]
