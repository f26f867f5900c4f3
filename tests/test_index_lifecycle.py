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


def test_insert_after_delete_no_id_reuse(spark, idx_path, small_batch):
    """Freed ids must never be reassigned (next_id watermark): insert 10,
    delete 5, insert 10 more — all 20 original keys' rows stay distinct and
    the re-insert collides with nothing."""
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    first_ids = {r["id"] for r in idx.vectors.select("id").collect()}
    idx.delete_batch(keys=[f"key-{i}" for i in range(5)])
    assert idx.meta["num_points"] == 5

    batch2 = small_batch.select(
        F.concat(F.lit("new-"), F.col("k")).alias("k"), "vec"
    )
    idx.insert_batch(batch2, vec_col="vec", key_col="k")
    assert idx.meta["num_points"] == 15
    ids = [r["id"] for r in idx.vectors.select("id").collect()]
    assert len(ids) == len(set(ids)) == 15  # no collisions
    new_ids = {r["id"] for r in idx.vectors.join(
        idx.key_map.filter(F.col("key").startswith("new-")), "id", "left_semi"
    ).select("id").collect()}
    assert new_ids.isdisjoint(first_ids)  # freed ids not reused
    # every key resolves to exactly one live row
    assert idx.count_entries() == 15
    for k in ["key-7", "new-key-0"]:
        assert idx.get_embedding_from_key(k) is not None
    # deleting an already-gone id must not corrupt the count
    idx.delete_batch(keys=["key-0"])
    assert idx.meta["num_points"] == 15


def test_large_delete_batch_via_antijoin(spark, idx_path):
    """10^4-id delete set: must go through the anti-join path (no literal
    isin plan blowup) and leave exactly the survivors."""
    import random

    random.seed(7)
    n = 2000
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(n)]
    batch = spark.createDataFrame(rows, "k string, vec array<float>")
    idx = pkg.create_index(spark, idx_path, dim=4, maxdegree=4)
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    # delete 10^4 ids, most of them absent (tests the matched-only counting)
    dead = spark.range(0, 10_000).select((F.col("id") * 2).alias("id"))  # evens incl. absent
    idx.delete_batch(ids=dead)
    live = idx.vectors.select("id").collect()
    assert all(r["id"] % 2 == 1 for r in live)
    assert idx.meta["num_points"] == len(live) == n // 2
    # neighbor lists contain no deleted ids
    bad = idx.adjacency.select(F.explode("neighbors").alias("n")).filter(
        F.col("n") % 2 == 0
    ).count()
    assert bad == 0


def test_insert_keys_dedupes_within_batch(spark):
    """Duplicate keys inside ONE batch collapse last-writer-wins (max id) —
    the LevelDB put-overwrite analog; both lookups stay deterministic."""
    km = spark.createDataFrame([("a", 1), ("b", 2)], kvmap.KEY_MAP_SCHEMA)
    new = spark.createDataFrame([("c", 3), ("c", 9), ("b", 7)], kvmap.KEY_MAP_SCHEMA)
    out = kvmap.insert_keys(km, new)
    rows = {r["key"]: r["id"] for r in out.collect()}
    assert rows == {"a": 1, "b": 7, "c": 9}
    assert out.count() == 3  # one row per key, both-column uniqueness holds


def test_batch_beam_string_qids(spark, idx_path, small_batch):
    """beam_search_batch must honor non-long qid types from the caller's
    schema instead of hard-coding bigint."""
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    queries = spark.createDataFrame(
        [(r["k"], r["vec"]) for r in small_batch.collect()[:3]],
        "qid string, qvec array<float>",
    )
    res = idx.search_batch(queries, topk=2, mode="beam").collect()
    assert {r["qid"] for r in res} == {"key-0", "key-1", "key-2"}
    by_q = {}
    for r in res:
        by_q.setdefault(r["qid"], []).append(r)
    for q, rs in by_q.items():
        best = min(rs, key=lambda r: r["dist"])
        assert best["key"] == q and best["dist"] == pytest.approx(0.0, abs=1e-5)


def test_beam_hops_are_pruned_point_lookups(spark, idx_path):
    """Beam hops must fetch only frontier/neighbor rows from the bucketed
    layout: the fetch plan partition-prunes on the id bucket, and the total
    rows scored across ALL hops stays well under one full table scan (the
    pre-bucketing shape re-scanned the whole table every hop)."""
    import random

    from lmdiskann_jl_spark.operators.beam import beam_search

    random.seed(5)
    n = 400
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(n)]
    batch = spark.createDataFrame(rows, "k string, vec array<float>")
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=8)
    idx.insert_batch(batch, vec_col="vec", key_col="k")

    # the stored snapshot is bucket-partitioned and the fetch plan prunes
    raw = idx.catalog.read("vectors", idx.meta, raw=True)
    assert "_b" in raw.columns
    plan = idx._fetcher("vectors")([3, 5])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_b" in plan.split("PartitionFilters", 1)[1][:200]

    stats = {}
    res = beam_search(
        idx.vectors, idx.adjacency, rows[7][1], ef=32,
        metric="euclidean", entrypoint=int(idx.meta["entrypoint"]),
        vectors_fetch=idx._fetcher("vectors"),
        adjacency_fetch=idx._fetcher("adjacency"),
        stats=stats,
    )
    top = res.orderBy("dist").limit(1).collect()[0]
    assert top["dist"] == pytest.approx(0.0, abs=1e-5)
    assert stats["hops"] >= 2
    assert stats["rows_scored"] < 0.6 * n, (
        f"beam scored {stats['rows_scored']} rows of {n} — hops are not "
        f"point lookups"
    )


@pytest.mark.slow
def test_compact_coalesces_small_files(spark, idx_path):
    """After several incremental inserts the snapshots hold many small
    files; compact() must shrink the file count without changing contents."""
    import glob
    import random

    random.seed(13)
    idx = pkg.create_index(spark, idx_path, dim=8, maxdegree=8)
    for wave in range(3):
        rows = [
            (f"w{wave}-{i}", [random.gauss(0, 1) for _ in range(8)]) for i in range(40)
        ]
        idx.insert_batch(
            spark.createDataFrame(rows, "k string, vec array<float>"),
            vec_col="vec", key_col="k",
        )

    def n_files(name):
        return sum(
            len(glob.glob(f"{idx_path}/{name}/v={v}/**/*.parquet", recursive=True))
            for v in idx.catalog._segments(name, idx.meta)
        )

    before = {(r["id"], r["key"]) for r in idx.vectors.select("id", "key").collect()}
    files_before = n_files("vectors")
    idx.compact()
    assert n_files("vectors") < files_before
    after = {(r["id"], r["key"]) for r in idx.vectors.select("id", "key").collect()}
    assert after == before and len(after) == 120
    # bucketed layout survives compaction (point lookups still prune)
    assert "_b" in idx.catalog.read("vectors", idx.meta, raw=True).columns


@pytest.mark.slow
def test_compact_vacuum_search_equality_at_bench_scale(spark, idx_path):
    """Snapshot-GC at the sf0.1 table scale: build the index from the real
    bench embeddings in two insert waves (so every table accumulates
    stamped segments), then compact() + vacuum() must leave search results
    BIT-IDENTICAL and actually reclaim the superseded snapshot dirs — the
    one lifecycle surface previously covered only by small fixtures."""
    import glob

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    batch = emb.select(
        F.col("embedding").alias("vec"),
        F.format_string("vec-%08d", F.col("vec_id")).alias("k"),
    )
    idx = pkg.create_index(spark, idx_path, dim=64, maxdegree=8, metric="euclidean")
    idx.insert_batch(batch.filter(F.col("k") < "vec-00001000"), vec_col="vec", key_col="k")
    idx.insert_batch(batch.filter(F.col("k") >= "vec-00001000"), vec_col="vec", key_col="k")
    assert idx.meta["num_points"] == emb.count()

    queries = [list(r["embedding"]) for r in emb.filter(F.col("vec_id") % 700 == 0).collect()]
    before = [idx.search(q, topk=10).collect() for q in queries]

    def all_version_dirs():
        return set(glob.glob(f"{idx_path}/*/v=*"))

    dirs_before = all_version_dirs()
    idx.compact()
    # keep=0: reach = the current commit only, so the pre-compact segment
    # dirs are reclaimable (keep=1 would deliberately retain them — one
    # commit of time-travel reach, the commit-aware vacuum semantics)
    idx.vacuum(keep=0, min_age_seconds=0)
    dirs_after = all_version_dirs()
    # compaction wrote new versions; vacuum reclaimed the superseded ones
    assert dirs_after - dirs_before, "compact() produced no new snapshot"
    assert dirs_before - dirs_after, "vacuum() reclaimed no old snapshot"

    reloaded = pkg.load_index(spark, idx_path)
    for q, exp in zip(queries, before):
        got = reloaded.search(q, topk=10).collect()
        assert [(r["key"], round(r["dist"], 9)) for r in got] == [
            (r["key"], round(r["dist"], 9)) for r in exp
        ]


def test_stats_reports_invariants(spark, idx_path, small_batch):
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=8)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    s = idx.stats()
    assert s["num_points"] == s["graph_nodes"] == s["n_keys"]
    assert 0 < s["max_degree"] <= s["maxdegree"]
    assert s["storage_bytes"]["vectors"] > 0
    assert not s["ivf_fresh"]


@pytest.mark.slow
def test_incremental_insert_is_o_batch_append(spark, idx_path):
    """Incremental inserts must append segments, not rewrite the table: the
    first batch's files stay byte-identical on disk, the manifest grows, and
    reads/searches resolve the union (vectors) and latest-wins (adjacency)
    correctly.  Compaction collapses segments back to one."""
    import glob
    import os
    import random

    random.seed(21)

    def batch(tag, n):
        rows = [(f"{tag}-{i}", [random.gauss(0, 1) for _ in range(6)]) for i in range(n)]
        return spark.createDataFrame(rows, "k string, vec array<float>")

    idx = pkg.create_index(spark, idx_path, dim=6, maxdegree=6)
    idx.insert_batch(batch("a", 50), vec_col="vec", key_col="k")
    v1 = idx.meta["versions"]["vectors"]
    seg1_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{idx_path}/vectors/v={v1}/**/*.parquet", recursive=True)
    }
    assert seg1_files

    idx.insert_batch(batch("b", 30), vec_col="vec", key_col="k")
    # manifest grew; the first segment was not touched
    assert len(idx.meta["segments"]["vectors"]) == 2
    assert len(idx.meta["segments"]["adjacency"]) == 2
    for p, mtime in seg1_files.items():
        assert os.path.getmtime(p) == mtime, f"segment rewritten: {p}"

    # union/MOR reads are correct
    assert idx.vectors.count() == 80
    assert idx.adjacency.count() == 80  # latest-wins: no duplicate ids
    assert idx.adjacency.select("id").distinct().count() == 80
    s = idx.stats()
    assert s["max_degree"] <= 6

    # search still finds the new batch exactly
    q = [float(x) for x in idx.get_embedding_from_key("b-3")]
    top = idx.search(q, topk=1).collect()[0]
    assert top["key"] == "b-3" and top["dist"] == pytest.approx(0.0, abs=1e-5)
    top_beam = idx.search(q, topk=1, mode="beam").collect()[0]
    assert top_beam["dist"] == pytest.approx(0.0, abs=1e-5)

    # compaction collapses the manifest, contents unchanged
    before = {r["id"] for r in idx.vectors.select("id").collect()}
    idx.compact()
    assert "vectors" not in idx.meta.get("segments", {})
    assert {r["id"] for r in idx.vectors.select("id").collect()} == before
    assert idx.adjacency.count() == 80


def test_tables_autocompact_bounds_segment_count(spark, idx_path, monkeypatch):
    """Base-table segment bound (round 10, the blocks bound's twin): every
    incremental insert appends one segment to vectors/adjacency/key_map;
    past TABLES_AUTOCOMPACT_SEGMENTS the violating insert collapses the
    table inline.  With the threshold lowered to 3: segment lists stay
    bounded across 5 batches, the collapse preserves every row and the
    latest-wins keymap semantics, search equals the pre-collapse answers,
    and a FRESH block layout survives the rewrite (compaction moves bytes,
    never data)."""
    import random

    import lmdiskann_jl_spark.index as idx_mod

    monkeypatch.setattr(idx_mod, "TABLES_AUTOCOMPACT_SEGMENTS", 3)
    random.seed(17)

    def batch(tag, n):
        rows = [(f"{tag}-{i}", [random.gauss(0, 1) for _ in range(6)]) for i in range(n)]
        return spark.createDataFrame(rows, "k string, vec array<float>")

    idx = pkg.create_index(spark, idx_path, dim=6, maxdegree=6)
    idx.insert_batch(batch("a", 40), vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=2)
    for w in range(4):
        idx.insert_batch(
            batch(f"b{w}", 5), vec_col="vec", key_col="k", maintain_blocks=True
        )
        segs = idx.stats()["table_segments"]
        assert all(v <= 3 for v in segs.values()), f"unbounded segments: {segs}"
        assert idx._blocks_fresh(), "table collapse must not stale the block layout"
    assert idx.meta.get("table_autocompactions", 0) >= 1
    # nothing lost across the inline collapses
    assert idx.vectors.count() == 60
    assert idx.key_map.count() == 60
    q = [float(x) for x in idx.get_embedding_from_key("b2-3")]
    assert idx.search(q, topk=1).collect()[0]["key"] == "b2-3"
    assert idx.search(q, topk=1, mode="beam").collect()[0]["dist"] == pytest.approx(
        0.0, abs=1e-5
    )


def test_keymap_upsert_across_segments(spark, idx_path):
    """Re-inserting an existing key in a later batch must resolve to the NEW
    id (LevelDB put-overwrite) through the merge-on-read key_map — and the
    earlier batch's key_map segment stays untouched on disk."""
    import random

    random.seed(31)
    mk = lambda tag, n: spark.createDataFrame(
        [(f"{tag}-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(n)],
        "k string, vec array<float>",
    )
    idx = pkg.create_index(spark, idx_path, dim=4, maxdegree=4)
    idx.insert_batch(mk("a", 20), vec_col="vec", key_col="k")
    old_id = idx.get_id_from_key("a-3")

    # second batch re-uses key a-3 (plus new keys)
    batch2 = mk("b", 10).union(
        spark.createDataFrame(
            [("a-3", [0.0, 0.0, 0.0, 0.0])], "k string, vec array<float>"
        )
    )
    idx.insert_batch(batch2, vec_col="vec", key_col="k")
    assert len(idx.meta["segments"]["key_map"]) == 2

    new_id = idx.get_id_from_key("a-3")
    assert new_id != old_id and new_id >= 20  # remapped to the new row
    assert idx.get_embedding_from_key("a-3") == [0.0, 0.0, 0.0, 0.0]
    # one row per key in the merged view
    assert idx.key_map.count() == idx.key_map.select("key").distinct().count() == 30


def test_filtered_search_prefilters_exactly(spark, idx_path, small_batch):
    """where= restricts candidates BEFORE ranking: the top-k is exact within
    the filtered key set, keys outside never appear, and approximate modes
    refuse (post-filtering would silently under-fill k)."""
    idx = pkg.create_index(spark, idx_path, dim=5, maxdegree=4)
    idx.insert_batch(small_batch, vec_col="vec", key_col="k")
    q = idx.get_embedding_from_key("key-0")

    res = idx.search(q, topk=3, where="key LIKE 'key-%' AND key != 'key-0'").collect()
    keys = [r["key"] for r in res]
    assert "key-0" not in keys and len(keys) == 3
    # equals brute-force over the filtered set
    brute = idx.search(q, topk=4).collect()  # unfiltered top-4 = key-0 + next 3
    assert keys == [r["key"] for r in brute if r["key"] != "key-0"][:3]

    with pytest.raises(ValueError, match="over-fetch"):
        idx.search(q, topk=3, mode="beam", where="key != 'key-0'")


def test_commit_log_time_travel_restore_and_vacuum(spark, tmp_path):
    """The index-level transaction log (round 11): every save() appends a
    commit record; load(commit=N) reopens that snapshot read-only and
    bit-exact; restore(N) re-commits it without rewinding history; vacuum
    prunes exactly the commits whose table snapshots it dropped."""
    import random

    from lmdiskann_jl_spark.index import load_index

    random.seed(17)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, vec array<float>")
    path = str(tmp_path / "idx")
    idx = pkg.create_index(spark, path, dim=4, maxdegree=4)          # commit 0
    idx.insert_batch(df.filter(F.col("k") < "k-3"), vec_col="vec", key_col="k")   # commit 1
    idx.insert_batch(df.filter(F.col("k") >= "k-3"), vec_col="vec", key_col="k")  # commit 2
    idx.delete_batch(keys=["k-0", "k-10"])                            # commit 3

    hist = idx.history()
    assert [(h["commit"], h["op"]) for h in hist] == [
        (3, "delete_batch"), (2, "insert_batch"), (1, "insert_batch"), (0, "create"),
    ]
    assert all(h["readable"] for h in hist)

    # as-of read: commit 1's corpus, exactly — later inserts invisible,
    # later deletes not yet applied (k-0 still present)
    old = load_index(spark, path, commit=1)
    old_keys = set(old.list_all_keys())
    want_keys = {f"k-{i}" for i in range(40) if f"k-{i}" < "k-3"}
    assert old_keys == want_keys and "k-0" in old_keys
    q = [float(x) for x in rows[0][1]]
    got = {r["key"] for r in old.search(q, topk=5).collect()}
    assert got <= want_keys

    # read-only: every mutation raises before touching disk
    for mut in (
        lambda: old.insert_batch(df.limit(1), vec_col="vec", key_col="k"),
        lambda: old.delete_batch(keys=["k-1"]),
        lambda: old.build_ivf(n_cells=2),
        lambda: old.build_beam_blocks(n_entrypoints=2),
        lambda: old.compact(),
        lambda: old.vacuum(),
        lambda: old.save(),
    ):
        with pytest.raises(ValueError, match="read-only"):
            mut()

    # restore: commit 1 becomes current as a NEW commit (history appends)
    idx.restore(1)
    assert set(idx.list_all_keys()) == want_keys
    assert idx.history()[0]["op"] == "restore:1"
    assert idx.meta["commit"] == 4
    # a restored index mutates normally
    idx.insert_batch(df.filter(F.col("k") == "k-9"), vec_col="vec", key_col="k")
    assert "k-9" in set(idx.list_all_keys())
    # the post-restore insert must NOT clobber newer commits' snapshot
    # dirs: the restored meta's version counters point at EARLY versions,
    # so naive v=N+1 allocation would overwrite commit 2's data — version
    # allocation is collision-proof (max of counter and on-disk dirs)
    old2 = pkg.load_index(spark, path, commit=2)
    assert set(old2.list_all_keys()) == {f"k-{i}" for i in range(40)}
    # creating over a live index would interleave two commit lineages
    with pytest.raises(FileExistsError, match="already exists"):
        pkg.create_index(spark, path, dim=4, maxdegree=4)

    # vacuum prunes commits whose snapshots it dropped; current one stays
    idx.compact()
    idx.vacuum(keep=1, min_age_seconds=0)
    left = {h["commit"] for h in idx.history()}
    assert idx.meta["commit"] in left
    assert 2 not in left  # the pre-restore state's snapshots are gone
    with pytest.raises(FileNotFoundError, match="commit 2"):
        load_index(spark, path, commit=2)


def test_save_rejects_concurrent_writer(spark, tmp_path):
    """Optimistic concurrency: two handles on one index — the second
    writer's save must raise instead of silently orphaning the first
    writer's commit (its pointer swap would discard commit 2's meta)."""
    df = spark.createDataFrame(
        [(f"k-{i}", [float(i), 0.0]) for i in range(6)], "k string, vec array<float>"
    )
    path = str(tmp_path / "idx")
    h1 = pkg.create_index(spark, path, dim=2, maxdegree=2)
    h2 = pkg.load_index(spark, path)
    h1.insert_batch(df.filter(F.col("k") < "k-3"), vec_col="vec", key_col="k")
    with pytest.raises(ValueError, match="concurrent modification"):
        h2.insert_batch(df.filter(F.col("k") >= "k-3"), vec_col="vec", key_col="k")
    # h1's commit survived; a fresh handle sees it and can continue
    h3 = pkg.load_index(spark, path)
    assert set(h3.list_all_keys()) == {"k-0", "k-1", "k-2"}
    h3.insert_batch(df.filter(F.col("k") >= "k-3"), vec_col="vec", key_col="k")
    assert len(h3.list_all_keys()) == 6


def test_single_vector_index_is_fully_usable(spark, tmp_path):
    """The reference's most basic flow — create, insert ONE vector, search
    (src/LMDiskANN.jl README) — must leave every table readable: an
    all-isolated graph previously wrote an EMPTY bucket-partitioned
    adjacency snapshot that parquet could not read back, breaking stats()
    and beam search on a 1-point index."""
    idx = pkg.create_index(spark, str(tmp_path / "one"), dim=2, maxdegree=4)
    df = spark.createDataFrame([("solo", [1.0, 2.0])], "k string, vec array<float>")
    idx.insert_batch(df, vec_col="vec", key_col="k")
    s = idx.stats()
    assert s["num_points"] == 1 and s["graph_nodes"] == 1
    assert s["max_degree"] == 0  # isolated node: present, empty neighbors
    got = idx.search([1.0, 2.0], topk=1)
    assert [r["key"] for r in got.collect()] == ["solo"]
    got_beam = idx.search([1.0, 2.0], topk=1, mode="beam")
    assert [r["key"] for r in got_beam.collect()] == ["solo"]


@pytest.mark.slow
def test_every_commit_reads_back_its_exact_prefix_state(spark, tmp_path):
    """Transaction-log invariant sweep: across an interleaved sequence of
    inserts, deletes, and a restore, EVERY retained commit must read back
    exactly the key set that existed when it was written — the invariant
    class that catches version-dir clobbering (the restore bug) wherever
    it hides."""
    import random

    random.seed(23)

    def vecs(keys):
        return spark.createDataFrame(
            [(k, [random.gauss(0, 1) for _ in range(3)]) for k in keys],
            "k string, vec array<float>",
        )

    path = str(tmp_path / "idx")
    idx = pkg.create_index(spark, path, dim=3, maxdegree=3)
    expected: dict[int, set] = {0: set()}
    live: set = set()

    def record():
        expected[idx.meta["commit"]] = set(live)

    idx.insert_batch(vecs([f"a{i}" for i in range(8)]), vec_col="vec", key_col="k")
    live |= {f"a{i}" for i in range(8)}; record()                       # commit 1
    idx.delete_batch(keys=["a0", "a3"])
    live -= {"a0", "a3"}; record()                                      # commit 2
    idx.insert_batch(vecs([f"b{i}" for i in range(5)]), vec_col="vec", key_col="k")
    live |= {f"b{i}" for i in range(5)}; record()                       # commit 3
    idx.restore(1)
    live = set(expected[1]); record()                                   # commit 4
    idx.insert_batch(vecs(["c0", "c1"]), vec_col="vec", key_col="k")
    live |= {"c0", "c1"}; record()                                      # commit 5
    idx.delete_batch(keys=["a1", "c0"])
    live -= {"a1", "c0"}; record()                                      # commit 6

    hist = {h["commit"]: h for h in idx.history()}
    assert set(hist) == set(expected)
    for commit, want in expected.items():
        assert hist[commit]["readable"], f"commit {commit} unreadable"
        h = pkg.load_index(spark, path, commit=commit)
        got = set(h.list_all_keys())
        assert got == want, f"commit {commit}: {got ^ want}"
        assert h.meta["num_points"] == len(want)


def test_time_traveled_handle_supports_filtered_and_kv_reads(spark, tmp_path):
    """The whole READ surface works on an as-of handle: filtered exact
    search (key predicate over the historical key_map), kv lookups, and
    embedding fetches all resolve against the historical snapshot."""
    df = spark.createDataFrame(
        [(f"k-{i}", [float(i), float(i % 3)]) for i in range(12)],
        "k string, vec array<float>",
    )
    path = str(tmp_path / "idx")
    idx = pkg.create_index(spark, path, dim=2, maxdegree=3)
    idx.insert_batch(df.filter(F.col("k") < "k-6"), vec_col="vec", key_col="k")  # commit 1
    idx.insert_batch(df.filter(F.col("k") >= "k-6"), vec_col="vec", key_col="k")  # commit 2
    idx.delete_batch(keys=["k-2"])                                               # commit 3

    # NB: string comparison — commit 1 holds {k-0..k-5, k-10, k-11}
    first = {f"k-{i}" for i in range(12) if f"k-{i}" < "k-6"}
    old = pkg.load_index(spark, path, commit=1)
    # filtered search sees only commit 1's keys (k-2 still alive there)
    got = {r["key"] for r in old.search([2.0, 2.0], topk=3, where="key != 'k-1'").collect()}
    assert "k-1" not in got
    assert got <= first
    assert "k-2" in {r["key"] for r in old.search([2.0, 2.0], topk=8).collect()}
    # kv + embedding surface against the historical snapshot
    assert set(old.list_all_keys()) == first
    assert old.get_id_from_key("k-9") is None  # later commit's key invisible
    assert old.get_embedding_from_key("k-3") == pytest.approx([3.0, 0.0])


def test_search_batch_key_tiebreak_is_insert_order_independent(spark, tmp_path):
    """tiebreak='key' ranks equidistant duplicates by user KEY, so two
    indexes holding the same logical corpus but built in different insert
    orders return identical rankings — the reproducibility contract the
    bit-exact streaming gates lean on.  The default id tiebreak does NOT
    have this property (internal ids follow assignment order), which is
    exactly why the option exists."""
    dup = [1.0, 0.0, 0.0]
    uniq = [0.0, 1.0, 0.0]
    rows = [("key-a", dup), ("key-b", dup), ("key-c", uniq)]

    def build(path, order):
        idx = pkg.create_index(spark, path, dim=3, maxdegree=4)
        for i in order:
            idx.insert_batch(
                spark.createDataFrame([rows[i]], "k string, vec array<float>"),
                vec_col="vec", key_col="k",
            )
        return idx

    fwd = build(str(tmp_path / "fwd"), [0, 1, 2])
    rev = build(str(tmp_path / "rev"), [1, 0, 2])
    queries = spark.createDataFrame([(0, dup)], "qid long, qvec array<float>")

    def ranked(idx, mode="exact", **kw):
        return [
            (r["rank"], r["key"])
            for r in idx.search_batch(queries, topk=3, mode=mode, **kw)
            .orderBy("rank").collect()
        ]

    want = [(1, "key-a"), (2, "key-b"), (3, "key-c")]
    assert ranked(fwd, tiebreak="key") == want
    assert ranked(rev, tiebreak="key") == want
    # the beam path applies the same tiebreak within its candidate set (a
    # 3-node graph's frontier reaches everything, so the result is exact)
    assert ranked(rev, mode="beam", tiebreak="key") == want
    # the id tiebreak flips the duplicates in the reversed index — the
    # hazard tiebreak='key' removes (if this stops failing, internal id
    # assignment changed and the gate rationale should be revisited)
    assert ranked(rev, tiebreak="id") == [(1, "key-b"), (2, "key-a"), (3, "key-c")]

    # the tiebreak decides the top-k BOUNDARY too, not just ordering within
    # the returned page
    top1 = rev.search_batch(queries, topk=1, mode="exact", tiebreak="key").collect()
    assert [(r["rank"], r["key"]) for r in top1] == [(1, "key-a")]

    with pytest.raises(ValueError, match="tiebreak"):
        fwd.search_batch(queries, topk=1, tiebreak="nope")


def test_time_travel_covers_ivf_layout(spark, tmp_path):
    """Round 12: the IVF cell store lives in the TableCatalog (append
    segments + a tombstone table), so a commit pins an exact IVF state and
    load(commit=)/restore keep the layout — previously the one structure
    time travel had to drop.  The historical probe must see EXACTLY the
    commit's corpus: maintained appends from the future are invisible,
    rows the future deleted are still there."""
    import random

    from lmdiskann_jl_spark.index import load_index

    random.seed(31)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, vec array<float>")
    path = str(tmp_path / "idx")
    idx = pkg.create_index(spark, path, dim=4, maxdegree=4)           # commit 0
    idx.insert_batch(df.filter(F.col("k") < "k-4"), vec_col="vec", key_col="k")  # commit 1
    idx.build_ivf(n_cells=4)                                          # commit 2
    ivf_commit = idx.meta["commit"]
    # future: maintained insert (cell segment append) + maintained delete
    # (tombstone segment) — both stay fresh, both are post-commit-2 state
    idx.insert_batch(
        df.filter(F.col("k") >= "k-4"), vec_col="vec", key_col="k",
        maintain_ivf=True,
    )                                                                 # commit 3
    idx.delete_batch(keys=["k-0", "k-11"], maintain_ivf=True)         # commit 4
    assert idx._ivf_fresh()

    old = load_index(spark, path, commit=ivf_commit)
    assert old._ivf_fresh(), "the commit's IVF layout must come back fresh"
    want_keys = {f"k-{i}" for i in range(60) if f"k-{i}" < "k-4"}
    # probe every cell => the historical IVF scan is exhaustive, so it must
    # EQUAL the historical exact scan (same corpus, same ranking)
    q = [float(x) for x in rows[0][1]]
    ivf_got = [
        (r["key"], round(r["dist"], 6))
        for r in old.search(q, topk=8, mode="ivf", nprobe=4).collect()
    ]
    exact_got = [
        (r["key"], round(r["dist"], 6))
        for r in old.search(q, topk=8, mode="exact").collect()
    ]
    assert ivf_got == exact_got
    got_keys = {k for k, _ in ivf_got}
    assert got_keys <= want_keys and "k-0" in {k for k, _ in ivf_got[:1]}
    # the future's appends must not leak into the historical probe
    assert not any(k >= "k-4" for k in got_keys)

    # the CURRENT handle's probe reflects the full churn: appends visible,
    # tombstoned rows gone
    cur_ids = {
        r["key"] for r in idx.search(q, topk=60, mode="ivf", nprobe=4).collect()
    }
    assert "k-0" not in cur_ids and "k-11" not in cur_ids
    assert any(k >= "k-4" for k in cur_ids)

    # restore brings the IVF layout back with the commit — no rebuild
    idx.restore(ivf_commit)
    assert idx._ivf_fresh()
    back = {r["key"] for r in idx.search(q, topk=8, mode="ivf", nprobe=4).collect()}
    assert back == {k for k, _ in ivf_got}


def test_vacuum_retention_horizon_protects_live_asof_reader(spark, tmp_path):
    """vacuum(min_age_seconds=...) is the Delta retention-duration analog
    (round 12): commits younger than the horizon survive regardless of
    ``keep``, so an as-of handle opened before the vacuum keeps reading.
    Past the horizon the commit dies and the next open raises the curated
    error."""
    import random

    from lmdiskann_jl_spark.index import load_index

    random.seed(37)
    rows = [(f"k-{i}", [random.gauss(0, 1) for _ in range(4)]) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, vec array<float>")
    path = str(tmp_path / "idx")
    idx = pkg.create_index(spark, path, dim=4, maxdegree=4)           # commit 0
    idx.insert_batch(df.filter(F.col("k") < "k-2"), vec_col="vec", key_col="k")  # commit 1
    idx.insert_batch(df.filter(F.col("k") >= "k-2"), vec_col="vec", key_col="k") # commit 2
    idx.compact()                                                     # commit 3

    # a reader is live on commit 1; vacuum with a horizon covering it
    # (every commit is seconds old) — keep=0 alone would drop it.  The
    # DEFAULT horizon (round 13: one hour) must protect it without the
    # caller passing anything — safe-by-default, the Delta convention.
    old = load_index(spark, path, commit=1)
    idx.vacuum(keep=0)
    assert {h["commit"] for h in idx.history()} >= {1, 2, 3}, (
        "vacuum's DEFAULT retention must protect seconds-old commits"
    )
    idx.vacuum(keep=0, min_age_seconds=3600)
    q = [float(x) for x in rows[0][1]]
    got = {r["key"] for r in old.search(q, topk=3).collect()}
    assert got, "the age-protected snapshot must keep serving the live reader"
    assert {h["commit"] for h in idx.history()} >= {1, 2, 3}

    # past the horizon (everything older than 0 seconds is fair game) the
    # same vacuum reclaims, and the NEXT open fails with the curated error
    idx.vacuum(keep=0, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="vacuumed snapshots|no commit"):
        load_index(spark, path, commit=1)
