"""Legacy (pre-round-12) IVF layout: hardening + the migrate_ivf() path.

Before round 12 the IVF cell store lived in an out-of-catalog dir
(``meta['ivf']['dir']``, in-place appends, a ``_tombstones`` parquet
sidecar next to it).  Round 12 moved it into the TableCatalog
(``ivf_cells`` segments + an ``ivf_tombstones`` table) but an UPGRADED
index still carries the old meta shape.  These tests synthesize that
exact shape (by down-converting a modern layout) and pin the round-13
contract:

- every maintenance path (compact, maintained insert/delete) treats the
  legacy layout as absent instead of KeyError-ing into the catalog;
- vacuum never destroys a live legacy store OR its tombstone sidecar,
  and a historical commit whose legacy dir the OLD vacuum already
  reclaimed stays readable (exact/beam) rather than being pruned;
- ``migrate_ivf()`` is the one-time upgrade: fold the sidecar, write the
  survivors through the catalog, after which mode='ivf' probes are green
  and vacuum reclaims the legacy dirs once no commit references them.
"""

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark.index import load_index


def _mkvecs(spark, n, dim=4, seed=11):
    random.seed(seed)
    rows = [
        (f"k-{i}", [random.gauss(0.0, 1.0) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "k string, vec array<float>")


def _make_legacy(spark, path, n=60, n_cells=4, tombstone_keys=()):
    """Build a modern index + IVF, then down-convert the meta to the
    pre-round-12 legacy shape: point ivf['dir'] at the cell snapshot dir,
    unlist ivf_cells from the catalog, and (optionally) write a tombstone
    sidecar next to it — byte-identical to what pre-round-12 code left on
    disk (the cell dir WAS <path>/ivf_cells/v=N then too)."""
    df = _mkvecs(spark, n)
    idx = pkg.create_index(spark, path, dim=4, maxdegree=8)
    idx.insert_batch(df, vec_col="vec", key_col="k")
    idx.build_ivf(n_cells=n_cells)
    v = idx.meta["versions"]["ivf_cells"]
    legacy_dir = os.path.join(path, "ivf_cells", f"v={v}")
    assert os.path.isdir(legacy_dir)
    ivf = dict(idx.meta["ivf"])
    ivf["dir"] = legacy_dir
    idx.meta["versions"] = {
        k: v2 for k, v2 in idx.meta["versions"].items() if k != "ivf_cells"
    }
    if "segments" in idx.meta:
        idx.meta["segments"] = {
            k: v2 for k, v2 in idx.meta["segments"].items() if k != "ivf_cells"
        }
    if tombstone_keys:
        ids = idx.key_map.filter(
            F.col("key").isin(list(tombstone_keys))
        ).select("id")
        ids.write.mode("overwrite").parquet(legacy_dir + "_tombstones")
        ivf["tombstones"] = True
    idx.meta["ivf"] = ivf
    idx.save(op="legacy_synth")
    return load_index(spark, path), df


def test_legacy_layout_is_never_fresh_and_probes_raise_curated(spark, tmp_path):
    idx, df = _make_legacy(spark, str(tmp_path / "idx"))
    assert not idx._ivf_fresh()
    assert idx.stats()["ivf_fresh"] is False
    q = [float(x) for x in df.limit(1).collect()[0]["vec"]]
    # auto mode must NOT select the unreadable legacy layout
    got = idx.search(q, topk=3, mode="auto").collect()
    assert got and got[0]["dist"] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="migrate_ivf"):
        idx.search(q, topk=3, mode="ivf").collect()
    qdf = df.limit(2).select(
        F.col("k").alias("qid"), F.col("vec").alias("qvec")
    )
    with pytest.raises(ValueError, match="migrate_ivf"):
        idx.search_batch(qdf, topk=3, mode="ivf")


def test_compact_skips_legacy_layout_instead_of_keyerror(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx, _ = _make_legacy(spark, path, tombstone_keys=("k-1", "k-2"))
    legacy_dir = idx.meta["ivf"]["dir"]
    idx.compact()  # pre-round-13 this KeyError'd / ValueError'd out
    # the legacy store is untouched: dir + sidecar still on disk, meta
    # still carries the layout (migrate_ivf is the upgrade path)
    assert os.path.isdir(legacy_dir)
    assert os.path.isdir(legacy_dir + "_tombstones")
    assert idx.meta["ivf"]["dir"] == legacy_dir


def test_maintained_mutations_unlist_legacy_instead_of_keyerror(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx, df = _make_legacy(spark, path)
    legacy_dir = idx.meta["ivf"]["dir"]
    extra = _mkvecs(spark, 5, seed=99).withColumn(
        "k", F.concat(F.lit("x-"), F.col("k"))
    )
    # pre-round-13: ivf_live was True for a fresh-looking legacy layout and
    # catalog.append('ivf_cells', ...) KeyError'd; now the layout is never
    # fresh, so the mutation takes the drop/unlist branch
    idx.insert_batch(extra, vec_col="vec", key_col="k", maintain_ivf=True)
    assert "ivf" not in idx.meta
    assert "ivf_tombstones" not in idx.meta.get("versions", {})
    # the legacy dir stays for the historical commits that reference it
    assert os.path.isdir(legacy_dir)

    idx2, _ = _make_legacy(spark, str(tmp_path / "idx2"))
    idx2.delete_batch(keys=["k-3"], maintain_ivf=True)
    assert "ivf" not in idx2.meta
    assert "ivf_tombstones" not in idx2.meta.get("versions", {})


def test_vacuum_protects_live_legacy_store_and_sidecar(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx, _ = _make_legacy(spark, path, tombstone_keys=("k-5",))
    legacy_dir = idx.meta["ivf"]["dir"]
    idx.vacuum(keep=0, min_age_seconds=0)
    # the sweep matches v=* entries under ivf_cells/ — both the legacy
    # cell dir AND its v=N_tombstones sidecar must survive (dropping only
    # the sidecar would resurrect deleted ids for a pre-round-12 reader)
    assert os.path.isdir(legacy_dir)
    assert os.path.isdir(legacy_dir + "_tombstones")


def test_asof_stays_readable_after_old_vacuum_reclaimed_legacy_dir(
    spark, tmp_path
):
    path = str(tmp_path / "idx")
    idx, df = _make_legacy(spark, path)
    legacy_commit = int(idx.meta["commit"])
    legacy_dir = idx.meta["ivf"]["dir"]
    # a later mutation unlists the layout; then simulate the PRE-round-12
    # vacuum, which reclaimed superseded legacy dirs with no commit
    # awareness
    idx.insert_batch(
        _mkvecs(spark, 3, seed=7).withColumn(
            "k", F.concat(F.lit("y-"), F.col("k"))
        ),
        vec_col="vec",
        key_col="k",
    )
    shutil.rmtree(legacy_dir)
    # readability must not require the legacy dir: the commit's base
    # tables are intact, exact search works, the phantom layout is dropped
    old = load_index(spark, path, commit=legacy_commit)
    assert "ivf" not in old.meta
    q = [float(x) for x in df.limit(1).collect()[0]["vec"]]
    assert old.search(q, topk=3).collect()[0]["dist"] == pytest.approx(0.0)
    assert any(
        h["commit"] == legacy_commit and h["readable"]
        for h in idx.history()
    )
    # and vacuum must not prune the commit record as unreadable
    idx.vacuum(keep=5, min_age_seconds=0)
    assert load_index(spark, path, commit=legacy_commit) is not None


def test_migrate_ivf_folds_sidecar_and_goes_green(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx, df = _make_legacy(spark, path, n=60, tombstone_keys=("k-1", "k-2"))
    legacy_dir = idx.meta["ivf"]["dir"]
    pre_commit = int(idx.meta["commit"])
    idx.migrate_ivf()
    # catalog-shaped now: fresh (built_from carried over, vectors
    # untouched), dir/tombstones keys gone, probes green
    assert "ivf_cells" in idx.meta["versions"]
    assert "dir" not in idx.meta["ivf"]
    assert idx._ivf_fresh()
    live = idx._ivf_assigned()
    assert live.count() == 58  # 60 minus the two folded tombstones
    q = [float(x) for x in df.limit(1).collect()[0]["vec"]]
    got = idx.search(q, topk=5, mode="ivf", nprobe=4).collect()
    assert got[0]["key"] == "k-0" and got[0]["dist"] == pytest.approx(0.0)
    # idempotent
    c = int(idx.meta["commit"])
    idx.migrate_ivf()
    assert int(idx.meta["commit"]) == c
    # the pre-migration commit still reads (legacy dir protected while
    # referenced); after vacuum drops it, the legacy dir + sidecar are
    # reclaimed by the generic sweep
    assert load_index(spark, path, commit=pre_commit) is not None
    idx.vacuum(keep=0, min_age_seconds=0)
    assert not os.path.isdir(legacy_dir)
    assert not os.path.isdir(legacy_dir + "_tombstones")
    # the migrated layout still probes after the sweep
    got2 = idx.search(q, topk=5, mode="ivf", nprobe=4).collect()
    assert [r["key"] for r in got2] == [r["key"] for r in got]


def test_migrate_ivf_drops_phantom_and_all_tombstoned_layouts(spark, tmp_path):
    # dead reference: the old vacuum already reclaimed the store
    path = str(tmp_path / "idx")
    idx, _ = _make_legacy(spark, path)
    shutil.rmtree(idx.meta["ivf"]["dir"])
    idx.migrate_ivf()
    assert "ivf" not in idx.meta

    # every row tombstoned: a 0-row partitioned write would be a
    # schema-less landmine — the layout covers nothing, so it is dropped
    path2 = str(tmp_path / "idx2")
    idx2, _ = _make_legacy(
        spark, path2, n=10, n_cells=2,
        tombstone_keys=tuple(f"k-{i}" for i in range(10)),
    )
    idx2.migrate_ivf()
    assert "ivf" not in idx2.meta
    assert "ivf_cells" not in idx2.meta.get("versions", {})
