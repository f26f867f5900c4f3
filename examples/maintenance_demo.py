"""Maintenance demo: IVF at scale — maintained appends, legacy migration,
safe vacuum, and the multiprobe LSH operating point.

What the round-13 surface adds for an operator running this engine in
production (the reference, src/LMDiskANN.jl, has one mutable state and no
maintenance story beyond its freelist):

1. a MAINTAINED IVF layout — inserts assign new rows to frozen centroids
   as O(batch) catalog segments and auto-refit past the drift budget;
   deletes are tombstone segments;
2. ``migrate_ivf()`` — the one-time upgrade for an index whose IVF cell
   store predates the versioned catalog (the pre-round-12 on-disk shape);
3. ``vacuum()`` with a SAFE DEFAULT — commits younger than the one-hour
   retention horizon survive regardless of ``keep``, so a live as-of
   reader is never pulled out from under (pass ``min_age_seconds=0`` only
   when you know no reader is live);
4. the multiprobe LSH kNN join — the AUTO default since round 13: a
   quarter of the rho-scaled table budget stored, four query-side probes
   per table, measured recall parity with full tables through a 10x
   corpus at ~3x less shuffle (SCALING.md's sf1 section).

Run:  python3 examples/maintenance_demo.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(
        app_name="maintenance-demo", master="local[8]", shuffle_partitions=8
    )
    root = tempfile.mkdtemp(prefix="lmdiskann_maint_")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def as_batch(df):
        return df.select(
            F.col("embedding").alias("vec"),
            F.format_string("vec-%08d", F.col("vec_id")).alias("k"),
        )

    # --- build + maintained IVF churn ------------------------------------
    idx = pkg.create_index(spark, f"{root}/idx", dim=64, maxdegree=16)
    idx.insert_batch(
        as_batch(emb.filter(F.col("vec_id") % 4 != 0)), vec_col="vec", key_col="k"
    )
    n_cells = max(2, min(8, idx.meta["num_points"] // 64))
    idx.build_ivf(n_cells=n_cells)
    print(f"built IVF: {n_cells} cells over {idx.meta['num_points']} points")

    # a maintained insert appends an O(batch) cell segment (no rescan of
    # old rows) — or auto-refits if the wave crosses the drift budget
    idx.insert_batch(
        as_batch(emb.filter(F.col("vec_id") % 4 == 0)),
        vec_col="vec", key_col="k", maintain_ivf=True,
    )
    st = idx.stats()
    print(
        f"maintained insert: {idx.meta['num_points']} points, "
        f"ivf_fresh={st['ivf_fresh']}, refits={idx.meta['ivf'].get('n_refits', 0)}"
    )
    # a maintained delete is a tombstone segment; probes anti-join it
    idx.delete_batch(keys=["vec-%08d" % 8], maintain_ivf=True)

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = idx.search(q, topk=3, mode="ivf", nprobe=n_cells).collect()
    print("ivf probe:", [(r["key"], round(r["dist"], 4)) for r in top])

    # --- vacuum: the safe default vs explicit reclamation ----------------
    # default: commits younger than the one-hour horizon survive keep=0 —
    # a reader holding load_index(commit=...) keeps reading
    before = len(idx.history())
    idx.vacuum(keep=0)
    print(f"vacuum (safe default): {before} -> {len(idx.history())} commits retained")
    # maintenance-style immediate reclaim is an explicit opt-in
    idx.vacuum(keep=1, min_age_seconds=0)
    print(f"vacuum (explicit min_age_seconds=0): {len(idx.history())} commits retained")

    # --- legacy migration: the pre-round-12 on-disk shape -----------------
    # simulate an index upgraded from old code: cells in an out-of-catalog
    # dir + a tombstone sidecar (exactly what pre-round-12 code left)
    from lmdiskann_jl_spark.index import load_index
    from lmdiskann_jl_spark.sources.tables import write_meta

    v = idx.meta["versions"]["ivf_cells"]
    legacy_dir = os.path.join(f"{root}/idx", "ivf_cells", f"v={v}")
    meta = dict(idx.meta)
    meta["ivf"] = dict(meta["ivf"], dir=legacy_dir)
    meta["versions"] = {k: x for k, x in meta["versions"].items() if k != "ivf_cells"}
    if "segments" in meta:
        meta["segments"] = {k: x for k, x in meta["segments"].items() if k != "ivf_cells"}
    write_meta(f"{root}/idx", meta)
    legacy = load_index(spark, f"{root}/idx")
    try:
        legacy.search(q, topk=3, mode="ivf")
    except ValueError as e:
        print(f"legacy layout probe raises the curated error: {e}")
    legacy.migrate_ivf()
    top2 = legacy.search(q, topk=3, mode="ivf", nprobe=n_cells).collect()
    print("post-migration probe:", [(r["key"], round(r["dist"], 4)) for r in top2])

    # --- multiprobe LSH kNN join (the AUTO default) -----------------------
    from lmdiskann_jl_spark.operators.knn_join import auto_lsh_config, lsh_knn_join

    n = emb.count()
    p, t, probes = auto_lsh_config(n, k=5)
    print(f"AUTO LSH point at n={n}: planes={p}, stored tables={t}, probes={probes}")
    knn = lsh_knn_join(
        emb, emb, k=5, dim=64, metric="euclidean",
        left_id="vec_id", right_id="vec_id", vec_col="embedding", n_rows=n,
    )
    print(f"multiprobe kNN self-join: {knn.count()} edges")

    shutil.rmtree(root)


if __name__ == "__main__":
    main()
