"""Lifecycle demo: streaming churn, dedup-on-ingest, and time travel.

The round-11 surface beyond the reference (LMDiskANN.jl persists one
mutable state with no history — src/LMDiskANN.jl:82-100): every index
mutation here is a COMMIT in an append-only transaction log, streams of
inserts AND deletes maintain the index, and any retained snapshot can be
reopened read-only — the reproducibility handle a training pipeline needs.

Run:  python3 examples/lifecycle_demo.py
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
    spark = get_spark(app_name="lifecycle-demo", master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="lmdiskann_demo_")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def as_batch(df):
        return df.select(
            F.col("embedding").alias("vec"),
            F.format_string("vec-%08d", F.col("vec_id")).alias("k"),
        )

    # --- bulk load = commit 1 -------------------------------------------
    idx = pkg.create_index(spark, f"{root}/idx", dim=64, maxdegree=16)
    idx.insert_batch(as_batch(emb.filter(F.col("vec_id") % 4 != 0)), vec_col="vec", key_col="k")
    print(f"bulk load: {idx.meta['num_points']} points at commit {idx.meta['commit']}")

    # --- streaming churn: an insert stream, then a delete stream ---------
    from lmdiskann_jl_spark.streaming.ingest import stream_delete, stream_insert

    ins = as_batch(emb.filter(F.col("vec_id") % 4 == 0))
    ins.repartition(2).write.parquet(f"{root}/ins")
    stream_insert(
        idx,
        spark.readStream.schema(ins.schema).option("maxFilesPerTrigger", 1).parquet(f"{root}/ins"),
        f"{root}/ckpt_ins", vec_col="vec", key_col="k",
    ).awaitTermination()
    doomed = emb.filter(F.col("vec_id") % 5 == 2).select(
        F.format_string("vec-%08d", F.col("vec_id")).alias("k")
    )
    doomed.coalesce(1).write.parquet(f"{root}/del")
    stream_delete(
        idx,
        spark.readStream.schema(doomed.schema).parquet(f"{root}/del"),
        f"{root}/ckpt_del", key_col="k",
    ).awaitTermination()
    print(f"after churn: {idx.meta['num_points']} points at commit {idx.meta['commit']}")

    # --- history + time travel ------------------------------------------
    print("history (newest first):")
    for h in idx.history():
        print(f"  commit {h['commit']:>2}  {h['op']:<14} num_points={h['num_points']}")
    old = pkg.load_index(spark, f"{root}/idx", commit=1)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    print("search AS OF commit 1 (pre-churn corpus):")
    old.search(q, topk=3).show()
    try:
        old.delete_batch(keys=["vec-00000001"])
    except ValueError as e:
        print(f"historical handles are read-only: {e}")

    # --- restore: make the bulk-load state current again ------------------
    idx.restore(1)
    print(f"restored commit 1 -> now {idx.meta['num_points']} points at commit {idx.meta['commit']}")

    # --- streaming NEAR-dup dedup-on-ingest over documents ----------------
    from lmdiskann_jl_spark.streaming.dedup import neardup_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docs.coalesce(1).write.parquet(f"{root}/docs_in")
    neardup_stream(
        spark.readStream.schema(docs.schema).parquet(f"{root}/docs_in"),
        f"{root}/nd_state", f"{root}/nd_out", f"{root}/nd_ckpt",
    ).awaitTermination()
    flagged = spark.read.parquet(f"{root}/nd_out")
    n_dup = flagged.filter("is_dup").count()
    print(f"near-dup-on-ingest: {n_dup}/{flagged.count()} docs flagged against the band store")

    shutil.rmtree(root)
    spark.stop()


if __name__ == "__main__":
    main()
