"""Quickstart: the reference's workflow, one-to-one, on the Spark engine.

Left column of each step: what a LMDiskANN.jl user writes (from
/root/reference/README.md:18-47).  Body: the engine equivalent.

Run:  python3 examples/quickstart.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import lmdiskann_jl_spark as pkg
from lmdiskann_jl_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="quickstart", master="local[8]", shuffle_partitions=8)
    path = tempfile.mkdtemp(prefix="lmdiskann_")

    # --- create_index(tmp_path, DIM) ------------------------------------
    index = pkg.create_index(spark, path, dim=64, maxdegree=16, metric="euclidean")

    # --- for i in 1:100: ann_insert!(index, rand(Float32, DIM)) ---------
    # point inserts become one batch DataFrame insert (micro-batches for
    # streams — see streaming/ingest.stream_insert)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = emb.limit(100).select(
        F.col("embedding").alias("vec"),
        F.concat(F.lit("doc_"), F.col("vec_id")).alias("key"),  # ann_insert! key kwarg
    )
    index.insert_batch(batch, vec_col="vec", key_col="key")
    print(f"inserted: num_points={index.meta['num_points']}")

    # --- results = search(index, query; topk=5) -------------------------
    query = index.get_embedding_from_key("doc_7")  # get_embedding_from_key
    print("\nexact search (the brute_force_topk semantics):")
    index.search(query, topk=5).show()

    print("graph beam search (the _search_graph semantics):")
    index.search(query, topk=5, mode="beam").show()

    # --- the paper's block layout (one disk read per expansion) ---------
    # each node's block stores its vector + neighbor ids + neighbor copies
    # (PQ-coded here, exactly the LM-DiskANN format); beam hops become one
    # pruned fetch each and the retained set re-ranks exact
    index.build_beam_blocks(compress="pq")
    print("beam over PQ blocks (ADC traversal + exact re-rank):")
    index.search(query, topk=5, mode="beam", n_entrypoints=4).show()

    # --- CosineDist, the reference's GloVe demo metric -------------------
    # (docs/src/index.md:84 builds a cosine GloVe index).  Cosine indexes
    # build the PQ block layout too: payloads are L2-normalized at build
    # (unit vectors make cosine = sqeuclidean/2, so ADC is exact) and the
    # final re-rank returns true cosine distances.
    cos_path = tempfile.mkdtemp(prefix="lmdiskann_cos_")
    cos = pkg.create_index(spark, cos_path, dim=64, maxdegree=16, metric="cosine")
    cos.insert_batch(batch, vec_col="vec", key_col="key")
    cos.build_beam_blocks(compress="pq")
    print(f"cosine PQ blocks (normalized={cos.meta['beam_blocks']['normalized']}):")
    cos.search(query, topk=5, mode="beam", n_entrypoints=4).show()
    shutil.rmtree(cos_path, ignore_errors=True)

    # --- the scale path the reference doesn't have ----------------------
    index.build_ivf(n_cells=8)
    print("IVF probe search (partition-pruned):")
    index.search(query, topk=5, mode="ivf", nprobe=3).show()

    # --- get_id_from_key / get_key_from_id / count_entries --------------
    print("key->id:", index.get_id_from_key("doc_7"))
    print("id->key:", index.get_key_from_id(7))
    print("count_entries:", index.count_entries())

    # --- ann_delete!(index, "doc_7") ------------------------------------
    index.delete_batch(keys=["doc_7"])
    survivors = {r["key"] for r in index.search(query, topk=5).collect()}
    print("\nafter delete, doc_7 excluded:", "doc_7" not in survivors)

    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
