"""Training-data pipeline, end to end: the operators composed the way a
corpus-prep job actually chains them.

    raw documents
      -> quality filter     (language / length / score, with drop reasons)
      -> exact + near-dup   (minhash-LSH pairs -> connected components ->
                             keep one canonical doc per cluster)
      -> stratified sample  (deterministic per-language training mix)
      -> chunking           (overlapping token windows)
      -> sequence packing   (shard-parallel token-budget bins)

Every stage is scan-stage expressions or a single keyed shuffle — the same
composition runs unchanged on a 1000-executor cluster; only n_shards and
the sampling rates change.

Run:  python3 examples/pipeline_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators import dedup as D
from lmdiskann_jl_spark.operators import pipeline as P
from lmdiskann_jl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="pipeline-demo", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. quality filter — keep rows, account for every drop
    qf = P.quality_filter(docs).cache()
    print("drop accounting:")
    qf.groupBy("reason").count().orderBy("reason").show()
    kept = docs.join(qf.filter("keep").select("doc_id"), "doc_id", "left_semi").cache()

    # 2. dedup — transitive near-dup clusters; keep the HIGHEST-QUALITY
    #    member of each cluster (quality-aware canonical policy), and flag
    #    cross-document duplicated spans for substring-level cleanup
    pairs = D.minhash_lsh_pairs(kept)
    clusters = D.dup_clusters(pairs, kept.select("doc_id")).cache()
    quality = qf.select("doc_id", "quality_score")
    best = (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(F.col("quality_score"), (-F.col("doc_id")).alias("_nd")),
            ).alias("doc_id")
        )
    )
    canonical = kept.join(best.select("doc_id"), "doc_id", "left_semi").cache()
    n_dupes = clusters.filter("NOT keep").count()
    n_spans = D.duplicate_spans(kept).count()
    # 2b. substring dedup APPLIED: cut the cross-doc duplicated spans from
    #     the canonical corpus and continue with the cleaned text
    cleaned = D.remove_duplicate_spans(canonical)
    n_cut_tokens = cleaned.agg(F.sum("n_removed")).first()[0] or 0
    canonical = (
        canonical.drop("text")
        .join(
            # a fully-duplicated document survives the cut as empty text
            # (n_kept = 0) — drop it here so sampling/chunking/packing
            # never see empty docs
            cleaned.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        )
        .cache()
    )

    # 3. training mix — deterministic per-language sampling; the split that
    #    will feed eval is keyed by CLUSTER id so near-dups never straddle
    #    train/test (leakage guard)
    sampled_ids = P.stratified_sample(canonical).select("doc_id")
    sampled = canonical.join(sampled_ids, "doc_id", "left_semi").cache()
    split = P.dataset_split(
        clusters.select("cluster_id").distinct(), id_col="cluster_id"
    )
    n_test_clusters = split.filter("split = 'test'").count()

    # 4. chunk + 5. pack
    chunks = P.chunk_documents(sampled).cache()
    packed = P.pack_sequences(sampled)
    n_seqs = packed.select("seq_id").distinct().count()

    print(
        f"{n0} raw -> {kept.count()} quality-kept -> "
        f"{canonical.count()} canonical (dropped {n_dupes} near-dups; "
        f"{n_spans} duplicated spans flagged, {n_cut_tokens} tokens cut; "
        f"{n_test_clusters} clusters held out leak-free) -> "
        f"{sampled.count()} sampled -> {chunks.count()} chunks -> "
        f"{n_seqs} packed sequences"
    )
    spark.stop()


if __name__ == "__main__":
    main()
