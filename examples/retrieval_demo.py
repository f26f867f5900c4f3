"""Retrieval, end to end: the engine's three ranking legs and their fusion
over the documents/embeddings tables.

    BM25 lexical top-k        (wide-form single-shuffle scorer)
    cosine vector top-k       (exact scan, TakeOrderedAndProject)
    hybrid additive fusion    (cosine + term-overlap, one joined scan)
    reciprocal-rank fusion    (full-outer rank join of the two legs)

Every leg is a declared oracle-gated query (plans/queries.py); this demo
chains them the way a retrieval service composes them.

Run:  python3 examples/retrieval_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmdiskann_jl_spark.plans import queries as Q
from lmdiskann_jl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="retrieval-demo", master="local[8]", shuffle_partitions=8)

    print(f"BM25 top-10 for terms {Q.BM25_QUERY_TERMS}:")
    Q.q_bm25_search(spark, SF_DIR).show(10)

    print(f"cosine top-10 around vector #{Q.QUERY_VEC_ID}:")
    Q.q_exact_topk_cosine(spark, SF_DIR).show(10)

    print("hybrid (cosine + term overlap) top-10:")
    Q.q_hybrid_search(spark, SF_DIR).show(10)

    print("reciprocal-rank fusion of the BM25 and cosine legs:")
    Q.q_rrf_fusion(spark, SF_DIR).show(10)


if __name__ == "__main__":
    main()
