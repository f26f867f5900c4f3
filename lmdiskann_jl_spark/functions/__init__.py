from lmdiskann_jl_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    manhattan_distance,
    query_vector_lit,
    resolve_metric,
    sq_euclidean_distance,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "l2_norm",
    "manhattan_distance",
    "query_vector_lit",
    "resolve_metric",
    "sq_euclidean_distance",
]
