"""lmdiskann_jl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mantzaris/LMDiskANN.jl.

The reference (/root/reference, LMDiskANN.jl v1.1.0) is a single-node,
mmap-backed approximate-nearest-neighbor index with dynamic insert/delete,
greedy graph search, pluggable metrics, and a LevelDB-backed string-key <-> id
mapping layer (see SURVEY.md).  This package re-expresses that surface
Spark-first:

- state = Parquet tables ``vectors(id, key, vec)`` / ``adjacency(id, neighbors)``
  / ``key_map(key, id)`` + a tiny ``_index_meta.json`` (SURVEY.md section 1.4),
- search = native Catalyst column expressions + TakeOrderedAndProject /
  window top-k (no Python UDFs on the hot path),
- bulk build = distributed kNN join (brute-force or LSH) + window prune,
- mutation = batch insert/delete pipelines instead of point mmap writes,
- plus the large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) this engine is meant to serve.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo, and the LM-DiskANN paper (Pan, Sun & Yu, IEEE BigData
2023).
"""

__version__ = "0.1.0"

from lmdiskann_jl_spark.index import LMDiskANNIndex, create_index, load_index

__all__ = ["LMDiskANNIndex", "create_index", "load_index", "__version__"]
