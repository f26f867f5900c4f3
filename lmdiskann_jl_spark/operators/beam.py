"""Distributed greedy beam search over the kNN graph.

Reference parity: ``_search_graph`` (``/root/reference/src/LMDiskANN.jl:383-431``)
is Algorithm 1 of the LM-DiskANN paper — greedy best-first from a single
entrypoint, an ``ef``-bounded result list, early termination when the best
unexpanded candidate is worse than the worst retained result (``:404-406``).

Spark shape (SURVEY.md sections 3-4): the sequential ``while`` loop is
data-dependent iteration — not expressible as one Catalyst plan — so the
driver orchestrates a bounded loop of set-at-a-time jobs (the GraphFrames/
Pregel pattern).  Each hop:

    frontier ids -> semi-join adjacency -> explode(neighbors)
                 -> anti-join visited -> join vectors -> score -> keep best ef

Instead of popping ONE nearest candidate per iteration (the reference's
``:401-402``), each hop expands the WHOLE frontier — a set-at-a-time
generalization that converges in O(graph diameter) hops instead of O(ef)
pops.  Termination mirrors ``:404-406``: stop when no unvisited candidate
improves on the current ef-worst, or after ``max_hops``.

Scale notes: the frontier and result sets are <= ef rows (tiny) and are
broadcast into the adjacency/vectors joins, so each hop is one scan-sided
broadcast join, no large-table shuffle.  Per-hop results are collected to the
driver (<= ef * maxdegree scored ids) — the same driver<->executor boundary
any Pregel superstep pays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric


def beam_search(
    vectors: DataFrame,
    adjacency: DataFrame,
    query: Sequence[float],
    ef: int = 300,
    metric: str = "euclidean",
    entrypoint: int | None = None,
    max_hops: int = 12,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-ef candidates for ``query`` via graph traversal.

    Returns a DataFrame (id, dist) of <= ef candidates, re-scored with the
    true metric (the reference re-scores at :465-471 — here scores are already
    true distances).  Caller applies orderBy/limit for final top-k.
    """
    spark = vectors.sparkSession
    dist_fn = resolve_metric(metric)
    q = query_vector_lit(query)

    scored_vectors = vectors.select(
        F.col(id_col).alias("id"), dist_fn(F.col(vec_col), q).alias("dist")
    )

    if entrypoint is None or entrypoint < 0:
        seed = scored_vectors.orderBy("id").limit(1).collect()
    else:
        seed = scored_vectors.filter(F.col("id") == entrypoint).limit(1).collect()
    if not seed:
        return spark.createDataFrame([], "id long, dist double")

    # driver-side state: visited set + ef-bounded best list (ids+dists only —
    # a few KB; vectors themselves never leave the executors)
    best: dict[int, float] = {int(seed[0]["id"]): float(seed[0]["dist"])}
    visited: set[int] = set()
    frontier: list[int] = [int(seed[0]["id"])]

    for _ in range(max_hops):
        if not frontier:
            break
        frontier_df = F.broadcast(spark.createDataFrame([(i,) for i in frontier], "id long"))
        nbrs = (
            adjacency.join(frontier_df, "id", "left_semi")
            .select(F.explode("neighbors").alias("id"))
            .distinct()
        )
        known = F.broadcast(
            spark.createDataFrame([(i,) for i in visited | set(best)], "id long")
        )
        new_scored = (
            scored_vectors.join(F.broadcast(nbrs), "id", "left_semi")
            .join(known, "id", "left_anti")
            .collect()
        )
        visited.update(frontier)
        if not new_scored:
            break
        worst = max(best.values()) if len(best) >= ef else float("inf")
        improved = False
        for r in new_scored:
            i, d = int(r["id"]), float(r["dist"])
            if len(best) < ef or d < worst:
                best[i] = d
                improved = True
                if len(best) > ef:
                    # evict current worst (ef-bounded result list, :419-425)
                    evict = max(best, key=best.get)
                    del best[evict]
                worst = max(best.values()) if len(best) >= ef else float("inf")
        if not improved:  # early termination, :404-406
            break
        # next frontier: unexpanded members of the best list, nearest-first
        frontier = sorted(
            (i for i in best if i not in visited), key=lambda i: best[i]
        )[: max(1, ef // 4)]

    return spark.createDataFrame(
        [(i, d) for i, d in sorted(best.items(), key=lambda kv: (kv[1], kv[0]))],
        "id long, dist double",
    )
