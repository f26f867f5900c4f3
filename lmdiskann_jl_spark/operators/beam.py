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


def beam_search_batch(
    vectors: DataFrame,
    adjacency: DataFrame,
    queries: DataFrame,
    ef: int = 300,
    metric: str = "euclidean",
    entrypoint: int | None = None,
    max_hops: int = 12,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Beam search for a BATCH of queries in one shared driver loop.

    All queries advance together: each hop expands the union of all
    frontiers with ONE adjacency join and ONE vectors join (scoring every
    (query, candidate) pair via a broadcast of the query set), so the
    per-hop job count is constant in the number of queries — the batch
    amortization the single-query loop lacks.  Per-query ef-bounded beams
    and early termination live driver-side (ids + distances only).

    Returns (qid, id, dist) — up to ef candidates per query, true-metric
    scored; caller applies per-qid window top-k.
    """
    spark = vectors.sparkSession
    dist_fn = resolve_metric(metric)
    q_small = F.broadcast(queries.select(qid_col, qvec_col))
    # qid type follows the caller's queries schema (nothing restricts it to
    # long — string qids are valid); all driver-built frames use it
    qid_type = queries.schema[qid_col].dataType.simpleString()

    def score(cand_df: DataFrame) -> list:
        """(qid, id) candidates -> collected (qid, id, dist) rows."""
        return (
            cand_df.join(vectors.select(F.col(id_col).alias("id"), vec_col), "id")
            .join(q_small, qid_col)
            .select(
                qid_col, "id", dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist")
            )
            .collect()
        )

    qids = [r[qid_col] for r in queries.select(qid_col).collect()]
    if not qids:
        return spark.createDataFrame([], f"{qid_col} {qid_type}, id long, dist double")

    if entrypoint is None or entrypoint < 0:
        ep_row = vectors.select(F.col(id_col).alias("id")).orderBy("id").limit(1).collect()
        if not ep_row:
            return spark.createDataFrame([], f"{qid_col} {qid_type}, id long, dist double")
        entrypoint = int(ep_row[0]["id"])

    seed_df = spark.createDataFrame([(q, entrypoint) for q in qids], f"{qid_col} {qid_type}, id long")
    best: dict[int, dict[int, float]] = {q: {} for q in qids}
    visited: dict[int, set[int]] = {q: set() for q in qids}
    for r in score(F.broadcast(seed_df)):
        best[r[qid_col]][int(r["id"])] = float(r["dist"])
    frontier: dict[int, list[int]] = {q: [entrypoint] for q in qids}

    for _ in range(max_hops):
        rows = [(q, i) for q, ids in frontier.items() for i in ids]
        if not rows:
            break
        fr_df = F.broadcast(spark.createDataFrame(rows, f"{qid_col} {qid_type}, id long"))
        nbrs = (
            fr_df.join(adjacency.withColumnRenamed("id", "id"), "id")
            .select(qid_col, F.explode("neighbors").alias("id"))
            .distinct()
        )
        known = F.broadcast(
            spark.createDataFrame(
                [(q, i) for q, s in visited.items() for i in s]
                + [(q, i) for q, b in best.items() for i in b],
                f"{qid_col} {qid_type}, id long",
            )
        )
        new_scored = score(nbrs.join(known, [qid_col, "id"], "left_anti"))
        for q, ids in frontier.items():
            visited[q].update(ids)
        if not new_scored:
            break
        improved: set[int] = set()
        for r in new_scored:
            q, i, d = r[qid_col], int(r["id"]), float(r["dist"])
            b = best[q]
            worst = max(b.values()) if len(b) >= ef else float("inf")
            if len(b) < ef or d < worst:
                b[i] = d
                improved.add(q)
                if len(b) > ef:
                    del b[max(b, key=b.get)]
        frontier = {
            q: sorted((i for i in best[q] if i not in visited[q]), key=lambda i: best[q][i])[
                : max(1, ef // 4)
            ]
            for q in improved
        }

    return spark.createDataFrame(
        [(q, i, d) for q, b in best.items() for i, d in b.items()],
        f"{qid_col} {qid_type}, id long, dist double",
    )
