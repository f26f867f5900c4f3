"""Bulk graph (adjacency) build, incremental insert, and delete repair.

Reference parity — the three mutation entry points (SURVEY.md section 3):

- ``ann_insert!`` (``/root/reference/src/LMDiskANN.jl:531-584``): search
  top-``maxdegree`` neighbors for the new point, set its adjacency, then
  BACK-LINK — append the new id to each neighbor's list and prune each list
  back to ``maxdegree`` nearest (``:567-573``).
- ``_prune_neighbors`` (``:491-505``): plain nearest-``maxdegree`` truncation
  by distance to the node's own vector (the docstring mentions GSNG but the
  code is simple nearest-m — we replicate the simple semantics).
- ``ann_delete!`` (``:605-646``): remove the id from every neighbor's list and
  drop its own row.

Spark-first: each of these is a batch DataFrame pipeline —

    build:   kNN self-join -> forward edges ∪ reversed edges (back-links)
             -> per-node window prune to maxdegree -> groupBy collect_list
    insert:  same pipeline on (new batch x existing ∪ new batch x new batch),
             merged with existing adjacency, re-pruned only where changed
    delete:  array_except on neighbor lists + anti-join on own rows

The symmetrization (∪ reversed edges) is the batch analog of the reference's
sequential back-linking: every directed kNN edge is inserted in both
directions before pruning, keeping the graph navigable.  One shuffle for the
kNN window, one for the final groupBy — both on the id key, so co-partitioned
and AQE-coalesced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import resolve_metric
from lmdiskann_jl_spark.operators.knn_join import brute_force_knn_join, lsh_knn_join


def _prune_and_collect(edges: DataFrame, maxdegree: int) -> DataFrame:
    """edges (id_l, id_r, dist) -> adjacency (id, neighbors ARRAY<BIGINT>).

    The window top-k is the distributed ``_prune_neighbors``
    (src/LMDiskANN.jl:491-505): keep each node's ``maxdegree`` nearest.
    Neighbors are stored sorted by (dist, id) — deterministic output.
    """
    w = Window.partitionBy("id_l").orderBy(F.col("dist").asc(), F.col("id_r").asc())
    pruned = (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= maxdegree)
    )
    return (
        pruned.groupBy("id_l")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dist", "id_r"))),
                lambda s: s["id_r"],
            ).alias("neighbors")
        )
        .select(F.col("id_l").alias("id"), "neighbors")
    )


# candidate-pool width for alpha-diversified pruning: the greedy needs
# MORE than maxdegree candidates to have anything diverse to choose from
# (with exactly maxdegree candidates it degenerates to nearest-k minus
# dominated ties) — 2x is the DiskANN-paper convention (L >> R)
ALPHA_CANDIDATE_FACTOR = 2


def alpha_prune_and_collect(
    edges: DataFrame,
    vectors: DataFrame,
    maxdegree: int,
    alpha: float,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """RobustPrune-style alpha-DIVERSIFIED prune (the DiskANN paper's
    Algorithm 2, Subramanya et al., NeurIPS 2019 — public literature):
    edges (id_l, id_r, dist) + the vectors table -> adjacency
    (id, neighbors ARRAY<BIGINT>), at most ``maxdegree`` per node.

    Greedy per node over distance-sorted candidates: keep the nearest
    remaining candidate k, then DROP every candidate c it dominates
    (``alpha * d(k, c) <= d(node, c)``).  Near-cluster candidates dominate
    each other and collapse to a few slots, freeing degree budget for LONG
    edges — the device that keeps a far-away ingest region reachable where
    plain nearest-k pruning islands it (the reference's _prune_neighbors,
    src/LMDiskANN.jl:491-505, is plain nearest-k; alpha is therefore an
    OPT-IN knob — default index behavior stays reference parity).

    GEOMETRY DEPENDENCE (measured, round 11): dominance fires only when a
    kept neighbor lies meaningfully BETWEEN the node and a candidate —
    i.e. when the data has clustered / low-intrinsic-dimension structure.
    On isotropic high-dimensional data, concentration of measure makes
    d(kept, c) ≈ d(node, c) for every candidate pair, the rule never
    fires, and alpha degenerates to nearest-k (verified on the 64-dim
    isotropic test fixture: a +4/dim shifted island stays unreachable at
    alpha=1.2, while the clustered 8-dim pytest fixture reconnects).
    Real-world embedding corpora have low intrinsic dimension, which is
    why the DiskANN paper's alpha works in practice; don't expect it to
    rescue ingest into a corpus that is genuinely isotropic at scale.

    Physical shape: one join to attach candidate vectors (broadcast-able:
    the candidate pool is O(n * maxdegree * factor) ids against the vectors
    table's bucketed scan), one groupBy(id) shuffle — the same shuffle
    count as the nearest-k prune — then the greedy runs as a pure JVM
    ``aggregate`` higher-order function over each node's <= maxdegree *
    ALPHA_CANDIDATE_FACTOR collected candidates (no Python in the loop;
    HOFs are interpreted, so the per-node cost is
    O(pool * kept * dim) executor-side arithmetic — a build-time price the
    knob's caller opted into).  ``alpha=1.0`` reduces to nearest-k with
    dominated-duplicate removal; typical diversification is 1.2.

    Metric semantics: the dominance test ``alpha * d(kept, c) <= d(node,
    c)`` scales DISTANCES, so alpha must act in the metric's own units —
    ``sqeuclidean`` compares squared distances and uses ``alpha**2``
    internally (so alpha means the same geometric diversification as for
    euclidean); ``dot`` is rejected (its "distances" are negative inner
    products — scaling by alpha>1 would INVERT the rule and prune more
    aggressively); user-callable metrics must be nonnegative for the rule
    to mean what the docstring says (not checkable cheaply — documented
    contract)."""
    if alpha < 1.0:
        raise ValueError(f"alpha must be >= 1.0, got {alpha}")
    if isinstance(metric, str) and metric.lower() == "dot":
        raise ValueError(
            "alpha pruning is undefined for metric='dot': negative "
            "inner-product 'distances' invert the dominance rule"
        )
    eff_alpha = (
        alpha * alpha
        if isinstance(metric, str) and metric.lower() == "sqeuclidean"
        else alpha
    )
    dist_fn = resolve_metric(metric)
    cand_vecs = vectors.select(
        F.col(id_col).alias("id_r"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    )
    cands = (
        edges.join(cand_vecs, "id_r")
        .groupBy("id_l")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dist").cast("double").alias("dist"),
                        F.col("id_r").cast("long").alias("id_r"),
                        F.col("_cvec").alias("vec"),
                    )
                )
            ).alias("_cands")  # array_sort on structs: dist asc, id_r tiebreak
        )
    )
    empty = F.array().cast(
        "array<struct<dist:double,id_r:bigint,vec:array<double>>>"
    )
    kept = F.aggregate(
        F.col("_cands"),
        empty,
        lambda acc, c: F.when(F.size(acc) >= maxdegree, acc)
        .when(
            F.exists(
                acc,
                lambda k: dist_fn(k["vec"], c["vec"]) * F.lit(float(eff_alpha))
                <= c["dist"],
            ),
            acc,  # c is dominated by an already-kept neighbor: drop it
        )
        .otherwise(F.concat(acc, F.array(c))),
    )
    return cands.select(
        F.col("id_l").alias("id"),
        F.transform(kept, lambda s: s["id_r"]).alias("neighbors"),
    )


def adjacency_edges(
    vectors: DataFrame,
    maxdegree: int = 64,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    use_lsh: bool = False,
    dim: int | None = None,
    lsh_tables: int | None = None,
    candidate_factor: int = 1,
) -> DataFrame:
    """Pruned symmetrized kNN edges (id, neighbor, rank) — the flat form of
    the adjacency table (also the oracle-comparable form).

    ``lsh_tables=None`` (the default since round 13) resolves the LSH
    candidate generator to the AUTO operating point — occupancy-holding
    planes plus the quarter-budget multiprobe table rule, all scaled from
    corpus size.  The sf1 decade measurement forced this: a pinned table
    budget (the old default 4, the gate's old 8) measured build recall
    0.312 at n=20000 — the same shape as every other fixed LSH point,
    tables must grow ~n^rho to hold recall.  Pinning stays supported for
    configuration-specific tests; a pinned config carries no general
    recall claim and must gate its own configuration."""
    k = maxdegree * max(1, candidate_factor)
    if use_lsh:
        assert dim is not None, "dim required for LSH build"
        knn = lsh_knn_join(
            vectors, vectors, k=k, dim=dim, metric=metric,
            n_tables=lsh_tables, left_id=id_col, right_id=id_col, vec_col=vec_col,
        )
    else:
        knn = brute_force_knn_join(
            vectors, vectors, k=k, metric=metric,
            left_id=id_col, right_id=id_col, vec_col=vec_col,
            broadcast_right=True, dim=dim,
        )
    lcol, rcol = f"{id_col}_l", f"{id_col}_r"
    # back-links (the batch form of src/LMDiskANN.jl:568-573): emit BOTH edge
    # directions from one pass over the kNN result — explode, not union, so
    # the expensive join is computed once
    edges = (
        knn.select(
            F.explode(
                F.array(
                    F.struct(F.col(lcol).alias("id_l"), F.col(rcol).alias("id_r"), F.col("dist")),
                    F.struct(F.col(rcol).alias("id_l"), F.col(lcol).alias("id_r"), F.col("dist")),
                )
            ).alias("e")
        )
        .select("e.id_l", "e.id_r", "e.dist")
        .dropDuplicates(["id_l", "id_r"])
    )
    w = Window.partitionBy("id_l").orderBy(F.col("dist").asc(), F.col("id_r").asc())
    return (
        edges.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= maxdegree)
        .select(F.col("id_l").alias("id"), F.col("id_r").alias("neighbor"), "dist", "rank")
    )


def build_adjacency(
    vectors: DataFrame,
    maxdegree: int = 64,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    use_lsh: bool = False,
    dim: int | None = None,
    lsh_tables: int | None = None,
    candidate_factor: int = 1,
    alpha: float | None = None,
) -> DataFrame:
    """Bulk-build the kNN graph: the batch replacement for n sequential
    ``ann_insert!`` calls (SURVEY.md section 2.2 op 9).

    Output: ``adjacency(id BIGINT, neighbors ARRAY<BIGINT>)`` with
    ``size(neighbors) <= maxdegree``, neighbors sorted nearest-first.

    ``alpha`` (opt-in): alpha-diversified pruning over a
    ``ALPHA_CANDIDATE_FACTOR``-wide candidate pool instead of plain
    nearest-k — see alpha_prune_and_collect.  Default None = reference
    parity (src/LMDiskANN.jl:491-505 is plain nearest-k).

    EVERY vector id gets a row, isolated nodes with an empty neighbor
    array: the prune's groupBy would otherwise drop edge-less ids
    entirely, and a corpus whose graph is all-isolated (n=1 — the
    reference's most basic create-then-insert-one flow) would write an
    EMPTY bucket-partitioned adjacency snapshot, which parquet cannot
    read back (no files, no schema).
    """
    if alpha is not None:
        pool = adjacency_edges(
            vectors, maxdegree * ALPHA_CANDIDATE_FACTOR, metric, id_col,
            vec_col, use_lsh=use_lsh, dim=dim, lsh_tables=lsh_tables,
            candidate_factor=candidate_factor,
        ).select(F.col("id").alias("id_l"), F.col("neighbor").alias("id_r"), "dist")
        pruned = alpha_prune_and_collect(
            pool, vectors, maxdegree, alpha, metric, id_col, vec_col, dim=dim
        )
    else:
        edges = adjacency_edges(
            vectors, maxdegree, metric, id_col, vec_col,
            use_lsh=use_lsh, dim=dim, lsh_tables=lsh_tables,
            candidate_factor=candidate_factor,
        )
        pruned = (
            edges.groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dist", F.col("neighbor").alias("id_r")))),
                    lambda s: s["id_r"],
                ).alias("neighbors")
            )
            .select("id", "neighbors")
        )
    # distinct: this is a public operator, and a duplicated input id must
    # not yield duplicated adjacency rows (skinny-column aggregate)
    ids = vectors.select(F.col(id_col).cast("long").alias("id")).distinct()
    return ids.join(pruned, "id", "left").select(
        "id",
        F.coalesce("neighbors", F.array().cast("array<bigint>")).alias("neighbors"),
    )


def delete_from_adjacency(
    adjacency: DataFrame,
    deleted_ids: Sequence[int] | DataFrame,
    small_threshold: int = 256,
) -> DataFrame:
    """Batch ``ann_delete!`` graph repair (src/LMDiskANN.jl:622-629):
    drop deleted nodes' own rows; remove the deleted ids from every remaining
    neighbor list.

    Two physical strategies by dead-set size:
    - small (sequence under ``small_threshold``): literal ``array_except`` —
      one scan, no shuffle (narrow transforms only);
    - large (or any DataFrame): posexplode -> broadcast anti-join -> rebuild,
      preserving neighbor order via the original position.  Literal ``isin``
      lists at this size are a plan-size/codegen blowup; the anti-join keeps
      the dead set data-side.
    """
    if not isinstance(deleted_ids, DataFrame):
        ids = [int(i) for i in deleted_ids]
        if len(ids) <= small_threshold:
            dead_arr = F.array(*[F.lit(i).cast("long") for i in ids])
            return (
                adjacency.filter(~F.col("id").isin(ids))
                .withColumn("neighbors", F.array_except(F.col("neighbors"), dead_arr))
            )
        deleted_ids = adjacency.sparkSession.createDataFrame(
            [(i,) for i in ids], "id long"
        )
    dead = deleted_ids.select(F.col("id").cast("long")).distinct()
    survivors = adjacency.join(F.broadcast(dead), "id", "left_anti")
    exploded = survivors.select("id", F.posexplode("neighbors").alias("pos", "nbr"))
    kept = exploded.join(
        F.broadcast(dead.select(F.col("id").alias("nbr"))), "nbr", "left_anti"
    )
    rebuilt = kept.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "nbr"))), lambda s: s["nbr"]
        ).alias("neighbors")
    )
    # restore rows whose whole neighbor list was deleted (groupBy dropped them)
    return (
        survivors.select("id")
        .join(rebuilt, "id", "left")
        .withColumn(
            "neighbors",
            F.coalesce(F.col("neighbors"), F.array().cast("array<bigint>")),
        )
    )


def insert_batch_adjacency(
    vectors: DataFrame,
    adjacency: DataFrame,
    new_vectors: DataFrame,
    maxdegree: int = 64,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    changed_only: bool = False,
    use_lsh: bool = False,
    dim: int | None = None,
    lsh_tables: int | None = None,
    alpha: float | None = None,
) -> DataFrame:
    """Incremental batch insert (micro-batch ``ann_insert!``).

    New points find neighbors among (existing ∪ new); back-link edges are
    merged into the touched existing rows only — untouched adjacency rows pass
    through unchanged (at scale: a MERGE touching O(batch * maxdegree) rows,
    not a rebuild).  ``changed_only=True`` returns JUST the touched/new rows
    (the MERGE delta) for the caller to append as a merge-on-read segment —
    the O(batch) write path; default returns the full merged table.

    ``alpha`` (opt-in): the touched-row re-prune runs alpha-diversified
    (alpha_prune_and_collect) over the merged candidate pool (old neighbors
    + new back-links) instead of nearest-k — the RobustPrune device that
    keeps a back-link to a FAR batch alive where nearest-k would prune it
    (the islanding caveat at index.insert_batch).  Default None =
    reference parity.
    """
    all_vecs = vectors.select(id_col, vec_col).unionByName(new_vectors.select(id_col, vec_col))
    if use_lsh:
        # the 100-TB ingest path: candidate generation via bucketed
        # sign-random-projection instead of batch x table brute force —
        # same shape as the bulk build's use_lsh (adjacency_edges)
        assert dim is not None, "dim required for LSH insert"
        knn = lsh_knn_join(
            new_vectors, all_vecs, k=maxdegree, dim=dim, metric=metric,
            n_tables=lsh_tables, left_id=id_col, right_id=id_col, vec_col=vec_col,
        )
    else:
        knn = brute_force_knn_join(
            new_vectors, all_vecs, k=maxdegree, metric=metric,
            left_id=id_col, right_id=id_col, vec_col=vec_col,
            broadcast_right=False, dim=dim,
        )
    if alpha is not None:
        # alpha candidates must include CROSS edges: a far batch's nearest
        # neighbors in (existing ∪ new) are all batch-internal, so the pool
        # would never even propose an old<->new edge for the diversified
        # prune to keep.  The DiskANN paper draws insert candidates from
        # the greedy search's VISITED set — which starts at the old-region
        # entrypoint and therefore always contains old nodes; the batch
        # analog is one extra new x EXISTING kNN join (same physical shape
        # and k as the main one).  No emptiness probes: an empty side just
        # yields an empty join branch — two extra driver-side jobs per
        # maintained batch would cost more than they save.
        if use_lsh:
            cross = lsh_knn_join(
                new_vectors, vectors, k=maxdegree, dim=dim, metric=metric,
                n_tables=lsh_tables, left_id=id_col, right_id=id_col,
                vec_col=vec_col,
            )
        else:
            cross = brute_force_knn_join(
                new_vectors, vectors, k=maxdegree, metric=metric,
                left_id=id_col, right_id=id_col, vec_col=vec_col,
                broadcast_right=False, dim=dim,
            )
        knn = knn.unionByName(cross)
    lcol, rcol = f"{id_col}_l", f"{id_col}_r"
    new_edges = (
        knn.select(
            F.explode(
                F.array(
                    F.struct(F.col(lcol).alias("id_l"), F.col(rcol).alias("id_r"), F.col("dist")),
                    F.struct(F.col(rcol).alias("id_l"), F.col(lcol).alias("id_r"), F.col("dist")),
                )
            ).alias("e")
        )
        .select("e.id_l", "e.id_r", "e.dist")
        .dropDuplicates(["id_l", "id_r"])
    )

    # existing adjacency rows of touched nodes -> edge form (need dist to re-prune)
    touched_ids = new_edges.select(F.col("id_l").alias("id")).distinct()
    touched = adjacency.join(touched_ids, "id", "left_semi")
    vec_by_id = all_vecs.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    dist_fn = resolve_metric(metric)
    old_edges = (
        touched.select(F.col("id").alias("id_l"), F.explode("neighbors").alias("id_r"))
        .join(vec_by_id.withColumnRenamed("_vid", "id_l").withColumnRenamed("_v", "_lv"), "id_l")
        .join(vec_by_id.withColumnRenamed("_vid", "id_r").withColumnRenamed("_v", "_rv"), "id_r")
        .select("id_l", "id_r", dist_fn(F.col("_lv"), F.col("_rv")).alias("dist"))
    )
    merged = new_edges.unionByName(old_edges).dropDuplicates(["id_l", "id_r"])
    if alpha is not None:
        repruned = alpha_prune_and_collect(
            merged, all_vecs, maxdegree, alpha, metric, id_col, vec_col, dim=dim
        )
    else:
        repruned = _prune_and_collect(merged, maxdegree)
    if changed_only:
        return repruned
    untouched = adjacency.join(touched_ids, "id", "left_anti")
    return untouched.unionByName(repruned)
