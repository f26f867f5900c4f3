"""Exact top-k similarity search (the engine's exact mode + correctness oracle).

Reference parity:
- public ``search(index, q; topk, ef)`` (``/root/reference/src/LMDiskANN.jl:455-481``)
  guards the empty index, promotes ``ef = max(topk, ef)``, re-scores candidates
  with the true metric, sorts ascending and takes ``min(topk, n)``;
- the tests' oracle ``brute_force_topk`` (``test/runtests.jl:403-408``) is an
  exact full scan — which is exactly what this operator computes, so exact mode
  trivially achieves recall 1.0 against the reference's >= 0.70 bar.

Spark-first shape:
- single query: scan -> project dist -> ``orderBy(dist).limit(k)``; Catalyst
  compiles this to ``TakeOrderedAndProject`` — a per-partition bounded heap and
  a k-row driver merge, NO global sort, NO shuffle of the data.  At 100 TB this
  is the optimal exact plan: one pass, map-side top-k, k rows moved.
- batched queries: broadcast the (small) query set, crossJoin against vectors,
  per-query window top-k.  The window ranks within ``qid`` after a shuffle of
  only (qid, id, dist) triples — vectors themselves are never shuffled.  Spark
  3.5+ rewrites ``row_number() <= k`` windows to ``WindowGroupLimit`` (partial
  group-limit before the shuffle), keeping shuffle volume ~ n_queries * k per
  partition.

Ties are broken by ascending id so results are deterministic (the driver's
hash-compare and the DuckDB oracle need a unique answer set).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric


def exact_topk(
    vectors: DataFrame,
    query: Sequence[float] | Column,
    k: int = 10,
    metric: str = "euclidean",
    vec_col: str = "vec",
    id_col: str = "id",
    extra_cols: Sequence[str] = (),
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k nearest rows to one query vector.

    Returns ``(id_col, *extra_cols, dist)`` sorted by (dist, id) ascending —
    the Spark form of the reference's ``search`` with ef = n (exact).

    ``dim``: static vector dimension hint — routes the distance through the
    codegen'd unrolled kernel (functions/vector.py), bit-identical to the
    HOF form.
    """
    dist_fn = resolve_metric(metric, dim)
    q = query_vector_lit(query) if not isinstance(query, Column) else query
    cols = [id_col, *extra_cols]
    return (
        vectors.select(*cols, dist_fn(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def batch_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    metric: str = "euclidean",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    vec_col: str = "vec",
    id_col: str = "id",
    tiebreak_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Top-k per query for a batch of queries.

    ``queries`` is expected to be small relative to ``vectors`` (it is
    broadcast); output is ``(qid, id, dist, rank)`` with rank 1..k per qid.

    ``tiebreak_col`` (must exist in ``vectors``): break distance ties on
    this column instead of ``id_col`` — e.g. a user key, whose order is
    stable across index rebuilds while internal id assignment order is not.
    The tiebreak decides the ranking (including which row survives the
    top-k boundary) but is dropped from the output.  ``dim``: static vector
    dimension hint for the codegen'd distance kernel (bit-identical).
    """
    dist_fn = resolve_metric(metric, dim)
    from lmdiskann_jl_spark.operators.knn_join import _spread

    tb = tiebreak_col or id_col
    cols = [id_col, vec_col] if tb == id_col else [id_col, tb, vec_col]
    scored = (
        _spread(vectors.select(*cols))
        .crossJoin(F.broadcast(queries.select(qid_col, qvec_col)))
        .select(
            qid_col,
            id_col,
            *([tb] if tb != id_col else []),
            dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(tb).asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return out.drop(tb) if tb != id_col else out


def knn_classify(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    metric: str = "euclidean",
    label_col: str = "label",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    vec_col: str = "vec",
    id_col: str = "id",
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """k-NN majority-vote classification: each query takes the modal label of
    its k nearest labeled vectors.  ``exclude_self`` drops id == qid matches
    (for queries drawn from the corpus itself — leave-one-out scoring); set
    it False when qids are not in the vectors' id space.

    Same physical shape as ``batch_topk`` — broadcast queries, scan-side
    distance, ``WindowGroupLimit``-pruned per-query top-k — plus one tiny
    (n_queries x n_labels) vote aggregation.  Vectors are never shuffled;
    the label ride-along adds one column to the triples.  Ties: most votes,
    then smallest label (deterministic for the oracle hash-compare).

    Returns ``(qid, pred_label, votes)``.
    """
    dist_fn = resolve_metric(metric, dim)
    from lmdiskann_jl_spark.operators.knn_join import _spread

    scored = (
        _spread(vectors.select(id_col, label_col, vec_col))
        .crossJoin(F.broadcast(queries.select(qid_col, qvec_col)))
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(qid_col))
    scored = (
        scored.select(
            qid_col,
            id_col,
            label_col,
            dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    votes = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .groupBy(qid_col, label_col)
        .agg(F.count("*").alias("votes"))
    )
    wv = Window.partitionBy(qid_col).orderBy(F.col("votes").desc(), F.col(label_col).asc())
    return (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select(qid_col, F.col(label_col).alias("pred_label"), "votes")
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
) -> float:
    """|approx ∩ exact| / k averaged over queries — the reference's standing
    correctness gate (``test/runtests.jl:53-61,431-454,510-531``; bar >= 0.70).

    Both inputs are (qid, id) result sets (extra columns ignored).
    """
    a = approx.select(qid_col, id_col)
    e = exact.select(qid_col, id_col)
    hits = a.join(e, [qid_col, id_col], "inner").groupBy(qid_col).count()
    per_q = e.select(qid_col).distinct().join(hits, qid_col, "left").select(
        F.coalesce(F.col("count"), F.lit(0)).alias("hits")
    )
    row = per_q.agg(F.avg(F.col("hits") / F.lit(float(k))).alias("recall")).collect()[0]
    return float(row["recall"]) if row["recall"] is not None else 0.0


MMR_MAX_CANDIDATES = 10_000


def _mmr_greedy(
    ids, rel, X, k: int, lam: float, strict_fold: bool = False
) -> list[tuple]:
    """The shared greedy MMR kernel (Carbonell & Goldstein, SIGIR 1998):
    pick argmax ``lam * rel(d) - (1 - lam) * max_cos_sim(d, S)`` until k.
    Deterministic ties (score desc, id asc); zero-norm vectors contribute
    similarity 0; one O(N*d) similarity column per pick — never the full
    N x N Gram matrix.  Returns [(id, score, rank), ...] in pick order.

    ``strict_fold=True`` computes norms and dot products as LEFT-TO-RIGHT
    pure-float folds (bit-identical to the DuckDB ``list_reduce`` mirrors in
    plans/oracle_sql.py) and returns UNROUNDED scores — the arithmetic mode
    the a_mmr_rerank hash gate replays step-by-step in SQL.  The default
    numpy path (BLAS summation order, round-6 scores) is the production
    kernel; pick-sequence parity between the two is pytest-gated."""
    if strict_fold:
        return _mmr_greedy_strict(ids, rel, X, k, lam)
    import numpy as np

    rel = np.asarray(rel, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = np.inf  # zero vectors: similarity 0 to everything
    Xn = X / norms[:, None]

    selected: list[int] = []
    # max sim to the selected set so far; -inf so a NEGATIVE max similarity
    # (anti-correlated candidate) correctly BOOSTS the score rather than
    # being floored at zero
    best_sim = np.full(len(ids), -np.inf)
    out = []
    remaining = set(range(len(ids)))
    for rank in range(1, min(k, len(ids)) + 1):
        if selected:
            score = lam * rel - (1 - lam) * best_sim
        else:
            score = lam * rel
        pick = min(remaining, key=lambda i: (-score[i], ids[i]))
        out.append((ids[pick], float(round(score[pick], 6)), rank))
        selected.append(pick)
        remaining.discard(pick)
        best_sim = np.maximum(best_sim, Xn @ Xn[pick])
    return out


def _mmr_greedy_strict(ids, rel, X, k: int, lam: float) -> list[tuple]:
    """Left-to-right-fold variant of ``_mmr_greedy`` — every norm and dot is
    a sequential float accumulation, so each similarity is bit-identical to
    ``oracle_sql.dot``/``norm`` (DuckDB ``list_reduce``) over the same
    values, and ``lam * rel - (1 - lam) * best`` is the same three IEEE ops
    both engines run.  O(N*d) per pick like the numpy path; intended for
    bounded gate inputs, not a numpy replacement."""
    import math

    n = len(ids)
    one_minus_lam = 1 - lam
    xs = [[float(v) for v in row] for row in X]
    nvecs: list[list[float] | None] = []
    for row in xs:
        s = 0.0
        for v in row:
            s += v * v
        nrm = math.sqrt(s)
        nvecs.append([v / nrm for v in row] if nrm > 0.0 else None)

    def sim(i: int, j: int) -> float:
        a, b = nvecs[i], nvecs[j]
        if a is None or b is None:
            return 0.0
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    selected: list[int] = []
    best = [float("-inf")] * n
    out = []
    remaining = set(range(n))
    for rank in range(1, min(k, n) + 1):
        if selected:
            score = {i: lam * rel[i] - one_minus_lam * best[i] for i in remaining}
        else:
            score = {i: lam * rel[i] for i in remaining}
        pick = min(remaining, key=lambda i: (-score[i], ids[i]))
        out.append((ids[pick], float(score[pick]), rank))
        selected.append(pick)
        remaining.discard(pick)
        for i in remaining:
            s = sim(i, pick)
            if s > best[i]:
                best[i] = s
    return out


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    exact: bool = False,
    strict_fold: bool = False,
) -> DataFrame:
    """Maximal-marginal-relevance diversification.

    MMR is inherently sequential (each pick changes the next argmax), so the
    final greedy runs driver-side over a BOUNDED set — the candidate set is
    the OUTPUT of a distributed leg (top-N scan/IVF/BM25).  Up to
    MMR_MAX_CANDIDATES rows that set is collected directly (the
    final-rerank analog of the bounded-sample k-means contract in
    operators/_kmeans); PAST the cap the call auto-dispatches to the
    two-stage distributed form (mmr_rerank_distributed) — per-partition
    greedy prunes to a bounded winner pool, the exact greedy reruns on the
    pool driver-side — and emits a UserWarning, since the two-stage result
    is approximate when a global pick loses its partition's local cut.
    Pass ``exact=True`` to get the pre-dispatch contract back: a ValueError
    past the cap instead of a silent approximation.

    Returns (id_col, mmr_score DOUBLE, rank LONG) with rank 1..k in pick
    order.
    """
    from pyspark.sql import types as T

    id_field = candidates.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("mmr_score", T.DoubleType(), False),
            T.StructField("rank", T.LongType(), False),
        ]
    )
    rows = candidates.select(id_col, rel_col, vec_col).limit(
        MMR_MAX_CANDIDATES + 1
    ).collect()
    if len(rows) > MMR_MAX_CANDIDATES:
        if exact:
            raise ValueError(
                f"mmr_rerank(exact=True): candidate set exceeds "
                f"MMR_MAX_CANDIDATES={MMR_MAX_CANDIDATES}; pre-reduce with a "
                "top-N leg or call mmr_rerank_distributed explicitly"
            )
        import warnings

        warnings.warn(
            f"mmr_rerank: candidate set exceeds MMR_MAX_CANDIDATES="
            f"{MMR_MAX_CANDIDATES}; dispatching to the two-stage "
            "mmr_rerank_distributed form (approximate when a global pick "
            "loses its partition's local cut). Pass exact=True to forbid.",
            UserWarning,
            stacklevel=2,
        )
        return mmr_rerank_distributed(
            candidates, k=k, lam=lam, id_col=id_col, rel_col=rel_col, vec_col=vec_col
        )
    if not rows:
        return candidates.sparkSession.createDataFrame([], out_schema)
    out = _mmr_greedy(
        [r[id_col] for r in rows],
        [float(r[rel_col]) for r in rows],
        [r[vec_col] for r in rows],
        k, lam, strict_fold=strict_fold,
    )
    return candidates.sparkSession.createDataFrame(out, out_schema)


def mmr_rerank_distributed(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    per_partition: int | None = None,
) -> DataFrame:
    """Two-stage MMR for candidate sets past MMR_MAX_CANDIDATES.

    Stage 1 (distributed, mapInPandas): each partition runs the SAME greedy
    kernel locally and keeps its ``per_partition`` winners (default 4k —
    over-fetch so a diverse global pick survives local pruning; measured
    exact-parity on the multi-partition pytest fixture at 2k it is not).  Stage 2
    (driver): the exact greedy reruns from scratch over the pooled winners
    (<= n_partitions * per_partition rows, enforced <= MMR_MAX_CANDIDATES).

    The two-stage result equals the exact greedy whenever every globally
    picked candidate survives its partition's local cut — guaranteed for
    single-partition inputs, and gated by a pytest parity test on
    multi-partition fixtures.  At 100 TB the candidate leg is already a
    top-N; this form removes the single-driver collect ceiling without
    moving the sequential greedy off the driver."""
    import pandas as pd

    if per_partition is None:
        per_partition = max(k, 4 * k)
    if per_partition > MMR_MAX_CANDIDATES // 2:
        raise ValueError(
            f"mmr k={k} implies a per-partition pool past MMR_MAX_CANDIDATES"
            f"={MMR_MAX_CANDIDATES}; MMR at that k is not a rerank — "
            "use a plain top-N leg"
        )

    n_parts = candidates.rdd.getNumPartitions()
    pool_bound = n_parts * per_partition
    if pool_bound > MMR_MAX_CANDIDATES:
        # keep the driver pool bounded regardless of input partitioning
        candidates = candidates.coalesce(
            max(1, MMR_MAX_CANDIDATES // per_partition)
        )

    slim = candidates.select(id_col, rel_col, vec_col)
    schema = slim.schema

    def _partition_mmr(batches):
        parts = list(batches)
        if not parts:  # empty partition: pd.concat([]) would raise
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        winners = _mmr_greedy(
            list(pdf[id_col]),
            list(pdf[rel_col].astype(float)),
            list(pdf[vec_col]),
            per_partition, lam,
        )
        keep = {w[0] for w in winners}
        yield pdf[pdf[id_col].isin(keep)]

    pooled = slim.mapInPandas(_partition_mmr, schema)
    return mmr_rerank(
        pooled, k=k, lam=lam, id_col=id_col, rel_col=rel_col, vec_col=vec_col
    )
