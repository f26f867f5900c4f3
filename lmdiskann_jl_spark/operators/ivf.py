"""IVF (inverted-file) index — the clustered scale path for ANN search.

Complements the LSH path (knn_join.py) and the graph path (graph.py/beam.py)
as the third similarity-search strategy (SURVEY.md §7 step 9; the public
IVF-Flat design popularized by FAISS).  Everything is DataFrame-native:

- build: MLlib KMeans (seeded, deterministic) fits centroids on a sample;
  every vector is assigned to its nearest centroid with one broadcast
  join + window (no shuffle of the vectors beyond the final
  partitionBy-cell write);
- search: score the query against the (tiny, broadcast) centroid table,
  pick ``nprobe`` cells, then scan ONLY those cells — with the vectors
  table written partitioned by ``cell``, Catalyst partition-prunes the scan
  down to nprobe/n_cells of the data.  At 100 TB with 4096 cells and
  nprobe=64, each query touches ~1.5% of the table.

The exact same top-k machinery (TakeOrderedAndProject) runs inside the
probed cells, so results are exact-within-probed-cells; recall is tuned by
nprobe (gated by the reference's >= 0.70 bar in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric

# per-task bound on the (batch, cell-chunk, dim) float64 intermediate in the
# Arrow euclidean assignment — tests shrink this to force multi-chunk runs
_ARROW_CHUNK_BYTES = 64_000_000


def build_ivf(
    vectors: DataFrame,
    n_cells: int = 16,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
    sample_fraction: float | None = None,
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit centroids and assign every vector to its nearest cell.

    Returns (centroids(cell INT, centroid ARRAY<DOUBLE>),
             assigned(id, vec, cell)).  Centroid training runs driver-side
    on a bounded seeded sample (operators/_kmeans — deterministic);
    assignment is a broadcast crossJoin + window argmin, one distributed
    pass over the data.
    """
    from lmdiskann_jl_spark.operators._kmeans import fit_kmeans, sample_matrix

    fit_vecs = vectors
    if sample_fraction:
        fit_vecs = vectors.sample(fraction=sample_fraction, seed=seed)
    X = sample_matrix(fit_vecs, vec_col, seed=seed)
    spark = vectors.sparkSession
    centroids = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(fit_kmeans(X, n_cells, seed=seed))
        ],
        "cell int, centroid array<double>",
    )
    assigned = assign_cells(vectors, centroids, metric, id_col, vec_col, dim=dim)
    return centroids, assigned


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    dim: int | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """Nearest-centroid assignment in ONE pass over the data — zero
    shuffles, zero windows (the earlier crossJoin + per-id window shuffled
    the whole corpus once).  Small-file inputs are spread across cores.
    ``dim`` is accepted for call-site symmetry but ignored: the measured
    note below explains why the unrolled kernel loses on this shape.

    Two physical paths (the add_lsh_buckets / pq_encode precedent — dense
    linear algebra is the one place the "built-ins first" rule loses):

    - ``use_arrow`` (default, euclidean/sqeuclidean/cosine): one
      Arrow-batched pandas_udf scoring every centroid per batch with
      vectorized numpy; argmin keeps the first minimum — the same
      tie-break as ``array_position(min)`` over the cell-sorted centroid
      list.  Assignments verified identical to the HOF path on every
      fixture corpus for both gate metrics (optimization round 14; the
      HOF-literal form paid ~1.2 s of py4j literal construction plus an
      interpreted n_cells-chain fold per row on every call).
    - HOF column expressions (no Python at all) for other metrics or
      Arrow-free environments: the (tiny, broadcast-sized by construction)
      centroid table collects to a nested array literal, per-row distances
      fold in a HOF, and the argmin is ``array_position(min)`` — first-min
      tie-break = lowest cell, matching the previous window's (dist, cell)
      ordering.
    """
    from lmdiskann_jl_spark.operators.knn_join import _spread

    cents = sorted(centroids.collect(), key=lambda r: r["cell"])
    if use_arrow and metric in ("euclidean", "sqeuclidean", "cosine"):
        from pyspark.sql.functions import pandas_udf

        C = np.asarray(
            [[float(x) for x in r["centroid"]] for r in cents], dtype=np.float64
        )
        ids = np.asarray([int(r["cell"]) for r in cents], dtype=np.int32)
        is_cos = metric == "cosine"
        Cn = np.linalg.norm(C, axis=1) if is_cos else None

        @pandas_udf("int")
        def _cell(v: pd.Series) -> pd.Series:
            X = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
            if is_cos:
                d = 1.0 - (X @ C.T) / (
                    np.linalg.norm(X, axis=1)[:, None] * Cn[None, :]
                )
                # argmin keeps the FIRST minimum = lowest cell (cents sorted)
                return pd.Series(ids[d.argmin(axis=1)])
            # euclidean/sqeuclidean: exact squared distances, computed over
            # CELL CHUNKS so the (batch, chunk, dim) intermediate stays
            # bounded (~64 MB) — the unchunked broadcast-difference form
            # materialized (batch x n_cells x dim) doubles, ~5 GB/task at
            # n_cells=1024/dim=64/10k-row batches (round-15 fix; the matmul
            # form was rejected: its rounding differs from the exact
            # per-pair subtraction, which could flip argmin on near-ties —
            # chunking keeps every float op identical to the r14 path).
            chunk = max(1, _ARROW_CHUNK_BYTES // max(1, X.shape[0] * X.shape[1] * 8))
            best_d = None
            best_i = None
            for lo in range(0, C.shape[0], chunk):
                diff = X[:, None, :] - C[None, lo : lo + chunk, :]
                d = np.einsum("bkw,bkw->bk", diff, diff)
                am = d.argmin(axis=1)  # first minimum within the chunk
                dm = d[np.arange(d.shape[0]), am]
                if best_d is None:
                    best_d, best_i = dm, am + lo
                else:
                    upd = dm < best_d  # strict: earlier chunk wins ties
                    best_d = np.where(upd, dm, best_d)
                    best_i = np.where(upd, am + lo, best_i)
            return pd.Series(ids[best_i])

        return _spread(vectors).select(
            id_col, vec_col,
            _cell(F.col(vec_col).cast("array<double>")).alias("cell"),
        )

    # The metric deliberately resolves WITHOUT the dim fast path here: an
    # n_cells-wide array of guarded unrolled kernels over literal centroid
    # arrays was measured (n_cells=16, dim=64, sf0.1) at 34.3 s of driver
    # construction + 9.5 s execution — the ~40k-node expression overflows
    # whole-stage codegen into interpreted evaluation of every guard AND
    # its HOF fallback branch — vs 1.2 s + 0.5 s for this plain HOF
    # transform over the broadcast centroid literal.  (Optimization round
    # 14: the earlier "codegen'd array constructor" variant of this site
    # was re-measured and reverted.)
    dist_fn = resolve_metric(metric)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in r["centroid"]]) for r in cents]
    )
    cells_lit = F.array(*[F.lit(int(r["cell"])) for r in cents])
    dists = F.transform(cent_lit, lambda c: dist_fn(F.col(vec_col), c))
    idx = F.array_position(dists, F.array_min(dists)).cast("int")
    return _spread(vectors).select(
        id_col, vec_col, F.element_at(cells_lit, idx).alias("cell")
    )


def write_ivf(assigned: DataFrame, path: str) -> None:
    """Persist the assigned table partitioned by cell — the layout that makes
    probe-time partition pruning free (scan reads only probed cells)."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """Top-k over the nprobe nearest cells only.

    ``assigned.filter(cell IN probes)`` partition-prunes when ``assigned``
    is read from a cell-partitioned layout (write_ivf).  Returns
    (id, dist, cell) nearest-first.
    """
    dist_fn = resolve_metric(metric, dim)
    q = query_vector_lit(query)
    probes = [
        r["cell"]
        for r in centroids.select("cell", dist_fn(F.col("centroid"), q).alias("d"))
        .orderBy(F.col("d").asc(), F.col("cell").asc())
        .limit(nprobe)
        .collect()
    ]
    return (
        assigned.filter(F.col("cell").isin(probes))
        .select(id_col, "cell", dist_fn(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_search_batch(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    tiebreak_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Batched IVF probe: per-query top-k for a whole queries DataFrame in
    ONE job — the batch amortization the single-query probe lacks.

    Per-query probe cells are computed against the broadcast centroid table
    (tiny crossJoin + window), collected ONCE — one row per query,
    (qid, qvec, probed cells), so the driver payload is
    n_queries x (dim + nprobe), not n_queries x nprobe x dim — and re-fed
    as a local relation (round 14/15); the scan is then filtered to the
    UNION of all probed cells (a static isin list -> partition-pruned) and
    each row is scored only against the queries that probed its cell
    (equi-join on cell, never queries x corpus).  Returns
    (qid, id, dist, rank <= k).

    ``tiebreak_col`` (must exist in ``assigned``): break distance ties on
    this column instead of ``id_col`` — same contract as
    ``topk.batch_topk``; the column is dropped from the output.
    """
    dist_fn = resolve_metric(metric, dim)
    cw = Window.partitionBy(qid_col).orderBy(F.col("_cd").asc(), F.col("cell").asc())
    probes_df = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_cd", dist_fn(F.col(qvec_col), F.col("centroid")))
        .withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") <= nprobe)
        .select(qid_col, qvec_col, "cell")
    )
    # the union of probed cells collects to a tiny literal list so the scan
    # partition-prunes statically (a derived semi-join would rely on DPP).
    # The probe table is collected ONCE and re-created as a local relation
    # for the join side (optimization round 14, guide §1.2: the broadcast
    # build used to re-execute the whole probe subtree — crossJoin + window
    # — as a second job).  Round 15: the collect is grouped to ONE row per
    # query (qid, qvec, cells) — qvec crosses the driver once, not nprobe
    # times — then expanded locally; same-keyed groupBy, so no extra
    # exchange or job.  n_queries rows are driver-sized by contract.
    agg_rows = (
        probes_df.groupBy(qid_col)
        .agg(F.first(qvec_col).alias(qvec_col), F.collect_list("cell").alias("_cells"))
        .collect()
    )
    cell_list = sorted({c for r in agg_rows for c in r["_cells"]})
    probe_rows = [(r[qid_col], r[qvec_col], c) for r in agg_rows for c in r["_cells"]]
    probes = probes_df.sparkSession.createDataFrame(probe_rows, probes_df.schema)
    cand = assigned.filter(F.col("cell").isin(cell_list))
    tb = tiebreak_col or id_col
    scored = cand.join(F.broadcast(probes), "cell").select(
        qid_col,
        id_col,
        *([tb] if tb != id_col else []),
        dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(tb).asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return out.drop(tb) if tb != id_col else out
