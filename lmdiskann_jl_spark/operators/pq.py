"""Product quantization (PQ) — vector compression for the 100-TB memory path.

Complements IVF/LSH/graph as the footprint lever (the public PQ design
popularized by FAISS; the reference stores raw Float16/32 vectors via mmap —
src/LMDiskANN.jl:40 — and has no compression story, SURVEY.md §2.6): the
vector dimension is split into ``m`` subspaces, each subspace gets its own
``k``-codeword codebook (seeded MLlib KMeans — deterministic), and every
vector is stored as ``m`` small codes (m bytes at k<=256 vs 4*dim raw — 32x
for dim=64/m=8).

Everything is DataFrame-native and JVM-side:

- build: one KMeans fit per subspace on slice(vec) — m tiny fits;
- encode: explode vectors into (id, sub, subvec), broadcast-join the m*k-row
  codebook, window-argmin per (id, sub), groupBy id to collect the code
  array — ONE shuffle keyed by id, codebook never shuffled;
- ADC search: the query's distance to every codeword is a driver-side
  m*k lookup table, embedded as an array-of-arrays literal; each row's
  approximate distance is a pure HOF expression over its code array
  (aggregate + element_at) — evaluated inside the scan stage, zero
  shuffles before the final top-k (TakeOrderedAndProject).

Quality gate: recall@k vs the exact scan (pytest + a_pq_recall rows-only
query) — KMeans is not SQL-expressible, so no DuckDB value oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_M = 8
DEFAULT_K = 32
PQ_SEED = 42


def build_pq(
    vectors: DataFrame,
    dim: int,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    vec_col: str = "vec",
    seed: int = PQ_SEED,
) -> DataFrame:
    """Fit per-subspace codebooks.  Returns (sub INT, code INT,
    centroid ARRAY<DOUBLE>) — m*k rows, broadcast-sized.

    ``dim`` must divide evenly by ``m`` (subspace width = dim/m).

    Training runs driver-side on a bounded seeded sample (operators/_kmeans:
    the FAISS-style contract — quantizer training saturates on a sample,
    encoding/search stay distributed); ONE sample collect covers all m
    subspace fits.
    """
    from lmdiskann_jl_spark.operators._kmeans import fit_kmeans, sample_matrix

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    width = dim // m
    spark = vectors.sparkSession
    X = sample_matrix(vectors, vec_col, seed=seed)
    rows = []
    for sub in range(m):
        centers = fit_kmeans(X[:, sub * width : (sub + 1) * width], k, seed=seed + sub)
        rows.extend(
            (sub, code, [float(x) for x in c]) for code, c in enumerate(centers)
        )
    return spark.createDataFrame(rows, "sub int, code int, centroid array<double>")


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = DEFAULT_M,
    id_col: str = "id",
    vec_col: str = "vec",
    use_arrow: bool = True,
) -> DataFrame:
    """Encode every vector as its per-subspace nearest codewords.

    Returns (id, codes ARRAY<INT>) with codes[sub] = argmin_code
    ||subvec - centroid||.  Zero shuffles, zero joins — encoding 100 TB
    costs exactly one pass over the data (the earlier explode + window +
    groupBy shape shuffled m x corpus rows twice).

    Two physical paths (the add_lsh_buckets precedent — dense linear
    algebra is the one place the "built-ins first" rule loses):

    - ``use_arrow`` (default): one Arrow-batched pandas_udf computing all
      m argmins per row with vectorized numpy (batch x k x width squared
      diffs per subspace).  The HOF form evaluates m*k interpreted fold
      chains (each with a zip_with allocation) per row — measured 2.0 s vs
      0.2 s for 2000 rows x 64 dims on 32 cores (optimization round 14).
      numpy's argmin keeps the first minimum, the same tie-break as
      ``array_position(min)``; codes verified identical to the HOF path on
      every fixture corpus (sub-ulp summation-order differences would only
      matter on exact distance ties, and identical vectors still encode
      identically by construction).
    - HOF column expressions (no Python at all) as the Arrow-free
      fallback: per row, per subspace, distances to the k codewords fold
      inside a HOF and ``array_position(min)`` picks the argmin (first-min
      tie-break = lowest code, deterministic).
    """
    width = dim // m
    cb = codebook.collect()
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(cb, key=lambda r: (r["sub"], r["code"])):
        books[r["sub"]].append([float(x) for x in r["centroid"]])
    from lmdiskann_jl_spark.operators.knn_join import _spread

    if use_arrow:
        from pyspark.sql.functions import pandas_udf

        B = [np.asarray(book, dtype=np.float64) for book in books]

        @pandas_udf("array<int>")
        def _codes(v: pd.Series) -> pd.Series:
            X = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
            out = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                sub = X[:, s * width : (s + 1) * width]  # (batch, w)
                d = sub[:, None, :] - B[s][None, :, :]  # (batch, k, w)
                dist = np.einsum("bkw,bkw->bk", d, d)  # (batch, k)
                out[:, s] = dist.argmin(axis=1)  # first-min, same tie-break
            return pd.Series(list(out))

        return _spread(vectors).select(
            F.col(id_col), _codes(F.col(vec_col).cast("array<double>")).alias("codes")
        )

    books_lit = F.array(
        *[
            F.array(*[F.array(*[F.lit(v) for v in c]) for c in book])
            for book in books
        ]
    )
    vec = F.col(vec_col).cast("array<double>")

    def sq_dist(subvec, cent):
        return F.aggregate(
            F.zip_with(subvec, cent, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def code_for(s):
        subvec = F.slice(vec, s * width + 1, width)
        dists = F.transform(
            F.element_at(books_lit, s + 1), lambda cent: sq_dist(subvec, cent)
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    # the HOF folds are compute-heavy per row: spread small-file inputs to
    # all cores (no-op on tables already partitioned wider)
    return _spread(vectors).select(F.col(id_col), codes.alias("codes"))


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query: Sequence[float],
    k: int = 10,
    m: int = DEFAULT_M,
    id_col: str = "id",
) -> DataFrame:
    """Asymmetric-distance top-k: exact query-to-codeword distances, coded
    database side.

    The m x n_codes lookup table is computed driver-side from the collected
    (tiny) codebook and embedded as a nested array literal, so each row's
    approximate distance is scan-stage arithmetic over its code array —
    no join, no shuffle, then one TakeOrderedAndProject for the top-k.
    Returns (id, adc_dist) nearest-first.
    """
    cb = codebook.collect()
    n_codes = max(r["code"] for r in cb) + 1
    width = len(cb[0]["centroid"])
    lut: list[list[float]] = [[0.0] * n_codes for _ in range(m)]
    for r in cb:
        sub, code, c = r["sub"], r["code"], r["centroid"]
        qs = query[sub * width : (sub + 1) * width]
        lut[sub][code] = float(sum((float(a) - float(b)) ** 2 for a, b in zip(qs, c)))
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    hof = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda code, sub: F.element_at(
                    F.element_at(lut_lit, sub + 1), code + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # unrolled codegen form (optimization round 14): same left-to-right sum
    # over the m lookups, guarded so a ragged code array keeps the HOF path
    acc = F.lit(0.0)
    for sub in range(m):
        acc = acc + F.element_at(
            F.element_at(lut_lit, sub + 1), F.col("codes")[sub] + 1
        )
    dist = F.when(F.size(F.col("codes")) == F.lit(m), F.sqrt(acc)).otherwise(hof)
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_search(
    codes: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    rerank: int = 100,
    m: int = DEFAULT_M,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """PQ search with exact rerank — the production shape: the compressed
    scan (ADC) shortlists ``rerank`` candidates, then ONLY those rows' raw
    vectors are fetched (broadcast semi-join — at 100 TB this is the whole
    point: the full-precision table is touched for `rerank` rows, not
    scanned) and re-scored exactly.  Returns (id, dist) nearest-first."""
    from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric

    shortlist = pq_adc_topk(codes, codebook, query, k=rerank, m=m, id_col=id_col)
    dist_fn = resolve_metric(metric)
    q = query_vector_lit(query)
    return (
        vectors.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), dist_fn(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_search(
    assigned_codes: DataFrame,
    cell_centroids: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 100,
    m: int = DEFAULT_M,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """IVF+PQ composition — the production ANN shape at 100 TB: partition
    pruning cuts the scan to nprobe/n_cells of the corpus, PQ codes cut the
    scanned bytes ~30x, and only the final ``rerank`` shortlist touches raw
    vectors.

    ``assigned_codes`` is (id, cell, codes) — the IVF cell assignment joined
    with PQ codes, stored partitioned by cell so the probe filter prunes at
    the file level (same layout contract as ``operators/ivf.write_ivf``).
    Returns (id, dist) nearest-first, exact distances on the shortlist.
    """
    from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric

    dist_fn = resolve_metric(metric)
    q = query_vector_lit(query)
    probes = [
        r["cell"]
        for r in cell_centroids.select(
            "cell", dist_fn(F.col("centroid"), q).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("cell").asc())
        .limit(nprobe)
        .collect()
    ]
    cand = assigned_codes.filter(F.col("cell").isin(probes))
    shortlist = pq_adc_topk(cand, codebook, query, k=rerank, m=m, id_col=id_col)
    return (
        vectors.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), dist_fn(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def _lut_rows(codebook_rows, queries, m: int, qid_col: str, qvec_col: str):
    """Driver-side (qid, lut) rows: one m x n_codes squared-distance lookup
    table per collected query (both inputs are tiny by contract)."""
    n_codes = max(r["code"] for r in codebook_rows) + 1
    width = len(codebook_rows[0]["centroid"])
    out = []
    for qr in queries:
        q = qr[qvec_col]
        lut = [[0.0] * n_codes for _ in range(m)]
        for r in codebook_rows:
            sub, code, c = r["sub"], r["code"], r["centroid"]
            qs = q[sub * width : (sub + 1) * width]
            lut[sub][code] = float(
                sum((float(a) - float(b)) ** 2 for a, b in zip(qs, c))
            )
        out.append((int(qr[qid_col]), lut))
    return out


def _adc_batch_scores(codes_with_qid: DataFrame, m: int) -> F.Column:
    """ADC distance over (codes, lut) columns — scan-stage arithmetic.
    Unrolled codegen form with a size guard (optimization round 14): the
    interpreted zip_with/aggregate fold is kept for ragged code arrays;
    the sum order is identical, so values are bit-for-bit equal."""
    hof = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda code, sub: F.element_at(
                    F.element_at(F.col("lut"), sub + 1), code + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    acc = F.lit(0.0)
    for sub in range(m):
        acc = acc + F.element_at(
            F.element_at(F.col("lut"), sub + 1), F.col("codes")[sub] + 1
        )
    return F.when(F.size(F.col("codes")) == F.lit(m), F.sqrt(acc)).otherwise(hof)


def pq_search_batch(
    codes: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 100,
    m: int = DEFAULT_M,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batched PQ search: per-query ADC shortlist + exact rerank for a whole
    queries DataFrame in ONE scan job (vs one scan per query in the driver
    loop).  The per-query LUTs are computed driver-side from the collected
    (tiny, m x k rows) codebook and broadcast as a (qid, lut) table; each
    code row is scored against every query's LUT inside the scan stage, a
    per-qid window keeps ``rerank`` candidates, and only those rows' raw
    vectors are fetched for the exact re-score.  Returns (qid, id, dist,
    rank <= k)."""
    from lmdiskann_jl_spark.functions.vector import resolve_metric

    spark = codes.sparkSession
    cb = codebook.collect()
    qsel = queries.select(qid_col, qvec_col)
    qrows = qsel.collect()
    # the exact-rerank join side below reuses the collected rows as a local
    # relation instead of re-executing the queries subtree (opt round 14)
    qlocal = spark.createDataFrame(qrows, qsel.schema)
    luts = spark.createDataFrame(
        _lut_rows(cb, qrows, m, qid_col, qvec_col),
        f"{qid_col} long, lut array<array<double>>",
    )
    scored = codes.crossJoin(F.broadcast(luts)).select(
        qid_col, F.col(id_col), _adc_batch_scores(codes, m).alias("adc_dist")
    )
    sw = Window.partitionBy(qid_col).orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    shortlist = (
        scored.withColumn("_rn", F.row_number().over(sw))
        .filter(F.col("_rn") <= rerank)
        .select(qid_col, id_col)
    )
    dist_fn = resolve_metric(metric)
    exact = (
        vectors.join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(qlocal), qid_col)
        .select(qid_col, F.col(id_col), dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivfpq_search_batch(
    assigned_codes: DataFrame,
    cell_centroids: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 100,
    m: int = DEFAULT_M,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batched IVF+PQ: per-query cell probing (broadcast centroids, window
    <= nprobe), one partition-pruned scan of the union of probed cells, ADC
    scoring against each probing query's LUT, exact rerank — the production
    batch shape.  Returns (qid, id, dist, rank <= k)."""
    from lmdiskann_jl_spark.functions.vector import resolve_metric

    spark = assigned_codes.sparkSession
    qsel = queries.select(qid_col, qvec_col)
    qrows = qsel.collect()
    # reused for the LUTs AND (as a local relation) the exact-rerank join
    qlocal = spark.createDataFrame(qrows, qsel.schema)
    dist_fn = resolve_metric(metric)
    cw = Window.partitionBy(qid_col).orderBy(F.col("_cd").asc(), F.col("cell").asc())
    probes_df = (
        queries.crossJoin(F.broadcast(cell_centroids))
        .withColumn("_cd", dist_fn(F.col(qvec_col), F.col("centroid")))
        .withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") <= nprobe)
        .select(qid_col, "cell")
    )
    # collect the probe table ONCE; the broadcast join side is re-created
    # as a local relation instead of re-executing the probe subtree as a
    # second job (optimization round 14, guide §1.2 — n_queries x nprobe
    # rows, driver-sized by contract)
    probe_rows = probes_df.collect()
    cell_list = sorted({r["cell"] for r in probe_rows})
    probes = spark.createDataFrame(probe_rows, probes_df.schema)
    cb = codebook.collect()
    luts = spark.createDataFrame(
        _lut_rows(cb, qrows, m, qid_col, qvec_col),
        f"{qid_col} long, lut array<array<double>>",
    )
    cand = (
        assigned_codes.filter(F.col("cell").isin(cell_list))
        .join(F.broadcast(probes), "cell")
        .join(F.broadcast(luts), qid_col)
    )
    scored = cand.select(qid_col, F.col(id_col), _adc_batch_scores(cand, m).alias("adc_dist"))
    sw = Window.partitionBy(qid_col).orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    shortlist = (
        scored.withColumn("_rn", F.row_number().over(sw))
        .filter(F.col("_rn") <= rerank)
        .select(qid_col, id_col)
    )
    exact = (
        vectors.join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(qlocal), qid_col)
        .select(qid_col, F.col(id_col), dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
