"""Distributed greedy beam search over the kNN graph.

Reference parity: ``_search_graph`` (``/root/reference/src/LMDiskANN.jl:383-431``)
is Algorithm 1 of the LM-DiskANN paper — greedy best-first from a single
entrypoint, an ``ef``-bounded result list, early termination when the best
unexpanded candidate is worse than the worst retained result (``:404-406``).

Spark shape (SURVEY.md sections 3-4): the sequential ``while`` loop is
data-dependent iteration — not expressible as one Catalyst plan — so the
driver orchestrates a bounded loop of set-at-a-time jobs (the GraphFrames/
Pregel pattern).  Each hop:

    frontier ids -> FETCH adjacency rows (point lookup) -> neighbor ids
                 -> FETCH unseen vectors (point lookup) -> score -> keep best ef

Instead of popping ONE nearest candidate per iteration (the reference's
``:401-402``), each hop expands the WHOLE frontier — a set-at-a-time
generalization that converges in O(graph diameter) hops instead of O(ef)
pops.  Termination mirrors ``:404-406``: stop when no unvisited candidate
improves on the current ef-worst, or after ``max_hops``.

Scale notes — this is the reference's mmap O(1) record addressing
re-expressed as storage pruning: the index stores ``vectors`` and
``adjacency`` hive-partitioned by an id bucket (``_b = id % N``,
sources/tables.py), and the ``vectors_fetch`` / ``adjacency_fetch``
callables (index.py builds them) turn each hop into a PARTITION-PRUNED point
lookup — the scan touches only the buckets holding frontier/neighbor ids
and scores only the fetched rows.  The earlier shape (score ALL vectors,
semi-join per hop) re-scanned the full table every hop: ~12 full scans per
query loses to one exact scan at 100x scale, which would make the graph
path pointless.  Distances are computed on <= ef*maxdegree fetched rows per
hop; driver state is ids+distances only (KBs).  ``stats`` (optional dict)
records rows fetched/scored so tests can assert the per-hop scan volume
stays far below table size.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import query_vector_lit, resolve_metric

# literal-isin fetch below this many ids; broadcast semi-join above (plan size)
_ISIN_LIMIT = 512


def _pick_entrypoints(vectors: DataFrame, id_col: str, n: int) -> list[int]:
    """``n`` deterministic, spread-out seed ids in ONE TakeOrdered job.

    The reference seeds from a single stored entrypoint (its ``:549-561``);
    the natural Spark generalization (SURVEY §4) is a SET of seeds so the
    greedy walk starts in several graph regions at once — fewer hops to
    reach the query's neighborhood, and robustness to a poorly-placed single
    seed.  Content-hash order is a uniform spread over the id space without
    a clustering pass; callers with an IVF index can pass cell medoids via
    ``entrypoints`` instead."""
    rows = (
        vectors.select(F.col(id_col).alias("id"))
        .orderBy(F.xxhash64(F.col("id")).asc(), F.col("id").asc())
        .limit(n)
        .collect()
    )
    return [int(r["id"]) for r in rows]


def _resolve_seeds(
    vectors: DataFrame,
    id_col: str,
    entrypoint: int | None,
    entrypoints: Sequence[int] | None,
    n_entrypoints: int,
) -> list[int]:
    if entrypoints is not None:
        return [int(e) for e in entrypoints]
    if entrypoint is not None and entrypoint >= 0:
        return [int(entrypoint)]
    return _pick_entrypoints(vectors, id_col, max(1, n_entrypoints))


def default_fetcher(df: DataFrame, id_col: str = "id") -> Callable[[Sequence[int]], DataFrame]:
    """Row fetch for tables WITHOUT a bucket layout: literal isin for small
    id sets, broadcast semi-join beyond (same split as the delete path).
    Index-managed tables get the partition-pruned fetcher from index.py
    instead."""

    def fetch(ids: Sequence[int]) -> DataFrame:
        vals = sorted({int(i) for i in ids})
        if not vals:
            return df.filter(F.lit(False))
        if len(vals) <= _ISIN_LIMIT:
            # one parsed IN string, not isin(): the DSL pays one py4j
            # round-trip per literal (round 15 — see index._fetcher)
            return df.filter(F.expr(f"`{id_col}` IN ({','.join(map(str, vals))})"))
        ids_df = F.broadcast(
            df.sparkSession.createDataFrame([(i,) for i in vals], f"{id_col} long")
        )
        return df.join(ids_df, id_col, "left_semi")

    return fetch


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
    vectors_fetch: Callable[[Sequence[int]], DataFrame] | None = None,
    adjacency_fetch: Callable[[Sequence[int]], DataFrame] | None = None,
    stats: dict | None = None,
    entrypoints: Sequence[int] | None = None,
    n_entrypoints: int = 1,
) -> DataFrame:
    """Approximate top-ef candidates for ``query`` via graph traversal.

    Returns a DataFrame (id, dist) of <= ef candidates, re-scored with the
    true metric (the reference re-scores at :465-471 — here scores are already
    true distances).  Caller applies orderBy/limit for final top-k.

    Seeding: an explicit ``entrypoints`` list (e.g. IVF cell medoids) >
    a single ``entrypoint`` id > ``n_entrypoints`` auto-picked spread seeds
    (see _pick_entrypoints).  Multi-seed starts the walk in several graph
    regions at once, cutting hops to convergence.
    """
    spark = vectors.sparkSession
    dist_fn = resolve_metric(metric)
    q = query_vector_lit(query)
    fetch_vec = vectors_fetch or default_fetcher(vectors, id_col)
    fetch_adj = adjacency_fetch or default_fetcher(adjacency, "id")

    def score_ids(ids: Sequence[int]) -> list:
        if not ids:
            return []
        rows = (
            fetch_vec(ids)
            .select(F.col(id_col).alias("id"), dist_fn(F.col(vec_col), q).alias("dist"))
            .collect()
        )
        if stats is not None:
            stats["rows_scored"] = stats.get("rows_scored", 0) + len(rows)
        return rows

    seeds = _resolve_seeds(vectors, id_col, entrypoint, entrypoints, n_entrypoints)
    seed = score_ids(seeds)
    if not seed:
        return spark.createDataFrame([], "id long, dist double")

    # driver-side state: visited set + ef-bounded best list (ids+dists only —
    # a few KB; vectors themselves never leave the executors)
    best: dict[int, float] = {int(r["id"]): float(r["dist"]) for r in seed}
    visited: set[int] = set()
    frontier: list[int] = sorted(best, key=best.get)

    for _ in range(max_hops):
        if not frontier:
            break
        adj_rows = fetch_adj(frontier).select("id", "neighbors").collect()
        if stats is not None:
            stats["hops"] = stats.get("hops", 0) + 1
        visited.update(frontier)
        nbr_ids = {int(n) for r in adj_rows for n in r["neighbors"]}
        new_scored = score_ids(sorted(nbr_ids - visited - set(best)))
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
    vectors_fetch: Callable[[Sequence[int]], DataFrame] | None = None,
    adjacency_fetch: Callable[[Sequence[int]], DataFrame] | None = None,
    stats: dict | None = None,
    entrypoints: Sequence[int] | None = None,
    n_entrypoints: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Beam search for a BATCH of queries in one shared driver loop.

    All queries advance together: each hop fetches the union of all
    frontiers' adjacency rows in ONE pruned lookup, derives per-query
    candidates driver-side (set arithmetic on ids — KBs), then fetches and
    scores the union of unseen candidate vectors in ONE more pruned lookup
    (every (query, candidate) pair scored via a broadcast of the query set).
    The per-hop job count is constant in the number of queries — the batch
    amortization the single-query loop lacks.  Per-query ef-bounded beams
    and early termination live driver-side.

    Returns (qid, id, dist) — up to ef candidates per query, true-metric
    scored; caller applies per-qid window top-k.
    """
    spark = vectors.sparkSession
    dist_fn = resolve_metric(metric, dim)  # callers pass dim only for
    # large per-hop score sets; the declared gates leave it None (the
    # unrolled tree costs more in per-hop plan analysis than it saves)
    q_small = F.broadcast(queries.select(qid_col, qvec_col))
    # qid type follows the caller's queries schema (nothing restricts it to
    # long — string qids are valid); all driver-built frames use it
    qid_type = queries.schema[qid_col].dataType.simpleString()
    fetch_vec = vectors_fetch or default_fetcher(vectors, id_col)
    fetch_adj = adjacency_fetch or default_fetcher(adjacency, "id")

    def score(pairs: list) -> list:
        """[(qid, id)] candidate pairs -> collected (qid, id, dist) rows.
        One pruned vector fetch for the id union; pairs and queries are
        broadcast so the only scan is the fetched rows."""
        if not pairs:
            return []
        ids = sorted({i for _, i in pairs})
        fetched = fetch_vec(ids).select(F.col(id_col).alias("id"), vec_col)
        pairs_df = F.broadcast(
            spark.createDataFrame(pairs, f"{qid_col} {qid_type}, id long")
        )
        rows = (
            fetched.join(pairs_df, "id")
            .join(q_small, qid_col)
            .select(
                qid_col, "id", dist_fn(F.col(vec_col), F.col(qvec_col)).alias("dist")
            )
            .collect()
        )
        if stats is not None:
            stats["rows_scored"] = stats.get("rows_scored", 0) + len(rows)
        return rows

    qids = [r[qid_col] for r in queries.select(qid_col).collect()]
    if not qids:
        return spark.createDataFrame([], f"{qid_col} {qid_type}, id long, dist double")

    seeds = _resolve_seeds(vectors, id_col, entrypoint, entrypoints, n_entrypoints)
    if not seeds:
        return spark.createDataFrame([], f"{qid_col} {qid_type}, id long, dist double")

    best: dict = {q: {} for q in qids}
    visited: dict = {q: set() for q in qids}
    for r in score([(q, e) for q in qids for e in seeds]):
        best[r[qid_col]][int(r["id"])] = float(r["dist"])
    frontier: dict = {q: list(seeds) for q in qids}

    for _ in range(max_hops):
        frontier_union = sorted({i for ids in frontier.values() for i in ids})
        if not frontier_union:
            break
        adj_map = {
            int(r["id"]): [int(n) for n in r["neighbors"]]
            for r in fetch_adj(frontier_union).select("id", "neighbors").collect()
        }
        if stats is not None:
            stats["hops"] = stats.get("hops", 0) + 1
        pairs = []
        for q, ids in frontier.items():
            cand: set[int] = set()
            for i in ids:
                cand.update(adj_map.get(i, ()))
            cand -= visited[q]
            cand -= best[q].keys()
            pairs.extend((q, c) for c in sorted(cand))
        for q, ids in frontier.items():
            visited[q].update(ids)
        new_scored = score(pairs)
        if not new_scored:
            break
        improved: set = set()
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


# --------------------------------------------------------------------------
# LM-DiskANN block layout: one fetch per hop
# --------------------------------------------------------------------------
#
# The LM-DiskANN PAPER's defining trick (the "LM" in LM-DiskANN, paper
# section 4 — Pan/Sun/Yu, IEEE BigData 2023) is that each node's disk block is
# SELF-CONTAINED: the node's vector, its neighbor ids, AND (compressed)
# copies of the neighbor vectors live in one block, so expanding a node
# costs exactly one read — neighbors are scored from the copies in the
# block just read, never from a second lookup.  (The reference Julia
# implementation stores vectors and adjacency as two separate mmapped
# arrays — src/LMDiskANN.jl:82-100 is its metadata/mmap setup, NOT a block
# format; the two-fetch loop above matches the reference's layout, the
# block path below matches the paper's.)  The two-fetch loop (adjacency
# fetch + vector fetch per hop) is the uncompressed-graph shape; the block
# path below is the paper-faithful one: ONE partition-pruned fetch per
# hop, neighbor scoring driver-side from the fetched copies.
#
# Storage trade (same as the paper's): raw blocks replicate each vector once
# per in-edge, ~(1 + degree) x the flat vector table — fine at moderate
# degree, heavy at 100 TB.  The paper's answer is implemented here too:
# ``codebook=`` switches the payload to PQ codes (m bytes per copy instead
# of dim floats, ~(1 + degree*m/(4*dim)) x storage), traversal scores by ADC
# table lookup, and one final pruned fetch re-ranks every retained candidate
# against its full-precision vector (the reference re-scores exact at
# src/LMDiskANN.jl:465-471), so returned distances are exact either way.
#
# Driver memory bound: O(unique ids seen x dim) vectors + O(expanded x degree)
# neighbor ids — the same ids-only-plus-copies budget the paper holds in its
# block cache; at ef=100 x 32 queries x degree 8 this is a few MB.

_NUMPY_METRICS = ("euclidean", "l2", "sqeuclidean", "cosine", "manhattan", "l1", "dot")


def _np_dists(metric: str, mat, q):
    """Distances from each row of ``mat`` (n x d float64) to ``q`` (d,) —
    driver-side mirror of functions/vector.py's expressions (float64 math;
    last-ulp summation-order differences vs the JVM cannot flip recall/topk
    on non-adversarial data and no hash-gated query orders on these)."""
    import numpy as np

    m = metric.lower()
    if m in ("euclidean", "l2"):
        return np.sqrt(((mat - q) ** 2).sum(axis=1))
    if m == "sqeuclidean":
        return ((mat - q) ** 2).sum(axis=1)
    if m == "cosine":
        qn = np.linalg.norm(q)
        mn = np.linalg.norm(mat, axis=1)
        denom = np.where(mn * qn == 0.0, 1.0, mn * qn)
        return 1.0 - (mat @ q) / denom
    if m in ("manhattan", "l1"):
        return np.abs(mat - q).sum(axis=1)
    if m == "dot":
        return -(mat @ q)
    raise ValueError(f"metric {metric!r} has no driver-side kernel; use the two-fetch path")


def _adc_table(metric: str, cb, q, normalized: bool = False):
    """Per-query ADC lookup table over a PQ codebook ``cb`` (m, k, width):
    table[sub, code] = the metric's additive contribution of that codeword
    to the distance between ``q`` and any vector whose sub-th code is
    ``code`` (Jegou et al., asymmetric distance computation).  Euclidean
    accumulates squared contributions (sqrt at lookup).

    Cosine does not decompose additively in general, but on a layout built
    with ``normalized=True`` (vectors L2-normalized before codebook fit and
    encoding) the identity ``cosine_dist(a, b) = ||a - b||^2 / 2`` for unit
    vectors makes the sqeuclidean decomposition exact: the query is
    normalized here (cosine is scale-invariant, so raw exact scoring is
    unaffected) and ``_adc_lookup`` halves the accumulated squares so ADC
    scores stay commensurate with true cosine distances of exact-known
    candidates in the same beam."""
    import numpy as np

    m_, _, width = cb.shape
    qsub = np.asarray(q, dtype=np.float64).reshape(m_, width)
    mt = metric.lower()
    if mt == "cosine":
        if not normalized:
            raise ValueError(
                "cosine ADC requires a normalized block layout "
                "(build_beam_blocks normalizes cosine indexes automatically; "
                "legacy un-normalized layouts must rebuild)"
            )
        qn = float(np.sqrt((qsub**2).sum()))
        if qn > 0.0:
            qsub = qsub / qn
        return ((cb - qsub[:, None, :]) ** 2).sum(axis=-1)
    if mt in ("euclidean", "l2", "sqeuclidean"):
        return ((cb - qsub[:, None, :]) ** 2).sum(axis=-1)
    if mt in ("manhattan", "l1"):
        return np.abs(cb - qsub[:, None, :]).sum(axis=-1)
    if mt == "dot":
        return -(cb * qsub[:, None, :]).sum(axis=-1)
    raise ValueError(
        f"metric {metric!r} has no additive ADC decomposition; "
        "build the block layout uncompressed for this index"
    )


def _adc_lookup(metric: str, table, codes_mat):
    """Approximate distances for a (n, m) code matrix via table lookups.
    Cosine tables are sqeuclidean over unit vectors (see _adc_table), so
    the halved sum IS the cosine distance."""
    import numpy as np

    vals = table[np.arange(table.shape[0])[None, :], codes_mat].sum(axis=1)
    mt = metric.lower()
    if mt in ("euclidean", "l2"):
        return np.sqrt(vals)
    if mt == "cosine":
        return vals / 2.0
    return vals


def beam_search_batch_blocks(
    spark,
    blocks_fetch: Callable[[Sequence[int]], DataFrame],
    queries: DataFrame,
    ef: int = 300,
    metric: str = "euclidean",
    seeds: Sequence[int] | None = None,
    max_hops: int = 12,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    stats: dict | None = None,
    codebook=None,
    query_chunk: int = 1024,
    allowed: "set[int] | DataFrame | _AllowedMembership | None" = None,
    normalized: bool = False,
) -> DataFrame:
    """Batched beam search over a BLOCK table.

    One Spark job per hop (vs two in beam_search_batch): fetching a frontier
    node's block yields its neighbor ids AND their vector payloads, so
    candidate scoring is driver-side numpy on the payloads just fetched —
    the reference's single-block-read-per-expansion contract.
    ``blocks_fetch`` must be a partition-pruned point fetch (index._fetcher
    over the bucketed blocks snapshot).  ``seeds`` are required (the index
    stores spread entrypoints in the block layout's metadata, so seeding
    costs no job).

    Two payload modes, switched by ``codebook``:

    - RAW (codebook=None): block rows are (id, vec, neighbors, nbr_vecs)
      with exact copies — candidate distances are true-metric immediately.
    - PQ (codebook = (m, k, width) nested lists / ndarray, the paper's
      actual format): rows are (id, vec, neighbors, nbr_codes); candidates
      are scored by ADC table lookups during traversal, and the function
      ends with ONE extra pruned fetch to re-score every retained candidate
      against its full-precision vector (the reference re-ranks exact at
      src/LMDiskANN.jl:465-471), so returned distances are always exact.
      A node's OWN vector is stored full-precision in its block (as in the
      paper), so already-expanded candidates re-rank without refetching.

    ``allowed`` (optional) is FILTERED ANN in the filter-DURING-search form
    (the FilteredDiskANN idea, public literature): traversal routes through
    EVERY scored node — disallowed nodes still navigate, keeping the graph
    connected under selective filters — while the ef-bounded RESULT list
    admits allowed ids only, so post-filtering can never under-fill k.
    Accepts a small driver-side ``set``, an allowed-ids DataFrame
    (column ``id``), OR a pre-built ``_AllowedMembership``: the DataFrame
    form resolves membership EXECUTOR-side — one pruned lookup per hop for
    the ids actually scored — so driver memory is O(ids touched by the
    sweep), never O(|allowed|); an unselective 100-TB filter costs
    hop-sized lookups, not a collect.  A DataFrame is wrapped (snapshot
    persisted) and released here; pass a pre-built ``_AllowedMembership``
    instead to amortize that snapshot across repeated searches with the
    same filter — its ``close()`` is then the caller's to call.

    ``normalized``: the block layout stored L2-normalized neighbor payloads
    (build_beam_blocks sets this for cosine PQ layouts) — routes cosine ADC
    through the unit-vector sqeuclidean identity (see _adc_table).

    Driver memory: the sweep holds copies of every block payload it touched
    — O(chunk_queries x (ef/4) x hops x degree x payload_size).  Raw copies
    are dim floats; PQ codes are m ints (~dim/2 x smaller at default m), which
    is why PQ blocks are the 100-TB configuration exactly as in the paper.
    ``query_chunk`` bounds that footprint: larger batches run as sequential
    driver sweeps of at most this many queries (fresh state per sweep; hop
    jobs scale with the chunk count, memory does not).

    Returns (qid, id, dist): up to ef candidates per query, true-metric
    distances.
    """
    import numpy as np

    pq_mode = codebook is not None
    if pq_mode:
        cb = np.asarray(codebook, dtype=np.float64)
        _adc_table(  # validate the metric decomposes before any job runs
            metric, cb, np.zeros(cb.shape[0] * cb.shape[2]), normalized
        )
    else:
        _np_dists(metric, np.zeros((1, 2)), np.zeros(2))  # validate metric early

    qid_type = queries.schema[qid_col].dataType.simpleString()
    q_rows = queries.select(qid_col, qvec_col).collect()
    empty = f"{qid_col} {qid_type}, id long, dist double"
    if not q_rows:
        return spark.createDataFrame([], empty)
    if not seeds:
        # a mis-seeded call (e.g. empty stored entrypoints) must not be
        # indistinguishable from 'no matches'
        raise ValueError(
            "beam_search_batch_blocks: queries provided but seeds is empty — "
            "pass at least one live entrypoint id (block layouts store them "
            "in their metadata)"
        )
    owns_allowed = isinstance(allowed, DataFrame)
    if owns_allowed:
        allowed = _AllowedMembership(allowed)
    seeds = sorted({int(s) for s in seeds})
    chunk = max(1, int(query_chunk))
    out_rows: list = []
    try:
        for lo in range(0, len(q_rows), chunk):
            out_rows.extend(
                _blocks_sweep(
                    blocks_fetch, q_rows[lo : lo + chunk], ef, metric, seeds,
                    max_hops, qid_col, qvec_col, stats,
                    cb if pq_mode else None, allowed, normalized,
                )
            )
    finally:
        if owns_allowed:
            # results are already local rows — the snapshot's job is done
            allowed.close()
    return spark.createDataFrame(out_rows, empty)


class _AllowedMembership:
    """Allowed-set admission for filtered block search.

    Two regimes, switched on the snapshot's cardinality at construction:
    at or below ``_DRIVER_SET_LIMIT`` the ids are collected ONCE into a
    driver-side frozenset and every membership question is answered locally
    (zero per-hop cluster work — optimization round 14); above it the
    executor-side table path below applies unchanged.

    Executor path: holds the allowed ids as a TABLE: each ``resolve``
    call runs one pruned membership lookup (literal isin below the plan
    threshold, broadcast semi-join above — default_fetcher's split) for the
    batch of candidate ids whose status is still unknown, and caches the
    boolean per id — so across hops AND across query-chunk sweeps each id
    is looked up at most once.  DRIVER memory is O(distinct ids the sweep
    scored) — the same footprint class as the block/copy caches —
    independent of the allowed set's cardinality, so unselective filters
    at 100 TB stay driver-safe.  CLUSTER memory is a different budget: the
    snapshot below persists the full allowed id projection (8 bytes/id
    spread across executors — cheap relative to the vectors themselves,
    but proportional to |allowed|, and materialized eagerly even if the
    traversal then touches few ids).  ``stats['allowed_lookups']`` counts
    the lookup jobs.

    The id projection is SNAPSHOTTED (persisted + counted) at
    construction: callers hand in derived frames (typically
    ``key_map.filter(where)`` over a merge-on-read view whose latest-wins
    window blocks id pushdown), and without the snapshot every per-hop
    lookup would re-execute the full scan+shuffle lineage — O(max_hops)
    window scans per search.  With it, the lineage runs once and lookups
    read the cache.  Small allowed sets additionally collapse the lookup
    source to one partition so each per-hop membership job is a single
    task (fixed job latency, not a 32-task fan-out, dominates these point
    lookups); large sets keep their parallelism.  ``close()`` releases the
    snapshot — the batch entry point owns that lifecycle when it wrapped
    the frame itself; to AMORTIZE the snapshot across repeated searches
    with the same filter, build one ``_AllowedMembership`` and pass it as
    ``allowed`` directly (``beam_search_batch_blocks`` then leaves the
    lifecycle to you — call ``close()`` when done)."""

    # below this many allowed ids the lookup source collapses to 1
    # partition: the per-hop membership job is latency-bound, and a scan
    # of <=1M cached longs is microseconds per task
    _COALESCE_LIMIT = 1_000_000

    # at or below this many allowed ids the snapshot is ALSO collected into
    # a driver-side frozenset at construction (~8 bytes/id: <= 1M longs is
    # the same driver-memory class as the sweep's block/copy caches) and
    # every membership question is answered without touching the cluster —
    # the per-hop union+semi-join membership branch costs ~6x the plain
    # block fetch at bench scale (measured 0.65 s vs 0.11 s per hop), all
    # of it avoidable when the filter is small enough to hold locally.
    # Unbounded 100-TB filters (> the limit) keep the executor-side
    # resolution path unchanged.  ``driver_set_limit=0`` forces the
    # executor path regardless of size (tests use it to exercise the
    # large-set contract on small fixtures).
    _DRIVER_SET_LIMIT = 1_000_000

    def __init__(
        self,
        allowed_df: DataFrame,
        id_col: str = "id",
        driver_set_limit: int | None = None,
    ):
        self._cached = allowed_df.select(
            F.col(id_col).cast("long").alias("id")
        ).persist()
        try:
            n = self._cached.count()  # materializes the snapshot once
        except Exception:
            # the lineage failed at materialization — release the persist
            # registration before propagating, or failing filtered searches
            # would accumulate cache entries the lifecycle exists to prevent
            self._cached.unpersist()
            raise
        limit = self._DRIVER_SET_LIMIT if driver_set_limit is None else driver_set_limit
        self._set: frozenset[int] | None = None
        if n <= limit:
            self._set = frozenset(
                int(r["id"]) for r in self._cached.collect()
            )
        self._small = n <= self._COALESCE_LIMIT
        src = self._cached.coalesce(1) if self._small else self._cached
        self._fetch = default_fetcher(src, "id")
        self._known: dict[int, bool] = {}

    def close(self) -> None:
        self._cached.unpersist()

    def resolve(self, ids, stats: dict | None = None) -> set:
        """Subset of ``ids`` present in the allowed table.

        Normally a pure cache read: the blocks sweep prefetches membership
        for every id a hop can score inside the hop's own fetch job
        (``collect_blocks_with_membership``), so the standalone lookup job
        below is a safety net for ids that arrive outside that contract —
        ``stats['allowed_lookups']`` counts it and stays 0 on the block
        path.  With a driver-side set (small filters) this is a pure local
        lookup — no job, no cache growth."""
        if self._set is not None:
            return {int(i) for i in ids if int(i) in self._set}
        unknown = sorted({int(i) for i in ids} - self._known.keys())
        if unknown:
            hit = {int(r["id"]) for r in self._fetch(unknown).select("id").collect()}
            for i in unknown:
                self._known[i] = i in hit
            if stats is not None:
                stats["allowed_lookups"] = stats.get("allowed_lookups", 0) + 1
        return {int(i) for i in ids if self._known[int(i)]}

    def collect_blocks_with_membership(
        self,
        blocks_df: DataFrame,
        stats: dict | None = None,
        requested: Sequence[int] | None = None,
    ) -> list:
        """Collect the hop's block rows AND the allowed-membership of every
        id they mention — {block ids} ∪ {their neighbors} ∪ {requested ids}
        — exactly the ids the hop can score — in ONE Spark job.

        The membership branch rides the same pruned point fetch as the
        block rows (a second, column-pruned branch of one union plan:
        explode neighbors, left-semi against the snapshot), so filtered
        traversal costs one job per hop — the same job ladder as unfiltered
        search.  A standalone per-hop lookup job has a ~0.3 s fixed floor
        (probe-side broadcast + scheduling) that this removes entirely.

        ``requested`` is the id list the fetch was asked for.  It is
        unioned into the probe as a literal frame because a requested id
        with NO block row (a stored entrypoint seed whose node was deleted,
        a stale neighbor pointer) still enters the hop-0 candidate set —
        without probing it here, ``resolve()`` would fire its standalone
        fallback job for exactly those ids.  With it, misses among
        requested ids are learned in the same job and the zero-extra-jobs
        invariant holds even on indexes with stale seeds after deletes.
        Misses are learned driver-side: the probed universe is recoverable
        from the block rows + the requested list, so absent ids mark
        ``known=False`` without shipping a miss list.

        With a driver-side set (small filters, ``_DRIVER_SET_LIMIT``) the
        membership branch is skipped entirely — the hop collects the plain
        block rows and every admission check reads the local frozenset, so
        filtered traversal costs exactly what unfiltered traversal costs."""
        if self._set is not None:
            return blocks_df.collect()
        # no distinct() on the probe: it would shuffle every hop, while
        # duplicate hit ids collapse driver-side for free.  Small snapshots
        # get an explicit broadcast hint so the semi-join stays in the
        # scan's own stage (zero exchanges in the membership branch); big
        # allowed sets must NOT be force-broadcast — Spark picks the
        # strategy, and the hop pays the shuffle an unbounded filter costs
        probe = blocks_df.select(F.explode("neighbors").alias("id")).unionByName(
            blocks_df.select("id")
        )
        req = sorted({int(i) for i in requested}) if requested else []
        if req:
            # a literal local frame (frontier-sized: <= ef ids) — no scan,
            # no shuffle; it only widens the semi-join's probe side
            probe = probe.unionByName(
                blocks_df.sparkSession.createDataFrame(
                    [(i,) for i in req], "id long"
                )
            )
        snap = F.broadcast(self._cached) if self._small else self._cached
        hits = probe.join(snap, "id", "left_semi")
        combined = blocks_df.withColumn("_mem", F.lit(False)).unionByName(
            hits.withColumn("_mem", F.lit(True)), allowMissingColumns=True
        )
        rows = combined.collect()
        block_rows = [r for r in rows if not r["_mem"]]
        hit_ids = {int(r["id"]) for r in rows if r["_mem"]}
        for r in block_rows:
            i = int(r["id"])
            self._known.setdefault(i, i in hit_ids)
            for n in r["neighbors"] or []:
                self._known.setdefault(int(n), int(n) in hit_ids)
        for i in req:  # requested ids with no block row learn here too
            self._known.setdefault(i, i in hit_ids)
        if stats is not None:
            stats["allowed_prefetches"] = stats.get("allowed_prefetches", 0) + 1
        return block_rows


def _blocks_sweep(
    blocks_fetch, q_rows, ef, metric, seeds, max_hops, qid_col, qvec_col,
    stats, cb, allowed=None, normalized=False,
) -> list:
    """One driver sweep of beam_search_batch_blocks over <= query_chunk
    queries: fresh block/copy caches, returns (qid, id, dist) tuples.
    ``allowed``: routing scores every node, but only allowed ids enter the
    returned result list (filter-during-search).  A set checks membership
    driver-side; an _AllowedMembership resolves it executor-side, prefetched
    inside each hop's block-fetch job (zero extra jobs per hop)."""
    import numpy as np

    pq_mode = cb is not None
    qids = [r[qid_col] for r in q_rows]
    qvec = {r[qid_col]: np.asarray(r[qvec_col], dtype=np.float64) for r in q_rows}
    tables = (
        {q: _adc_table(metric, cb, qvec[q], normalized) for q in qids}
        if pq_mode
        else None
    )

    payload_col = "nbr_codes" if pq_mode else "nbr_vecs"
    vec_of: dict[int, "np.ndarray"] = {}  # exact own vectors of FETCHED blocks
    copy_of: dict[int, "np.ndarray"] = {}  # neighbor payloads (copies or codes)
    nbrs_of: dict[int, list[int]] = {}
    best: dict = {q: {} for q in qids}
    # filtered form: ``best`` keeps ROUTING candidates (every node scored —
    # disallowed nodes still navigate); ``out`` admits allowed ids only
    out: dict = best if allowed is None else {q: {} for q in qids}
    visited: dict = {q: set() for q in qids}
    frontier: dict = {q: list(seeds) for q in qids}

    def fetch_blocks(ids):
        df = blocks_fetch(ids).select("id", "vec", "neighbors", payload_col)
        if isinstance(allowed, _AllowedMembership):
            # membership prefetch rides the fetch job: every id this hop
            # can score ({fetched ids} ∪ {their neighbors} ∪ the requested
            # list itself — covering requested ids whose block row is gone,
            # e.g. stale seeds after deletes) resolves here, so the per-hop
            # resolve() below is a cache read, not a job
            rows = allowed.collect_blocks_with_membership(df, stats, requested=ids)
        else:
            rows = df.collect()
        for r in rows:
            i = int(r["id"])
            vec_of[i] = np.asarray(r["vec"], dtype=np.float64)
            nbrs = [int(n) for n in (r["neighbors"] or [])]
            nbrs_of[i] = nbrs
            for n, p in zip(nbrs, r[payload_col] or []):
                if n not in copy_of and p is not None:
                    copy_of[n] = np.asarray(
                        p, dtype=np.int64 if pq_mode else np.float64
                    )
        return len(rows)

    def score_cands(q, cand_ids):
        """True-metric dists for exact-known ids; ADC (pq) or copy (raw)
        dists for the rest — one vectorized pass each."""
        exact = [c for c in cand_ids if c in vec_of]
        approx = [c for c in cand_ids if c not in vec_of and c in copy_of]
        out = {}
        if exact:
            d = _np_dists(metric, np.stack([vec_of[c] for c in exact]), qvec[q])
            out.update(zip(exact, d.tolist()))
        if approx:
            if pq_mode:
                d = _adc_lookup(metric, tables[q], np.stack([copy_of[c] for c in approx]))
            else:
                d = _np_dists(metric, np.stack([copy_of[c] for c in approx]), qvec[q])
            out.update(zip(approx, d.tolist()))
        return out

    for hop in range(max_hops):
        to_fetch = sorted({i for ids in frontier.values() for i in ids} - nbrs_of.keys())
        if to_fetch:
            n_rows = fetch_blocks(to_fetch)
            if stats is not None:
                stats["hops"] = stats.get("hops", 0) + 1
                stats["blocks_fetched"] = stats.get("blocks_fetched", 0) + n_rows
        # phase 1: per-query candidate sets (ids only), so the filtered
        # form can resolve allowed-membership for the WHOLE hop in one
        # batched executor-side lookup instead of per-query jobs
        cand_by_q: dict = {}
        for q in list(frontier):
            front = frontier[q]
            if not front:
                continue
            cand = set()
            for i in front:
                cand.update(nbrs_of.get(i, ()))
            if hop == 0:
                cand.update(front)  # seeds score their own vectors too
            cand -= visited[q]
            cand -= best[q].keys()
            visited[q].update(front)
            cand_by_q[q] = cand
        allowed_now = allowed
        if isinstance(allowed, _AllowedMembership) and cand_by_q:
            allowed_now = allowed.resolve(
                set().union(*cand_by_q.values()), stats
            )
        improved: set = set()
        for q, cand in cand_by_q.items():
            b = best[q]
            scored = score_cands(q, sorted(cand))
            if stats is not None:
                stats["rows_scored"] = stats.get("rows_scored", 0) + len(scored)
            if not scored:
                continue
            worst = max(b.values()) if len(b) >= ef else float("inf")
            o = out[q]
            oworst = (
                None if allowed is None
                else (max(o.values()) if len(o) >= ef else float("inf"))
            )
            for c in sorted(scored):
                d = scored[c]
                if len(b) < ef or d < worst:
                    b[c] = d
                    improved.add(q)
                    if len(b) > ef:
                        del b[max(b, key=b.get)]
                    worst = max(b.values()) if len(b) >= ef else float("inf")
                if (
                    allowed is not None
                    and c in allowed_now
                    and (len(o) < ef or d < oworst)
                ):
                    # result admission is independent of routing admission:
                    # a selective filter's best allowed hit may rank below
                    # the routing beam's ef-worst.  An o-only improvement
                    # still marks the query improved — allowed-result
                    # candidates can keep sharpening after the routing list
                    # saturates, so the frontier must survive the hop
                    o[c] = d
                    improved.add(q)
                    if len(o) > ef:
                        del o[max(o, key=o.get)]
                    oworst = max(o.values()) if len(o) >= ef else float("inf")
        if not improved:  # early termination, :404-406
            break
        frontier = {
            q: sorted((i for i in best[q] if i not in visited[q]), key=lambda i: best[q][i])[
                : max(1, ef // 4)
            ]
            for q in improved
        }

    if pq_mode:
        # exact re-rank (the reference's :465-471): one pruned fetch for the
        # retained candidates whose full-precision vector we don't yet hold,
        # then every returned distance is recomputed from the exact vector
        missing = sorted(
            {i for b in out.values() for i in b} - vec_of.keys()
        )
        if missing:
            rows = blocks_fetch(missing).select("id", "vec").collect()
            for r in rows:
                vec_of[int(r["id"])] = np.asarray(r["vec"], dtype=np.float64)
            if stats is not None:
                stats["rerank_fetched"] = len(rows)
        for q, b in out.items():
            ids = sorted(i for i in b if i in vec_of)
            if ids:
                d = _np_dists(metric, np.stack([vec_of[i] for i in ids]), qvec[q])
                out[q] = dict(zip(ids, d.tolist()))
            else:
                out[q] = {}

    return [(q, i, d) for q, b in out.items() for i, d in b.items()]
