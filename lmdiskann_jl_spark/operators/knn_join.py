"""Distributed k-nearest-neighbor join — the engine of bulk index build.

Reference parity: the reference inserts points ONE AT A TIME — each
``ann_insert!`` runs a full graph search for top-``maxdegree`` neighbors of the
new point (``/root/reference/src/LMDiskANN.jl:564``).  The idiomatic Spark
replacement is a batch kNN self-join: every point finds its k nearest in one
distributed pass (SURVEY.md section 2.2 op 9).

Two physical strategies, picked by scale:

- ``brute_force_knn_join``: crossJoin + per-row distance + window top-k.
  O(n*m) comparisons but embarrassingly parallel and shuffle-light (only
  (left_id, right_id, dist) triples reach the window shuffle, and Spark's
  WindowGroupLimit prunes to k per group map-side first).  Right side is
  broadcast when small.  Correct choice up to ~10^5 x 10^5 per-bucket work.

- ``lsh_knn_join``: bucketed random-projection LSH (the classic public
  algorithm, same family as MLlib's BucketedRandomProjectionLSH): hash each
  vector into sign-bit buckets of ``n_planes`` random hyperplanes, replicate
  across ``n_tables`` independent tables, join WITHIN buckets only, then exact
  re-score + window top-k.  Work drops from O(n^2) to O(sum_b n_b^2); at
  100 TB the bucket join is a shuffle on (table, bucket) keys — data-parallel
  and skew-handled by AQE.  Projection planes are generated from a fixed seed
  driver-side (tiny: n_planes * dim doubles) and shipped as literals, so runs
  are deterministic.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import dot_product, query_vector_lit, resolve_metric


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a small-file input up to default parallelism so
    compute-bound per-row work (distance expressions) uses every core.
    A table already partitioned wider (the 100 TB case) is left untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def brute_force_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    metric: str = "euclidean",
    left_id: str = "id",
    right_id: str = "id",
    vec_col: str = "vec",
    exclude_self: bool = True,
    broadcast_right: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """For each left row, its k nearest right rows.

    Output: (left_id, right_id, dist, rank).  Deterministic tie-break on
    (dist, right_id).  ``dim``: static vector dimension hint — routes the
    per-pair distance through the codegen'd unrolled kernel
    (functions/vector.py; bit-identical to the HOF form).
    """
    dist_fn = resolve_metric(metric, dim)
    l = _spread(left.select(F.col(left_id).alias("_lid"), F.col(vec_col).alias("_lvec")))
    r = right.select(F.col(right_id).alias("_rid"), F.col(vec_col).alias("_rvec"))
    if broadcast_right:
        r = F.broadcast(r)
    pairs = l.crossJoin(r)
    if exclude_self:
        pairs = pairs.filter(F.col("_lid") != F.col("_rid"))
    scored = pairs.select(
        F.col("_lid").alias(left_id + "_l") if left_id == right_id else F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id + "_r") if left_id == right_id else F.col("_rid").alias(right_id),
        dist_fn(F.col("_lvec"), F.col("_rvec")).alias("dist"),
    )
    lcol, rcol = scored.columns[0], scored.columns[1]
    w = Window.partitionBy(lcol).orderBy(F.col("dist").asc(), F.col(rcol).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def random_hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic unit-ish Gaussian hyperplanes: [table][plane][dim]."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def add_lsh_buckets(
    df: DataFrame,
    planes: list[list[list[float]]],
    vec_col: str = "vec",
    bucket_col: str = "bucket",
    table_col: str = "lsh_table",
    use_arrow: bool = True,
    probes: int = 1,
    probe_col: str | None = None,
    arrays_col: str | None = None,
) -> DataFrame:
    """Explode each row into one row per LSH table with its sign-bit bucket id.

    ``arrays_col`` (optional): keep the row's FULL bucket array (length
    ``n_tables * probes``, probe-major within each table — exactly the
    explode order) as a column on every exploded row.  Consumers use it for
    first-collision dedup: a candidate pair that shares several (table,
    bucket) keys can be emitted from exactly one of them by comparing the
    two sides' arrays — which turns the post-join ``distinct``/``groupBy``
    dedup exchange into a map-side filter (optimization round 14).

    ``probe_col`` (optional): also emit the probe index — 0 for the base
    bucket, 1..probes-1 for the margin-ordered flips — so a caller can
    bucket ONCE with probes and then derive the single-bucket (base-only)
    view by filtering ``probe_col == 0``: the query side of an asymmetric
    multiprobe join keeps all rows while the stored/state side keeps only
    base rows, without paying a second bucketing pass over the same data.

    Bucket id = sum over planes of 2^p * (dot(vec, plane_p) >= 0).

    ``probes`` (multiprobe LSH — Lv et al., VLDB 2007): emit up to
    ``probes`` bucket ids per table — the base bucket plus single-bit
    flips of the LOWEST-|margin| planes, in margin order.  A near-zero
    plane dot means the pair could have landed on either side, so probing
    the flipped bucket recovers most of what an extra table would, at the
    cost of extra PROBE rows instead of extra stored tables — the standard
    lever for clawing back the rho-scaled table budget (state/build stays
    O(n x T); only the probing side multiplies).  probes=1 is bit-for-bit
    the classic single-bucket behavior.

    Two physical paths:
    - ``use_arrow`` (default): one Arrow-batched pandas_udf computing ALL
      table buckets per row with a single numpy matmul (batch x dim) @
      (dim x tables*planes).  Dense linear algebra is the one place the
      "built-ins first" rule loses: n_tables x n_planes interpreted
      higher-order-function dot products measure ~100x slower than one BLAS
      matmul (9.8 s vs <0.5 s for 2000 rows x 40 planes on 32 cores).
    - native column expressions (no Python at all) as the fallback for
      environments where Arrow is unavailable (``probes`` > 1 needs the
      Arrow path: the flip ranking is an argsort over |dots|).

    Both are deterministic for fixed plane constants.
    """
    if probes > 1 and not use_arrow:
        raise ValueError("multiprobe (probes > 1) requires the Arrow path")
    if use_arrow:
        from pyspark.sql.functions import pandas_udf

        n_tables = len(planes)
        n_planes = len(planes[0])
        qp = max(1, min(int(probes), n_planes + 1))
        # (dim, tables*planes) weight matrix, closed over by the UDF
        M = np.array([p for tp in planes for p in tp], dtype=np.float64).T
        pw = np.power(2, np.arange(n_planes), dtype=np.int64)

        @pandas_udf("array<long>")
        def _buckets(v: pd.Series) -> pd.Series:
            X = np.vstack(v.to_numpy())  # (batch, dim)
            dots = X.astype(np.float64) @ M  # (batch, tables*planes)
            bits = (dots >= 0).reshape(len(X), n_tables, n_planes)
            base = bits @ pw  # (batch, tables)
            if qp == 1:
                return pd.Series(list(base))
            # per (row, table): flip the qp-1 lowest-|margin| planes, one
            # at a time (single-bit probes, margin order)
            order = np.argsort(
                np.abs(dots).reshape(len(X), n_tables, n_planes), axis=2
            )[:, :, : qp - 1]  # (batch, tables, qp-1)
            flips = base[:, :, None] ^ pw[order]  # XOR flips the chosen bit
            out = np.concatenate([base[:, :, None], flips], axis=2)
            return pd.Series(list(out.reshape(len(X), n_tables * qp)))

        bucketed = df.withColumn("_buckets", _buckets(F.col(vec_col)))
        exploded = bucketed.select(
            "*", F.posexplode("_buckets").alias("_pos", bucket_col)
        )
        if arrays_col is not None:
            exploded = exploded.withColumnRenamed("_buckets", arrays_col)
        else:
            exploded = exploded.drop("_buckets")
        # posexplode index -> table id (qp consecutive probes per table)
        out = exploded.withColumn(
            table_col, (F.col("_pos") / F.lit(qp)).cast("int")
        )
        if probe_col is not None:
            out = out.withColumn(probe_col, (F.col("_pos") % qp).cast("int"))
        return out.drop("_pos")

    per_table = []
    bucket_exprs = []
    for t, table_planes in enumerate(planes):
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(table_planes):
            bit = (dot_product(F.col(vec_col), query_vector_lit(plane)) >= 0).cast("long")
            bucket = bucket + F.shiftleft(bit, p)
        bucket_exprs.append(bucket)
        per_table.append(F.struct(F.lit(t).alias(table_col), bucket.alias(bucket_col)))
    base = df
    if arrays_col is not None:
        # same expressions as the exploded buckets (deterministic), so the
        # array agrees with the per-row bucket by construction
        base = base.withColumn(arrays_col, F.array(*bucket_exprs))
    out = base.withColumn("_tb", F.explode(F.array(*per_table))).select(
        "*", F.col(f"_tb.{table_col}").alias(table_col), F.col(f"_tb.{bucket_col}").alias(bucket_col)
    ).drop("_tb")
    if probe_col is not None:
        # probes==1 on this path (enforced above): every row is its base
        out = out.withColumn(probe_col, F.lit(0).cast("int"))
    return out


# AUTO operating-point calibration (sign-LSH, isotropic worst case):
#
# - planes hold expected bucket occupancy constant as n grows:
#   p(n) = round(log2(n / (LSH_OCC_K * k))) — each 2x of n adds one plane,
#   so per-bucket candidate work NEVER goes quadratic (the scale invariant).
# - tables restore the recall the finer buckets give up:
#   T(n) = T_REF * (n / N_REF)^LSH_RHO — the classic sublinear table/probe
#   growth of LSH theory (query cost n^rho, rho < 1; Andoni & Indyk, CACM
#   2008).  rho is DERIVED from the plane rule, not free-fit: each extra
#   plane multiplies a true neighbor's per-table collision probability by
#   C_TRUE (the per-plane agreement rate of true top-k pairs — measured
#   ~0.70 on the repo's ISOTROPIC GAUSSIAN fixtures, LSH's hardest case:
#   no cluster structure, d=64 angles concentrate), and the plane rule
#   adds one plane per 2x of n, so holding the miss probability needs T
#   to grow by 1/C_TRUE per doubling: rho = log2(1/C_TRUE) ~ 0.515.
#   EVIDENCE (round 12, tools/scaling_sf1.py): the earlier rho = 0.3 was
#   calibrated only up to n=2000 and its recall was decaying all along —
#   0.90 (n=500) -> 0.77 (n=2000) -> 0.628 (n=20000, BELOW the 0.70 bar,
#   test/runtests.jl:454); the derived exponent holds the floor at the
#   measured decade.  Real embedding corpora are clustered, sit far above
#   this floor, and tolerate a smaller rho.  Total candidate volume under
#   the rule is T(n) * n * occupancy ~ n^(1+rho): holding recall on
#   worst-case data with LINEAR candidate growth is not achievable for
#   any LSH family — rho > 0 is a lower bound, not an implementation
#   artifact, and the isotropic-worst-case exponent is the price of a
#   recall GUARANTEE rather than a clustered-data expectation.
# - the CAP ERA (round 14, MEASURED): the table cap (128) binds the
#   FULL-table rule from n ~ 28k (16 * (n/500)^0.515 = 128 at
#   LSH_CAP_N ~ 28,356), and the prior claim that rising C_TRUE (k-NN
#   angles shrink as n grows) would cover the gap was FALSIFIED at
#   n=200,000 exactly as rho=0.3 was at n=20,000: the capped point with
#   probes=4 measured recall 0.630 < 0.70 (tools/scaling_cap.py,
#   SCALING.md's cap-decade table).  The rule that holds the floor with
#   the table budget pinned is GROWN PROBES: each plane the occupancy
#   rule adds beyond the cap-binding point cuts per-table true-pair
#   collision by C_TRUE, so the query-side probe count grows by
#   ~1/C_TRUE ~ 1.42 per plane — implemented as
#   probes = 4 * 2^ceil(delta_planes / 2) (~1.41x/plane; the measured
#   anchor: probes=16 at n=200k's delta of 3 planes measured 0.823,
#   comfortably above bar at HALF the candidate volume of the
#   frozen-planes alternative — 0.881 but ~100k cands/query — and with
#   UNCHANGED stored state).
#   Stored tables stay ceil(128/4)=32 — the cap era grows only the
#   query-side expansion, never state.  A deployment a further decade
#   past the measured anchor (n >> 200k) re-measures with its own
#   a_lsh_auto_recall-style gate, the same contract as before — but the
#   anchor is now one decade PAST the cap, not one before it.
LSH_OCC_K = 8.0
LSH_T_REF = 16
LSH_N_REF = 500.0
LSH_RHO = 0.515  # = log2(1 / C_TRUE), C_TRUE ~ 0.70 measured

# The DEFAULT AUTO point is MULTIPROBE (round 13): store/bucket a QUARTER
# of the rho-scaled table budget and have each query row probe 4 buckets
# per table (its base bucket + single-bit flips of its 3 lowest-|margin|
# planes — Lv et al., VLDB 2007).  The candidate-volume floor is unchanged
# (T/4 tables x 4 probes = the same n^(1+rho) probe-bucket budget), but
# the CORPUS side — the part that is stored, bucketed, shuffled, and (in
# the streaming band store) compacted and vacuumed forever — carries 4x
# less state.  Round 12 measured the trade before this round adopted it:
# recall PARITY with the full-table point (0.951 = 0.951 at sf0.1,
# a_lsh_multiprobe_recall) at ~2.4x less wall, held through the sf1
# decade (SCALING.md's sf1 table).  The full-table point stays reachable
# for A/B via probes=1 (auto_lsh_config(multiprobe=False)).
LSH_MULTIPROBE_DIV = 4
LSH_MULTIPROBE_PROBES = 4
LSH_MAX_TABLES = 128
# the corpus size where the full-table rule hits LSH_MAX_TABLES:
# 500 * (128/16)^(1/0.515) — beyond this the cap-era probe rule takes over
LSH_CAP_N = LSH_N_REF * (LSH_MAX_TABLES / LSH_T_REF) ** (1.0 / LSH_RHO)


def auto_lsh_config(
    n: int, k: int, multiprobe: bool = True, probes: int | None = None
) -> tuple[int, int, int]:
    """(n_planes, n_tables, probes) at the AUTO operating point for corpus
    size n.  ``multiprobe=True`` (the default since round 13) returns the
    quarter-budget multiprobe point; ``multiprobe=False`` returns the
    classic full-table point with probes=1 — kept reachable so the two
    can be A/B'd at any scale (that A/B is exactly the round-12
    measurement that justified the switch).

    ``probes`` (round-14 review): a caller pinning the probe count while
    keeping AUTO tables gets the stored-table budget divided by
    ``min(probes, LSH_MULTIPROBE_DIV)`` — the ACTUAL probe count, capped
    at the calibrated divisor — never by the fixed divisor alone.  Before
    this, probes=2 silently kept the /4 division, so the probe-bucket
    candidate budget fell to half the calibrated n^(1+rho) floor with no
    warning.  The cap means probes > 4 buys extra probe buckets above the
    floor (conservative: deeper bit-flips collide with lower true-pair
    probability, so they are credited as bonus, not as stored-table
    substitutes).

    CAP ERA (round 14, measured at n=200,000 — see the calibration
    comment above and SCALING.md's cap-decade table): once the full-table
    rule saturates LSH_MAX_TABLES (n > LSH_CAP_N ~ 28k), each further
    plane the occupancy rule adds has no table growth left to compensate
    it, and the capped point with probes=4 measured recall 0.630 < 0.70.
    AUTO therefore grows the QUERY-SIDE probe count instead:
    probes = 4 * 2^ceil(delta_planes / 2) where delta_planes is the
    plane count beyond the cap-binding decade's — ~1.41x per plane, the
    1/C_TRUE growth the table rule can no longer provide.  Stored state
    is unchanged (still ceil(128/4) tables).  Measured anchor: probes=16
    at n=200k holds 0.823.  The classic full-table point
    (``multiprobe=False``) has NO cap-era compensation — past LSH_CAP_N
    it is strictly a legacy A/B handle whose recall decays; the
    multiprobe AUTO point is the scale path.  An explicitly pinned
    ``probes`` suppresses the cap rule (the caller owns the trade)."""
    n_planes = max(2, min(24, round(math.log2(max(2.0, n / (LSH_OCC_K * k))))))
    n_tables = max(
        LSH_T_REF,
        min(LSH_MAX_TABLES, round(LSH_T_REF * (n / LSH_N_REF) ** LSH_RHO)),
    )
    if multiprobe:
        if probes is None:
            q = LSH_MULTIPROBE_PROBES
            if n > LSH_CAP_N:
                cap_planes = max(
                    2,
                    min(24, round(math.log2(max(2.0, LSH_CAP_N / (LSH_OCC_K * k))))),
                )
                delta = max(0, n_planes - cap_planes)
                q = LSH_MULTIPROBE_PROBES * 2 ** math.ceil(delta / 2)
        else:
            q = max(1, int(probes))
        div = min(q, LSH_MULTIPROBE_DIV)
        return (
            n_planes,
            max(2, math.ceil(n_tables / div)),
            q,
        )
    return n_planes, n_tables, 1


# First-collision dedup stays on only while its CASE chain compiles into the
# join stage's whole-stage codegen.  Measured at sf0.1 (2.2M-candidate AUTO
# multiprobe join, optimization round 14): chains of 8/16/24/32 terms cost
# +0.1-0.3 s over no filter, 36 terms jumps to +2.3 s — the expression falls
# out of codegen and every branch evaluates interpreted (a branch-free
# bitmask variant of the same 36 comparisons measured even worse, +4.9 s,
# confirming the cliff is evaluation mode, not branch prediction).  Above
# the cliff the single-exchange groupBy dedup is strictly faster, so the
# operator switches shapes on this measured bound rather than extrapolating.
FIRST_COLLISION_MAX_TERMS = 32


def first_collision_keep(
    left_arr: str,
    right_arr: str,
    n_tables: int,
    qp: int = 1,
    right_stride: int | None = None,
    table_col: str = "lsh_table",
    probe_col: str | None = None,
):
    """Predicate: this bucket-join row is the FIRST (table, probe) index at
    which the two sides' bucket arrays collide — true for exactly ONE of the
    rows a multi-table/multi-probe collision produces, so filtering on it
    de-duplicates candidate pairs WITHOUT a distinct/groupBy exchange
    (optimization round 14, guide §2.4: the dedup becomes a map-side filter
    inside the join stage; only unique pairs ever reach a shuffle).

    ``left_arr``: the probing side's full bucket array (length
    ``n_tables * qp``, probe-major — ``add_lsh_buckets(arrays_col=...)``'s
    layout).  ``right_arr``: the stored side's array; its base bucket for
    table t sits at index ``t * right_stride`` (stride ``qp`` when the
    stored side is a base-probe slice of the same multiprobe bucketing,
    1 when it was bucketed separately with probes=1).  The CASE chain is
    static (n_tables * qp terms of long equality on array elements), stays
    in whole-stage codegen, and can never be NULL: the join-key equality
    guarantees at least the current row's own index matches."""
    stride = qp if right_stride is None else right_stride
    first = None
    for j in range(n_tables * qp):
        t = j // qp
        cond = F.col(left_arr).getItem(j) == F.col(right_arr).getItem(t * stride)
        first = F.when(cond, F.lit(j)) if first is None else first.when(cond, F.lit(j))
    cur = F.col(table_col).cast("long") * qp
    if probe_col is not None:
        cur = cur + F.col(probe_col).cast("long")
    return first.cast("long") == cur


def lsh_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    dim: int,
    metric: str = "euclidean",
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    left_id: str = "id",
    right_id: str = "id",
    vec_col: str = "vec",
    exclude_self: bool = True,
    n_rows: int | None = None,
    probes: int | None = None,
) -> DataFrame:
    """Approximate kNN join via sign-random-projection LSH bucketing.

    Candidates = pairs sharing a (table, bucket); exact distance re-scores
    candidates; window top-k per left id.  Recall is tuned by
    (n_planes down / n_tables up); the default (both ``None``) is the
    occupancy-holding AUTO operating point resolved from corpus size (see
    auto_lsh_config) — since round 13 that is the QUARTER-BUDGET MULTIPROBE
    point (T/4 stored tables, probes=4), the configuration round 12
    measured at recall parity with full tables and ~2.4x less wall through
    sf1.  Multiprobe acts on the LEFT (query) side only — each left row
    also joins the buckets reached by flipping its lowest-|margin| sign
    bits (add_lsh_buckets), recovering recall that would otherwise need
    more stored tables; the right/corpus side always carries exactly one
    bucket per table, so state size and the stored layout are unchanged.

    ``probes`` resolution: ``None`` (default) follows the operating point —
    4 when tables are AUTO-resolved, 1 when the caller pinned ``n_tables``
    (a pinned configuration keeps the classic single-bucket behavior
    bit-for-bit, so the fixed recall gates and the graph-build path are
    untouched by the AUTO default change).  Passing ``probes=1`` with AUTO
    tables explicitly requests the classic FULL-TABLE point — the A/B
    handle; any explicit ``probes`` > 1 with AUTO tables divides the
    stored-table budget by ``min(probes, LSH_MULTIPROBE_DIV)`` (round-14
    review: dividing by the fixed 4 regardless of the actual probe count
    dropped probes=2/3 callers below the calibrated candidate floor).

    Pinning n_tables while leaving planes auto keeps the
    calibrated round() plane rule but carries NO general recall claim — the
    pinned table budget cannot compensate if rounding adds a plane, so gate
    recall for the specific configuration (as graph.py's build/insert gates
    and tests/test_graph_and_recall.py's pinned-T test do).  Output:
    (left id, right id, dist, rank) — same contract as
    brute_force_knn_join.

    BEHAVIOR NOTE (round 7 default change): ``n_tables`` defaulting to
    ``None`` means every default-arg caller is in AUTO mode, which sizes
    the operating point from ``right.count()``.  That count is
    metadata-only for a raw parquet scan but EXECUTES THE FULL LINEAGE for
    derived inputs — an extra job per call.  Callers that already know the
    corpus size (or rank a derived frame) should pass ``n_rows`` to skip
    the count, or pin both ``n_planes``/``n_tables`` to avoid AUTO
    entirely.
    """
    if n_planes is None or n_tables is None:
        # metadata-only for parquet scans; full lineage for derived inputs
        # — see the behavior note above (n_rows skips it)
        n = n_rows if n_rows is not None else right.count()
        auto_p, auto_t, auto_q = auto_lsh_config(
            n, k, multiprobe=(probes is None or probes > 1), probes=probes
        )
        n_planes = auto_p if n_planes is None else n_planes
        if n_tables is None:
            n_tables = auto_t
            if probes is None:
                probes = auto_q
    if probes is None:
        probes = 1  # pinned tables: classic single-bucket, bit-for-bit
    dist_fn = resolve_metric(metric, dim)
    planes = random_hyperplanes(dim, n_planes, n_tables, seed)

    lname = left_id + "_l" if left_id == right_id else left_id
    rname = right_id + "_r" if left_id == right_id else right_id
    self_join = left is right and left_id == right_id
    # the EFFECTIVE probe count: add_lsh_buckets clamps to n_planes + 1
    # (a k-plane bucket has only k single-bit flips) — every index into the
    # kept bucket arrays must use this clamped width, not the request
    qp = max(1, min(int(probes), n_planes + 1))
    # first-collision dedup applies only while its predicate stays inside
    # whole-stage codegen — see FIRST_COLLISION_MAX_TERMS for the measured
    # cliff; above it the single-exchange groupBy dedup below is faster
    use_fc = n_tables * qp <= FIRST_COLLISION_MAX_TERMS
    lb = add_lsh_buckets(
        _spread(left.select(F.col(left_id).alias("_lid"), F.col(vec_col).alias("_lvec"))),
        planes, vec_col="_lvec", probes=probes,
        # the base-slice derivation (self-join) and the first-collision
        # index both need the probe position; plain fallback paths don't
        probe_col="_probe" if probes > 1 and (self_join or use_fc) else None,
        arrays_col="_lbk" if use_fc else None,
    )
    if self_join:
        # self-join (the dedup/build case): derive the right side from the
        # same bucketing expression.  NOT persisted (optimization round 14):
        # the bucketing is map-only (sign projection per row, no shuffle),
        # so each join branch recomputes it fused into its own scan within
        # one action — measured 3.17 -> 2.93 s per AUTO invocation at sf0.1
        # vs the old persist+eager-count (an extra job, cache write/read,
        # and one leaked cached frame per invocation), and recomputing a
        # per-row transform beats materializing (1 + probes) x n bucket
        # rows at any scale.  With multiprobe the sides are ASYMMETRIC —
        # probe rows belong on the query side only (the stored/corpus side
        # is single-bucket by contract) — so the right side is the
        # probe_col==0 slice of the same deterministic bucketing.
        base = lb.filter(F.col("_probe") == 0) if probes > 1 else lb
        rb_cols = [
            F.col("_lid").alias("_rid"), F.col("_lvec").alias("_rvec"),
            F.col("lsh_table"), F.col("bucket"),
        ]
        if use_fc:
            rb_cols.append(F.col("_lbk").alias("_rbk"))
        rb = base.select(*rb_cols)
        # the stored side is the base-probe slice of the SAME multiprobe
        # bucketing: its base bucket for table t sits at index t * qp
        rb_stride = qp
    else:
        rb = add_lsh_buckets(
            _spread(right.select(F.col(right_id).alias("_rid"), F.col(vec_col).alias("_rvec"))),
            planes, vec_col="_rvec", arrays_col="_rbk" if use_fc else None,
        )
        rb_stride = 1  # bucketed separately with probes=1: length n_tables
    cand = lb.join(rb, ["lsh_table", "bucket"], "inner")
    if exclude_self:
        cand = cand.filter(F.col("_lid") != F.col("_rid"))
    if use_fc:
        # FIRST-COLLISION dedup (optimization round 14, guide §2.4): a pair
        # colliding in several (table, probe) buckets used to be scored per
        # collision and collapsed by a groupBy(min) — an exchange of the
        # FULL candidate multiset.  Both sides carry their bucket arrays,
        # so each join row decides map-side whether ITS (table, probe)
        # index is the pair's first collision; every pair survives exactly
        # once and the dedup aggregate disappears from the plan.  min(dist)
        # over collision copies equaled any copy's dist (identical vectors
        # -> identical doubles), so emitting the first copy is
        # bit-identical.  The only remaining exchange is the rank window's,
        # and it moves UNIQUE (lid, rid, dist) triples — never the vectors,
        # never the duplicates.
        cand = cand.filter(
            first_collision_keep(
                "_lbk", "_rbk", n_tables, qp=qp, right_stride=rb_stride,
                probe_col="_probe" if qp > 1 else None,
            )
        )
        scored = cand.select(
            F.col("_lid").alias(lname),
            F.col("_rid").alias(rname),
            dist_fn(F.col("_lvec"), F.col("_rvec")).alias("dist"),
        )
        w = Window.partitionBy(lname).orderBy(F.col("dist").asc(), F.col(rname).asc())
        return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    # score BEFORE deduplicating collisions: distance is recomputed for pairs
    # that collide in several tables (cheap, stays in codegen), but the dedup
    # shuffle then moves only (lid, rid, dist) triples — never the vectors.
    # At 100 TB this is the difference between shuffling 8x the vector
    # payload and 24 bytes/pair.
    #
    # ONE exchange for dedup + rank (optimization round 14, guide §2.4):
    # the triples are explicitly hash-partitioned by the LEFT id, which
    # satisfies the clustering requirement of BOTH the (lid, rid) groupBy
    # (lid ⊆ {lid, rid}) and the per-lid rank window — so the dedup
    # aggregate and the window run in the same post-shuffle stage and the
    # triples cross the network ONCE instead of twice.  Nothing is lost by
    # skipping the pre-exchange partial aggregate: a pair collides at most
    # once per (table, bucket) partition group (the corpus side stores one
    # bucket per table), so cross-table duplicates never share a map
    # partition and map-side combine collapsed nothing.
    scored = (
        cand.select(
            F.col("_lid").alias(lname),
            F.col("_rid").alias(rname),
            dist_fn(F.col("_lvec"), F.col("_rvec")).alias("dist"),
        )
        .repartition(F.col(lname))
        .groupBy(lname, rname)
        .agg(F.min("dist").alias("dist"))
    )
    w = Window.partitionBy(lname).orderBy(F.col("dist").asc(), F.col(rname).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
