"""The LMDiskANN index facade — lifecycle, mutation, and query entry points.

Reference parity (public API, ``/root/reference/src/LMDiskANN.jl:12-16``):
``create_index`` / ``load_index`` / ``save_index`` (``:239-306,351-360``),
``ann_insert!`` (``:531-584``), ``ann_delete!`` (``:605-646``), ``search``
(``:455-481``), ``get_embedding_from_id`` / ``_from_key`` (``:658-687``), plus
the UserIdMapping KV surface (re-exported here via ``lmdiskann_jl_spark.kvmap``).

Spark-first design (SURVEY.md section 1.4): all state lives in three tables —

    vectors(id BIGINT, key STRING, vec ARRAY<FLOAT|DOUBLE>)
    adjacency(id BIGINT, neighbors ARRAY<BIGINT>)
    key_map(key STRING, id BIGINT)

— plus ``_index_meta.json`` (dim, maxdegree, metric, eltype, num_points,
entrypoint, per-table snapshot versions).  The handle below holds only paths
and a SparkSession; no data on the driver.  Mutations are batch-first: every
entry point takes a DataFrame (single-row convenience wrappers on top), writes
a new table snapshot, and commits by swapping the meta pointer — the Parquet
stand-in for a Delta MERGE (see sources/tables.py).

Differences from the reference, by design (SURVEY.md section 7 "hard parts"):
- ids are assigned densely per batch (max_id + row_number), no freelist —
  Spark rewrites files, slots are never reused (``:534-537`` not needed);
- no capacity doubling (``:538-544``) — appends grow automatically;
- deletes drop rows instead of zero-tombstoning (``:640-641``);
- the quality bar is the reference's own: recall@k >= 0.70 vs brute force,
  not graph isomorphism with the sequential build.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lmdiskann_jl_spark import kvmap
from lmdiskann_jl_spark.operators.beam import beam_search
from lmdiskann_jl_spark.operators.graph import (
    build_adjacency,
    delete_from_adjacency,
    insert_batch_adjacency,
)
from lmdiskann_jl_spark.operators.topk import batch_topk, exact_topk
from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta, write_meta

DEFAULT_MAX_DEGREE = 64  # src/LMDiskANN.jl:18
DEFAULT_EF_SEARCH = 300  # src/LMDiskANN.jl:20

# vectors/adjacency snapshots are hive-partitioned by _b = id % N_ID_BUCKETS:
# the Spark analog of the reference's mmap O(1) record addressing — beam-hop
# and point-get fetches prune to the buckets holding the requested ids
# (sources/tables.py).  At 100 TB raise this so each bucket is a few GB.
N_ID_BUCKETS = 64

# auto insert-path switch: above this many existing points, incremental
# graph candidates come from LSH bucketing instead of batch x table brute
# force (the crossJoin is exact but O(batch * table) — the ingest
# bottleneck at scale)
LSH_INSERT_THRESHOLD = 200_000

# maintained block mutations append MOR segments; each segment adds one
# parquet dir to every point fetch's union scan, so read amplification grows
# linearly with segment count (measured in SCALING.md "Block-segment read
# amplification").  Past this many live segments the maintenance path
# auto-collapses them (one latest-wins + live-filter rewrite) — the Spark
# form of the reference overwriting blocks in place, amortized.
BLOCKS_AUTOCOMPACT_SEGMENTS = 8

# the BASE tables have the same read-amplification arithmetic as the block
# layout: every incremental insert appends one segment to vectors,
# adjacency, and key_map, and every fetch/scan unions the live segment
# dirs — so a long-running maintained stream would otherwise grow per-read
# cost linearly with tick count (the blocks bound alone would leave the
# two-fetch and exact paths unbounded).  Past this many live segments the
# violating insert collapses that table inline (catalog.compact:
# latest-wins merge, one new version, derived layouts restamped — bytes
# move, data doesn't).  Higher than the blocks threshold: base-table
# segments are plain unions (no per-row merge work until read), so the
# amortization window can be wider.
TABLES_AUTOCOMPACT_SEGMENTS = 16

# vacuum's default retention horizon (seconds): commits younger than this
# are never dropped regardless of ``keep``, protecting live as-of readers
# from the delete-mid-job race (Delta's retention-duration analog, which
# defaults to 7 days).  One hour is deliberately conservative for a
# maintenance default while still letting nightly jobs reclaim yesterday's
# snapshots; pass min_age_seconds=0 for immediate reclamation when no
# reader can be live.
DEFAULT_VACUUM_RETENTION = 3600.0

# maintained inserts assign new rows to FROZEN centroids, so IVF cell
# geometry drifts as appends accumulate and probe recall decays
# monotonically with no other signal.  Past this fraction of the corpus
# size AT BUILD TIME (the denominator a rebuild policy must use — the
# post-churn corpus size would let heavy delete traffic mask drift),
# insert_batch auto-refits the cells: one bounded-sample k-means + one
# assignment pass, the same cost as build_ivf, amortized over >=25% of a
# corpus of ingest.  The NUMERATOR counts appends AND tombstoned deletes
# (_layout_drift_n) — churn without net growth still moves the live
# distribution away from the frozen fit.  This closes the maintenance
# contract — auto-search never silently degrades: the layout is either
# within the drift budget or freshly refit.
IVF_AUTOREFIT_DRIFT = 0.25

# the PQ block layout has the same frozen-artifact drift as IVF: maintained
# inserts encode neighbor payloads with the codebook fit at build time, so a
# distribution shift in the ingest makes ADC routing noisier batch over
# batch (the exact final re-rank bounds the damage but can't re-rank
# candidates the noisy beam never retained).  Past this fraction of the
# build-time corpus, the maintained insert skips the frozen-codebook delta
# and rebuilds the layout with a REFIT codebook right after the commit —
# one PQ k-means + one block rewrite, amortized over >=25% of a corpus of
# ingest.  Maintained deletes count toward the same budget
# (_layout_drift_n).  Raw (uncompressed) layouts store exact copies and
# never drift.
BLOCKS_PQ_REFIT_DRIFT = 0.25

SUPPORTED_ELTYPES = ("float16", "float32", "float64")


def _layout_built_n(layout: dict, num_points: int) -> int:
    """The drift denominator for a frozen-artifact layout (IVF cells / PQ
    codebook): the corpus size when the artifact was FIT.  One definition
    shared by stats() and both insert-time refit policies, so the reported
    drift scalar and the trigger can never disagree.  Legacy layouts
    (pre-round-10 meta without ``built_n``) reconstruct it as the current
    count minus the appends made since — the best available estimate, and
    exact when no deletes happened."""
    return int(
        layout.get("built_n")
        or max(1, int(num_points) - int(layout.get("n_appended", 0)))
    )


def _layout_drift_n(layout: dict) -> int:
    """The drift NUMERATOR for a frozen-artifact layout: rows appended
    since the artifact was fit PLUS rows deleted since (IVF maintained
    deletes are probe-time tombstones; block maintained deletes leave dead
    rows unreachable — ``n_deleted`` counts both).  Deletes count because
    the policy's own rationale — the frozen centroids/codebook describe
    the corpus AT FIT TIME — applies symmetrically: deleting 40% of the
    corpus changes the live distribution just as surely as appending 40%
    OOD rows, and a churn workload (50% delete + 20% insert) has drifted
    70%, not 20%.  One definition shared by stats() and both insert-time
    refit triggers, mirroring _layout_built_n for the denominator."""
    return int(layout.get("n_appended", 0)) + int(layout.get("n_deleted", 0))


def _drop_ivf_tombstones(meta: dict) -> dict:
    """Unlist the ``ivf_tombstones`` table from a meta snapshot (rebuild /
    refit / compaction folded them away).  Dirs on disk are untouched —
    historical commits still reference them; vacuum reclaims by commit
    reachability."""
    meta = dict(meta)
    meta["versions"] = {
        k: v for k, v in meta.get("versions", {}).items() if k != "ivf_tombstones"
    }
    if "segments" in meta:
        meta["segments"] = {
            k: v for k, v in meta["segments"].items() if k != "ivf_tombstones"
        }
    return meta


def _drop_ivf_tables(meta: dict) -> dict:
    """Unlist BOTH IVF catalog tables plus the layout entry — the layout no
    longer exists in this lineage (stale after an unmaintained mutation, or
    every row tombstoned).  Same on-disk non-destruction contract as
    ``_drop_ivf_tombstones``."""
    meta = _drop_ivf_tombstones(meta)
    meta["versions"] = {
        k: v for k, v in meta["versions"].items()
        if k not in ("ivf_cells", "ivf_centroids")
    }
    if "segments" in meta:
        meta["segments"] = {
            k: v for k, v in meta["segments"].items()
            if k not in ("ivf_cells", "ivf_centroids")
        }
    meta.pop("ivf", None)
    return meta


def _vectors_schema(eltype: str) -> T.StructType:
    # float16: Spark/Parquet have no half type — stored as float32 whose
    # values are exact IEEE-half roundings (see _float16_quantize)
    el = T.DoubleType() if eltype == "float64" else T.FloatType()
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("key", T.StringType(), True),
            T.StructField("vec", T.ArrayType(el, False), False),
        ]
    )


def _float16_quantize(col):
    """Round every element through IEEE float16 (the reference's ``T=Float16``
    storage conversion, src/LMDiskANN.jl:40,462,546; tolerance semantics
    test/runtests.jl:631-634).  Arrow-batched numpy cast — insert-time only,
    never in the query hot path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _q(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return v
        x = np.vstack(v.to_numpy()).astype(np.float16).astype(np.float32)
        return pd.Series(list(x))

    return _q(col)


ADJACENCY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("neighbors", T.ArrayType(T.LongType(), False), False),
    ]
)


# index-level transaction log (Delta DESCRIBE HISTORY / time-travel analog):
# every save() appends the full post-commit meta to _commits/c<n>.json, so
# any retained snapshot can be reopened read-only (load(commit=N)) or made
# current again (restore(N)).  The records are tiny (meta JSON) — table DATA
# is never copied; time-travel reach is bounded by vacuum retention.
COMMITS_DIR = "_commits"


def _commit_path(path: str, commit: int) -> str:
    return os.path.join(path, COMMITS_DIR, f"c{int(commit):012d}.json")


def _append_commit(path: str, meta: dict, op: str) -> None:
    """Write the commit record BEFORE the meta pointer swaps (save): a crash
    between the two leaves an orphan record, which is harmless — it
    references table snapshots that were already durable — while the
    opposite order would leave a current state with no history row."""
    os.makedirs(os.path.join(path, COMMITS_DIR), exist_ok=True)
    rec = {"commit": int(meta["commit"]), "op": op, "ts": time.time(), "meta": meta}
    tmp = _commit_path(path, meta["commit"]) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
    os.replace(tmp, _commit_path(path, meta["commit"]))


def _read_commit(path: str, commit: int) -> dict:
    p = _commit_path(path, commit)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no commit {commit} at {path} — never written, or pruned by "
            f"vacuum (time-travel reach is bounded by vacuum retention)"
        )
    with open(p) as f:
        return json.load(f)


def _snapshot_dirs(
    path: str, meta: dict, include_legacy_ivf: bool = True
) -> list[str]:
    """Every on-disk directory a meta snapshot depends on: the catalog
    version dirs of each table, per THAT meta's segment list.  Since round
    12 this includes the IVF layout — ``ivf_cells`` / ``ivf_tombstones``
    are ordinary catalog tables, so a commit pins an exact IVF state the
    same way it pins the base tables (no more out-of-catalog dirs)."""
    dirs = []
    segs = meta.get("segments", {})
    for name, cur in meta.get("versions", {}).items():
        for v in segs.get(name) or [cur]:
            dirs.append(os.path.join(path, name, f"v={v}"))
    ivf = meta.get("ivf")
    if include_legacy_ivf and ivf and ivf.get("dir"):
        # LEGACY (pre-round-12) layout: the cell store lived in an
        # out-of-catalog dir recorded here, with its probe-time tombstones
        # in a sidecar NEXT TO it.  Keep protecting both so vacuum on an
        # upgraded index never destroys a live legacy store (or resurrects
        # deleted ids for pre-round-12 readers by dropping only the
        # sidecar); probes through it raise the curated rebuild error
        # (_ivf_assigned) until migrate_ivf() runs.
        dirs.append(ivf["dir"])
        dirs.append(ivf["dir"] + "_tombstones")
    return dirs


def _missing_snapshot_dirs(path: str, meta: dict) -> list[str]:
    """The dirs a commit needs for a historical read but which no longer
    exist on disk.  Every consumer of commit readability (load(commit=),
    restore, history's ``readable``, vacuum's record pruning) shares this
    one rule and cannot drift apart.

    The LEGACY (pre-round-12) IVF dir is deliberately NOT required: the
    pre-round-12 vacuum reclaimed superseded legacy cell dirs without
    commit awareness, so demanding them would render history that used to
    be readable (exact/beam — the legacy layout was never readable through
    the versioned contract anyway) permanently unreadable after the
    upgrade, and the next vacuum would then prune those commit records.
    As-of loads drop the legacy layout when its dir is gone instead."""
    return [
        d
        for d in _snapshot_dirs(path, meta, include_legacy_ivf=False)
        if not os.path.isdir(d)
    ]


class LMDiskANNIndex:
    """Distributed ANN index over Parquet tables (the ``LMDiskANNIndex``
    struct of src/LMDiskANN.jl:40-59, minus all mmap machinery)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.catalog = TableCatalog(spark, path)
        self.meta = read_meta(path)
        # set by load(commit=N): historical snapshots are read-only
        self._as_of: int | None = None

    # ---------------- lifecycle (ops 1-8) ----------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        dim: int,
        maxdegree: int = DEFAULT_MAX_DEGREE,
        metric: str = "euclidean",
        eltype: str = "float32",
        alpha: float | None = None,
    ) -> "LMDiskANNIndex":
        """create_index (src/LMDiskANN.jl:239-264): fix dim/maxdegree/eltype/
        metric, write empty snapshots of all three tables.

        eltype: 'float32' (default), 'float64', or 'float16' — the
        reference's three tested element types (test/runtests.jl:552-638).
        float16 is emulated: float32 storage holding exact half-precision
        roundings (Spark has no half type; numeric semantics match the
        reference's within-half-precision tolerance, :631-634).

        ``alpha`` (opt-in, default None = reference parity): every graph
        prune this index performs — bulk build and incremental maintain —
        runs alpha-DIVERSIFIED (RobustPrune, the DiskANN-paper device;
        graph.alpha_prune_and_collect) instead of the reference's plain
        nearest-k (src/LMDiskANN.jl:491-505).  Near-cluster neighbors
        dominate each other and collapse, keeping long cross-cluster edges
        alive — the structural fix for the islanding caveat documented at
        insert_batch (``refresh_entrypoints`` only lets beam ENTER an
        island; alpha keeps it connected).  Typical value 1.2; fixed at
        create time so every prune applies the same geometry.
        """
        if eltype not in SUPPORTED_ELTYPES:
            raise ValueError(f"eltype must be one of {SUPPORTED_ELTYPES}, got {eltype!r}")
        if alpha is not None and alpha < 1.0:
            raise ValueError(f"alpha must be >= 1.0, got {alpha}")
        if alpha is not None and isinstance(metric, str) and metric.lower() == "dot":
            # fail at create time, not at the first prune: dot's negative
            # "distances" invert the dominance rule (graph.alpha_prune_and_collect)
            raise ValueError("alpha pruning is undefined for metric='dot'")
        if os.path.exists(os.path.join(path, "_index_meta.json")) or os.path.isdir(
            os.path.join(path, COMMITS_DIR)
        ):
            # creating over a live index would interleave two lineages in one
            # commit log: the old records would survive, advertise readable
            # history, and time-travel reads through them would silently see
            # the new lineage's overwrites
            raise FileExistsError(
                f"an index (or its commit log) already exists at {path} — "
                "open it with load_index(), or create at a fresh directory"
            )
        meta = {
            "dim": dim,
            "maxdegree": maxdegree,
            "metric": metric,
            "eltype": eltype,
            **({"alpha": float(alpha)} if alpha is not None else {}),
            "num_points": 0,
            "next_id": 0,
            "entrypoint": -1,
            "versions": {},
        }
        catalog = TableCatalog(spark, path)
        meta = catalog.write("vectors", spark.createDataFrame([], _vectors_schema(eltype)), meta)
        meta = catalog.write("adjacency", spark.createDataFrame([], ADJACENCY_SCHEMA), meta)
        meta = catalog.write("key_map", spark.createDataFrame([], kvmap.KEY_MAP_SCHEMA), meta)
        meta["commit"] = 0
        # meta FIRST on the create path (the reverse of save()'s order):
        # a crash in between leaves a loadable index missing only its c0
        # history record, while record-first would leave a _commits/ dir
        # with no meta — a wedged state both create() (FileExistsError)
        # and load() (no index) refuse
        write_meta(path, meta)
        _append_commit(path, meta, "create")
        return cls(spark, path)

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        path: str,
        metric: str | None = None,
        commit: int | None = None,
    ) -> "LMDiskANNIndex":
        """load_index (src/LMDiskANN.jl:271-306): validate files, re-derive
        dtype from meta (without the reference's eval() quirk).

        ``commit`` (beyond the reference — Delta time-travel analog): open
        the index AS OF that commit of the transaction log.  All reads
        (search/get/kv) run against the historical snapshot — the
        reproducibility handle a training pipeline needs ("the corpus
        exactly as the last run saw it").  The handle is READ-ONLY:
        mutations raise (use ``restore`` on a current handle to make an old
        commit current again).  Raises FileNotFoundError if vacuum has
        dropped a snapshot the commit references.

        Read-while-vacuum contract: snapshot existence is validated at OPEN
        only — a ``vacuum()`` that drops this commit while a query is
        running fails that query with the parquet reader's raw
        FileNotFound, not this curated error.  Run vacuum with
        ``min_age_seconds`` covering the longest historical query (the
        Delta retention-duration analog) to make that race impossible.

        Exactness contract: ALL physical layouts are fully versioned —
        base tables and block layout as catalog snapshots + stamped MOR
        segments, and (round 12) the IVF cell store as catalog tables too
        (``ivf_cells`` append segments + an ``ivf_tombstones`` table), so
        exact, beam, AND ivf reads at a historical commit are bit-exact:
        the commit's segment list pins exactly the cell rows and
        tombstones that existed then, and appends from the future live in
        segments the historical meta never references."""
        if not os.path.exists(os.path.join(path, "_index_meta.json")):
            raise FileNotFoundError(f"no index at {path}")
        idx = cls(spark, path)
        if commit is not None:
            rec = _read_commit(path, commit)
            idx.meta = rec["meta"]
            idx._as_of = int(commit)
            missing = _missing_snapshot_dirs(path, rec["meta"])
            if missing:
                raise FileNotFoundError(
                    f"commit {commit} references vacuumed snapshots: {missing}"
                )
            ivf = idx.meta.get("ivf")
            if ivf and ivf.get("dir") and not os.path.isdir(ivf["dir"]):
                # legacy (pre-round-12) IVF dir already reclaimed by the
                # old, non-commit-aware vacuum: the commit's base tables
                # are intact (checked above — exact/beam reads are fine),
                # so drop the phantom layout instead of presenting an IVF
                # state that cannot be probed
                idx.meta = _drop_ivf_tables(idx.meta)
        if metric is not None:
            idx.meta["metric"] = metric
        return idx

    def _assert_writable(self) -> None:
        """Read-only guard + optimistic concurrency check.  The OCC check
        runs at MUTATION ENTRY (not just at save) so a stale handle fails
        BEFORE doing any work: version allocation is collision-proof
        (tables._next_version scans on-disk dirs), so the hazard is no
        longer data clobbering but a full mutation's worth of wasted jobs
        and orphan segment dirs before save() rejects the pointer swap.
        save() re-checks, narrowing the window to the mutation's own
        duration; two mutations overlapping in real time remain the
        caller's responsibility (single-writer contract — a real cluster
        swaps TableCatalog for Delta, whose log arbitrates writers; see
        sources/tables.py)."""
        if self._as_of is not None:
            raise ValueError(
                f"index opened as of commit {self._as_of} is read-only — "
                "load the current index (or restore this commit) to mutate"
            )
        disk = int(read_meta(self.path).get("commit", 0))
        parent = int(self.meta.get("commit", 0))
        if disk != parent:
            raise ValueError(
                f"concurrent modification: on-disk commit is {disk} but this "
                f"handle's parent commit is {parent} — reload the index and "
                "re-apply the mutation"
            )

    def save(self, op: str = "save") -> None:
        """save_index (src/LMDiskANN.jl:351-360): data snapshots are already
        durable per write; this flushes the meta pointer — and (beyond the
        reference) appends one immutable record to the ``_commits/``
        transaction log first, so the state being made current is always
        reopenable via ``load(commit=N)`` / ``restore(N)`` until vacuum
        drops the table snapshots it references.

        Optimistic concurrency (Delta-style): the commit this handle last
        saw must still be current on disk, else another writer committed in
        between and a blind pointer swap would silently orphan its commit —
        raises instead; reload and re-apply.  (A check-then-swap race
        window remains — plain files have no compare-and-swap — but every
        realistic lost-update sequence, where the writers' Spark jobs
        overlap for seconds-to-minutes, is caught.)"""
        self._assert_writable()  # includes the OCC parent-commit check
        self.meta = dict(self.meta)
        self.meta["commit"] = int(self.meta.get("commit", 0)) + 1
        _append_commit(self.path, self.meta, op)
        write_meta(self.path, self.meta)

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY analog: one row per retained commit, newest
        first — (commit, op, ts, num_points, readable).  ``readable`` is
        whether every table snapshot the commit references still exists
        (vacuum prunes unreadable records, but a record can transiently
        outlive a snapshot deleted by hand)."""
        d = os.path.join(self.path, COMMITS_DIR)
        rows = []
        if os.path.isdir(d):
            for fname in sorted(os.listdir(d), reverse=True):
                if not (fname.startswith("c") and fname.endswith(".json")):
                    continue
                with open(os.path.join(d, fname)) as f:
                    rec = json.load(f)
                rows.append(
                    {
                        "commit": int(rec["commit"]),
                        "op": rec.get("op", "?"),
                        "ts": rec.get("ts"),
                        "num_points": rec["meta"].get("num_points"),
                        "readable": not _missing_snapshot_dirs(
                            self.path, rec["meta"]
                        ),
                    }
                )
        return rows

    def restore(self, commit: int) -> "LMDiskANNIndex":
        """RESTORE analog: make an earlier commit the CURRENT state by
        committing its meta as a NEW entry — history is append-only, so a
        restore never rewinds the log (and is itself restorable-away).
        The IVF layout comes back with the commit (catalog segments pin its
        exact state, same as the base tables) — no rebuild needed."""
        self._assert_writable()
        rec = _read_commit(self.path, commit)
        meta = dict(rec["meta"])
        missing = _missing_snapshot_dirs(self.path, rec["meta"])
        if missing:
            raise FileNotFoundError(
                f"commit {commit} references vacuumed snapshots: {missing}"
            )
        meta["commit"] = int(self.meta.get("commit", 0))
        self.meta = meta
        self.save(op=f"restore:{commit}")
        return self

    def stats(self) -> dict:
        """Index diagnostics in one pass per table: point count, graph degree
        distribution (avg/max/min — the prune invariant says max <=
        maxdegree), key count, and on-disk bytes per current snapshot.
        Driver-side result is a handful of scalars."""
        import os as _os

        deg = self.adjacency.agg(
            F.count("*").alias("n"),
            F.avg(F.size("neighbors")).alias("avg_degree"),
            F.max(F.size("neighbors")).alias("max_degree"),
            F.min(F.size("neighbors")).alias("min_degree"),
        ).collect()[0]
        sizes = {}
        for name in self.meta["versions"]:
            sizes[name] = sum(
                _os.path.getsize(_os.path.join(dp, f))
                for v in self.catalog._segments(name, self.meta)
                for dp, _, fs in _os.walk(_os.path.join(self.path, name, f"v={v}"))
                for f in fs
            )
        return {
            "num_points": int(self.meta["num_points"]),
            # transaction-log position (round 11): the commit this handle
            # reads; as_of is set on time-traveled handles
            "commit": int(self.meta.get("commit", 0)),
            "as_of": self._as_of,
            "next_id": int(self.meta.get("next_id", 0)),
            "entrypoint": int(self.meta["entrypoint"]),
            "metric": self.meta["metric"],
            "maxdegree": int(self.meta["maxdegree"]),
            "n_keys": self.key_map.count(),
            "graph_nodes": int(deg["n"]),
            "avg_degree": float(deg["avg_degree"] or 0.0),
            "max_degree": int(deg["max_degree"] or 0),
            "min_degree": int(deg["min_degree"] or 0),
            "ivf_fresh": self._ivf_fresh(),
            # maintenance observability: how far each derived layout has
            # drifted from its training snapshot (frozen centroids / frozen
            # PQ codebook), and how much MOR read amplification the block
            # layout currently carries — the scalars a rebuild policy reads
            # numerator = appends + deletes since fit (_layout_drift_n):
            # tombstoned rows drift the live distribution away from the
            # frozen artifact exactly as appended rows do
            "ivf_drift": (
                _layout_drift_n(self.meta["ivf"])
                / _layout_built_n(self.meta["ivf"], self.meta["num_points"])
                if self.meta.get("ivf") else None
            ),
            "blocks_fresh": self._blocks_fresh(),
            # base-table read amplification: live segment dirs per union
            # read (bounded inline at TABLES_AUTOCOMPACT_SEGMENTS)
            "table_segments": {
                n: len(self.meta.get("segments", {}).get(n) or [1])
                for n in ("vectors", "adjacency", "key_map")
            },
            "table_autocompactions": int(self.meta.get("table_autocompactions", 0)),
            "blocks_segments": len(
                self.meta.get("segments", {}).get("beam_blocks")
                or ([1] if self.meta.get("beam_blocks") else [])
            ),
            "blocks_autocompactions": (
                int(self.meta["beam_blocks"].get("n_autocompactions", 0))
                if self.meta.get("beam_blocks") else None
            ),
            "blocks_appended": (
                int(self.meta["beam_blocks"].get("n_appended", 0))
                if self.meta.get("beam_blocks") else None
            ),
            # PQ-only: raw layouts append exact copies (no frozen artifact
            # to drift from); see BLOCKS_PQ_REFIT_DRIFT for the policy
            "blocks_pq_drift": (
                _layout_drift_n(self.meta["beam_blocks"])
                / _layout_built_n(self.meta["beam_blocks"], self.meta["num_points"])
                if self.meta.get("beam_blocks")
                and self.meta["beam_blocks"].get("compress") == "pq"
                else None
            ),
            "storage_bytes": sizes,
        }

    def compact(self, target_bytes: int = 128 * 2**20) -> "LMDiskANNIndex":
        """OPTIMIZE-style maintenance: coalesce each table's accumulated
        small files (incremental inserts write shuffle-partition-many files
        per snapshot) into right-sized ones, as new versions — run off the
        hot path; ``vacuum()`` (commit-aware) reclaims old snapshots.  Derived
        layouts are compacted too: block MOR segments collapse (dead rows
        dropped) and IVF probe-time tombstones fold into a rewritten cell
        table — and BOTH layouts stay FRESH across the rewrite (compaction
        moves bytes, never data)."""
        self._assert_writable()
        meta = self.meta
        ivf_was_fresh = self._ivf_fresh()
        for name in ("vectors", "adjacency", "key_map"):
            meta = self.catalog.compact(
                name, meta, target_bytes,
                merge_key="key" if name == "key_map" else "id",
            )
        if meta.get("beam_blocks") and "beam_blocks" in meta.get("versions", {}):
            # one latest-wins + live-filtered rewrite: collapses the
            # maintained-insert/delete segments AND drops dead nodes'
            # unreachable block rows (ids no longer in vectors) —
            # completing the delete contract for the block layout
            live = self.catalog.read("beam_blocks", meta, merge_key="id").join(
                self.catalog.read("vectors", meta).select("id"), "id", "left_semi"
            )
            meta = self._write_bucketed("beam_blocks", live, meta, empty=False)
            if self._blocks_fresh():
                # compaction rewrites bytes, not data: a layout that was
                # fresh stays fresh under the new snapshot versions
                bb = dict(meta["beam_blocks"])
                bb["built_from"] = [
                    meta["versions"]["vectors"], meta["versions"]["adjacency"]
                ]
                meta["beam_blocks"] = bb
        ivf = meta.get("ivf")
        # LEGACY (pre-round-12) layouts live outside the catalog: folding
        # their tombstones or collapsing their segments through the catalog
        # would KeyError on the unlisted 'ivf_cells' table — a routine
        # compact() must not fail on an upgraded index, so skip the layout
        # untouched (migrate_ivf() is the upgrade path).
        ivf_catalog = bool(ivf) and "ivf_cells" in meta.get("versions", {})
        if ivf_catalog and ivf.get("tombstones"):
            # fold probe-time tombstones into the cell table: one
            # live-filtered rewrite to a new catalog version + pointer
            # swap, so the anti-join cost (and the dead rows) stop riding
            # every probe.  Centroid drift (n_appended) deliberately
            # SURVIVES — compaction rewrites bytes, the centroids don't
            # refit.  Historical commits keep probing the pre-fold
            # segments + tombstones (bit-exact either way).
            live_rows = self._ivf_assigned(meta).persist()
            if live_rows.count() == 0:
                # every cell row was tombstoned: a 0-row partitioned write
                # would leave a schema-less dir that breaks every later
                # read (same landmine insert_batch/delete_batch guard) —
                # the layout covers nothing, so drop it instead
                live_rows.unpersist()
                meta = _drop_ivf_tables(meta)
                ivf = None
            else:
                meta = self.catalog.write(
                    "ivf_cells", live_rows, meta, partition_by=["cell"]
                )
                live_rows.unpersist()
                meta = _drop_ivf_tombstones(meta)
                ivf = dict(ivf)
                ivf.pop("tombstones", None)
                ivf["n_compactions"] = int(ivf.get("n_compactions", 0)) + 1
                meta["ivf"] = ivf
        elif ivf_catalog and len(self.catalog._segments("ivf_cells", meta)) > 1:
            # no tombstones but appended segments: collapse them
            meta = self._collapse_ivf_cells(meta)
            ivf = dict(ivf)
            ivf["n_compactions"] = int(ivf.get("n_compactions", 0)) + 1
            meta["ivf"] = ivf
        if ivf and ivf_was_fresh:
            # same contract as blocks above: compaction rewrites bytes, not
            # data — a fresh IVF layout must stay fresh under the new
            # vectors snapshot version (previously it silently staled here)
            ivf = dict(ivf)
            ivf["built_from"] = meta["versions"]["vectors"]
            meta["ivf"] = ivf
        self.meta = meta
        self.save(op="compact")
        return self

    # ---------------- table accessors ----------------

    @property
    def vectors(self) -> DataFrame:
        return self.catalog.read("vectors", self.meta)

    @property
    def adjacency(self) -> DataFrame:
        # merge-on-read: incremental inserts append only the touched rows
        # (stamped segments); the read resolves latest-wins per id
        return self.catalog.read("adjacency", self.meta, merge_key="id")

    @property
    def key_map(self) -> DataFrame:
        # merge-on-read by KEY: incremental inserts append (key, id) pairs
        # as stamped segments; latest segment wins = LevelDB put-overwrite
        return self.catalog.read("key_map", self.meta, merge_key="key")

    def _write_bucketed(self, name: str, df: DataFrame, meta: dict, empty: bool) -> dict:
        """Snapshot ``vectors``/``adjacency`` partitioned by the id bucket.
        An empty frame is written flat (a partitioned write of 0 rows leaves
        nothing to re-read); readers handle both layouts."""
        if empty:
            return self.catalog.write(name, df, meta)
        bucketed = df.withColumn(
            "_b", F.pmod(F.col("id"), F.lit(N_ID_BUCKETS)).cast("int")
        )
        return self.catalog.write(name, bucketed, meta, partition_by=["_b"])

    def _fetcher(self, table: str):
        """Point-lookup fetch over a bucketed snapshot: prune partitions by
        the ids' buckets, then filter (literal isin for small sets, broadcast
        semi-join for large — no plan-size blowup).  MOR tables resolve
        latest-wins AFTER the pruned filter (few rows), so the window never
        blocks pruning."""
        from lmdiskann_jl_spark.sources.tables import merge_rows

        raw = self.catalog.read(table, self.meta, raw=True)
        has_bucket = "_b" in raw.columns
        spark = self.spark

        def fetch(ids):
            vals = sorted({int(i) for i in ids})
            df = raw
            if has_bucket and vals:
                # the IN lists are assembled as ONE parsed SQL string: the
                # Column DSL's isin() pays one py4j round-trip per literal
                # (~0.7 ms each — 0.19 s of driver time per 200-id fetch,
                # measured round 15), the parsed form ~1 ms total for the
                # identical In(attr, literals) predicate.  Values are ints
                # by construction.  Same plan, same pushdown.
                buckets = sorted({v % N_ID_BUCKETS for v in vals})
                df = df.filter(F.expr(f"_b IN ({','.join(map(str, buckets))})"))
            if not vals:
                df = df.filter(F.lit(False))
            elif len(vals) <= 512:
                df = df.filter(F.expr(f"id IN ({','.join(map(str, vals))})"))
            else:
                ids_df = F.broadcast(
                    spark.createDataFrame([(v,) for v in vals], "id long")
                )
                df = df.join(ids_df, "id", "left_semi")
            df = merge_rows(df, "id")
            return df.drop("_b") if has_bucket else df

        return fetch

    # ---------------- mutation (ops 9-10) ----------------

    def insert_batch(
        self,
        new_vecs: DataFrame,
        vec_col: str = "vec",
        key_col: str | None = None,
        rebuild_graph: bool = False,
        maintain_ivf: bool = False,
        maintain_blocks: bool = False,
        graph_knn: str = "auto",
        refresh_entrypoints: bool = False,
    ) -> "LMDiskANNIndex":
        """Batch ann_insert! (src/LMDiskANN.jl:531-584).

        Assigns dense ids (max_id+1 ...) deterministically by input order of
        ``key_col`` (or vector hash), auto-generates string keys =
        ``str(id)`` when absent (``:553-556``), appends to ``vectors`` and
        ``key_map``, and updates ``adjacency`` incrementally (back-links +
        re-prune touched nodes) — or rebuilds it when ``rebuild_graph``.

        NAVIGABILITY CAVEAT (shared with the reference): neighbor pruning
        is plain nearest-k (the reference's _prune_neighbors,
        src/LMDiskANN.jl:491-506 — no RobustPrune alpha-diversity), so a
        batch that is FAR from the existing corpus can island: its nodes
        link among themselves, and full existing nodes prune the inbound
        back-links to it (the reference's one-at-a-time ann_insert! drops
        them the same way once nodes reach maxdegree, :567-573).  Beam
        search then cannot route into the new region from old seeds.
        Out-of-distribution ingest should pass ``rebuild_graph=True`` (or
        rebuild layouts afterwards — refit entrypoints spread over the new
        region); IVF/exact modes are unaffected.
        ``refresh_entrypoints`` (with ``maintain_blocks``) is the cheap
        middle path: re-pick the layout's spread seeds over old∪new ids
        (one TakeOrdered job per batch) so hash-uniform seeding can land
        in newly-ingested regions — routing can then ENTER an island from
        a seed inside it even though cross-cluster edges are still thin.
        Off by default: it changes stored seeds batch over batch, and most
        ingest is in-distribution where existing seeds already cover the
        corpus.  The STRUCTURAL fix is ``create_index(..., alpha=1.2)``:
        every prune then runs alpha-diversified (RobustPrune,
        graph.alpha_prune_and_collect), near-cluster neighbors collapse
        into few slots, and the back-link to a far batch survives pruning —
        the island stays connected with the ORIGINAL seeds.

        ``maintain_blocks``: when a FRESH block layout exists, incremental
        inserts also append the touched block rows (the adjacency MERGE
        delta re-joined with vectors — PQ copies encoded with the FROZEN
        codebook, like IVF's frozen centroids) as a stamped merge-on-read
        segment, keeping beam search on the one-fetch path across ingest —
        the Spark form of the reference updating node blocks in place
        during ``ann_insert!`` (:567-573).  Without it the layout goes
        stale and beam falls back to the two-fetch path until rebuilt.
        """
        self._assert_writable()
        eltype = self.meta["eltype"]
        el = "double" if eltype == "float64" else "float"
        base = self._next_id()
        order_expr = F.col(key_col) if key_col else F.hash(F.col(vec_col).cast("array<double>").cast("string"))
        from pyspark.sql import Window

        # Scalable dense-id assignment: range-partition by the order key, then
        # rank WITHIN each partition and add the partition's cumulative offset
        # (a tiny driver-side exchange of per-partition counts).  A global
        # Window.orderBy would funnel the whole batch through ONE partition —
        # fine for micro-batches, a bulk-load killer at 100 TB.
        npart = max(1, min(new_vecs.rdd.getNumPartitions(),
                           self.spark.sparkContext.defaultParallelism))
        parted = (
            new_vecs.withColumn("_ord", order_expr)
            .repartitionByRange(npart, F.col("_ord"))
            .withColumn("_pid", F.spark_partition_id())
            .persist()  # pin partition identity: the counts job and the main
            # job must see the SAME range placement
        )
        counts = {r["_pid"]: r["cnt"] for r in
                  parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
        n_new = sum(counts.values())
        if n_new == 0:
            # appending a 0-row PARTITIONED segment leaves a schema-less dir
            # that breaks every later read of the table — an empty batch is
            # a no-op commit
            parted.unpersist()
            return self
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = F.broadcast(self.spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
        ))
        w = Window.partitionBy("_pid").orderBy("_ord")
        prepared = (
            parted.join(off_df, "_pid")
            .withColumn("id", F.row_number().over(w).cast("long") + F.col("_off") + F.lit(base) - 1)
            .withColumn(
                "key",
                F.col(key_col).cast("string") if key_col
                else (F.col("id") + 1).cast("string"),  # auto-key = string(1-based id), :553-556
            )
            .select("id", "key", F.col(vec_col).cast(f"array<{el}>").alias("vec"))
        )
        if eltype == "float16":
            prepared = prepared.withColumn("vec", _float16_quantize(F.col("vec")))

        ivf_live = maintain_ivf and self._ivf_fresh()
        refit_blocks = None  # set when PQ codebook drift crosses its budget
        if rebuild_graph or base == 0:
            # initial load / explicit rebuild: full snapshots.  graph_knn
            # governs candidate generation HERE too (round 9; previously
            # only the incremental path switched): a 10^9-row bulk load
            # through the facade must take the LSH-bucketed build, never
            # the brute n^2 crossJoin — 'auto' switches on the post-load
            # corpus size, same threshold as the incremental path.
            n_total = int(self.meta["num_points"]) + n_new
            bulk_lsh = graph_knn == "lsh" or (
                graph_knn == "auto" and n_total > LSH_INSERT_THRESHOLD
            )
            new_key_map = kvmap.insert_keys(self.key_map, prepared.select("key", "id"))
            new_vectors_tbl = self.vectors.unionByName(prepared)
            new_adj = build_adjacency(
                new_vectors_tbl, maxdegree=self.meta["maxdegree"],
                metric=self.meta["metric"],
                use_lsh=bulk_lsh, dim=int(self.meta["dim"]),
                alpha=self.meta.get("alpha"),
            )
            meta = self._write_bucketed("vectors", new_vectors_tbl, self.meta, empty=False)
            meta = self._write_bucketed("adjacency", new_adj, meta, empty=False)
            meta = self.catalog.write("key_map", new_key_map, meta)
        else:
            # O(batch) incremental commit — existing data is neither read nor
            # rewritten: new vectors append as a plain segment (ids are
            # unique forever, union-read IS the merge); the adjacency MERGE
            # delta (new + touched rows only) appends as a stamped segment
            # resolved latest-wins at read (merge-on-read).  This is the
            # manifest-append Delta/Iceberg would commit; a full
            # copy-on-write per batch would make ingest O(table) at 100 TB.
            # candidate generation: brute is exact and right for small
            # indexes; past the threshold the batch x table crossJoin is the
            # ingest bottleneck and LSH bucketing is the scale path
            # (graph_knn='auto' switches on index size)
            use_lsh = graph_knn == "lsh" or (
                graph_knn == "auto"
                and int(self.meta["num_points"]) > LSH_INSERT_THRESHOLD
            )
            adj_delta = insert_batch_adjacency(
                self.vectors, self.adjacency, prepared,
                maxdegree=self.meta["maxdegree"], metric=self.meta["metric"],
                changed_only=True,
                use_lsh=use_lsh, dim=int(self.meta["dim"]),
                alpha=self.meta.get("alpha"),
            )
            blocks_live = maintain_blocks and self._blocks_fresh()
            if blocks_live:
                # two consumers below (adjacency append + block delta):
                # persist so the MERGE kNN join runs once
                adj_delta = adj_delta.persist()
            bucket = F.pmod(F.col("id"), F.lit(N_ID_BUCKETS)).cast("int")
            meta = self.catalog.append(
                "vectors", prepared.withColumn("_b", bucket), self.meta,
                partition_by=["_b"],
            )
            meta = self.catalog.append(
                "adjacency", adj_delta.withColumn("_b", bucket), meta,
                partition_by=["_b"], stamp_segment=True,
            )
            # key_map: upsert = append the (deduped-per-key) pairs as a
            # stamped segment; latest segment wins per key at read
            new_pairs = (
                prepared.select("key", "id").groupBy("key").agg(F.max("id").alias("id"))
            )
            meta = self.catalog.append("key_map", new_pairs, meta, stamp_segment=True)
            if blocks_live:
                bb = dict(self.meta["beam_blocks"])
                blocks_built_n = _layout_built_n(bb, self.meta["num_points"])
                blocks_n_app = int(bb.get("n_appended", 0)) + n_new
                # trigger on appends + deletes since fit — the SAME
                # definition stats() reports (churn drifts the corpus even
                # when net growth is small)
                blocks_drift_n = _layout_drift_n({**bb, "n_appended": blocks_n_app})
                if bb.get("compress") == "pq" and (
                    blocks_drift_n > BLOCKS_PQ_REFIT_DRIFT * max(1, blocks_built_n)
                ):
                    # codebook drift policy: this batch pushes the frozen
                    # codebook past its budget — skip the frozen-encode
                    # delta (it would be the noisiest segment yet) and
                    # rebuild the layout with a REFIT codebook right after
                    # the table stamps settle (refit_blocks marks it).
                    # Durability note: on this path the WHOLE batch commit
                    # rides on build_beam_blocks' internal save — the meta
                    # pointer swaps only after the refit layout is written,
                    # so a mid-refit crash rolls back the entire batch
                    # (segments become orphan files, no pointer swap), not
                    # just block freshness.  That is still atomic/safe, but
                    # don't move save() earlier without re-deriving this.
                    refit_blocks = bb
                    adj_delta.unpersist()
                else:
                    # block maintenance: rebuild ONLY the touched rows'
                    # blocks (new nodes + back-linked existing nodes = the
                    # adjacency delta) over old-union-new vectors, append
                    # latest-wins
                    all_vecs = self.vectors.select("id", "vec").unionByName(
                        prepared.select("id", "vec")
                    )
                    blocks_delta = self._block_rows(
                        adj_delta, all_vecs, bb.get("compress"),
                        bb.get("codebook"),
                        len(bb["codebook"]) if bb.get("codebook") else 8,
                        normalized=bb.get("normalized", False),
                    )
                    meta = self.catalog.append(
                        "beam_blocks", blocks_delta.withColumn("_b", bucket), meta,
                        partition_by=["_b"], stamp_segment=True,
                    )
                    if refresh_entrypoints:
                        # opt-in navigability aid (see docstring): re-pick
                        # the spread seeds over old∪new ids so hash-uniform
                        # seeding covers newly-ingested regions
                        from lmdiskann_jl_spark.operators.beam import _pick_entrypoints

                        bb["entrypoints"] = _pick_entrypoints(
                            all_vecs, "id",
                            int(bb.get("n_entrypoints")
                                or max(1, len(bb.get("entrypoints") or []))),
                        )
                    bb["built_from"] = [
                        meta["versions"]["vectors"], meta["versions"]["adjacency"]
                    ]
                    bb["n_appended"] = blocks_n_app
                    meta["beam_blocks"] = bb
                    meta = self._maybe_autocompact_blocks(meta)
                    adj_delta.unpersist()
        if ivf_live:
            ivf = dict(self.meta["ivf"])
            built_n = _layout_built_n(ivf, self.meta["num_points"])
            n_appended = int(ivf.get("n_appended", 0)) + n_new
            # appends + tombstoned deletes both count — the SAME definition
            # stats() reports (_layout_drift_n)
            ivf_drift_n = _layout_drift_n({**ivf, "n_appended": n_appended})
            if ivf_drift_n > IVF_AUTOREFIT_DRIFT * max(1, built_n):
                # drift policy: frozen-centroid assignment has accumulated
                # past the budget — refit the cells from the CURRENT corpus
                # (the new vectors segment is already committed into
                # ``meta``, so one bounded-sample k-means + one assignment
                # pass covers everything, including this batch).  Probe-time
                # tombstones die with the old layout: the refit reads only
                # live vectors.  Without this, a long-lived maintained index
                # degrades recall unboundedly with no signal but a stat.
                from lmdiskann_jl_spark.operators.ivf import build_ivf as _build

                live = self.catalog.read("vectors", meta).select("id", "vec")
                centroids, assigned = _build(
                    live, n_cells=int(ivf["n_cells"]),
                    metric=self.meta["metric"], seed=int(ivf.get("seed", 42)),
                )
                meta = self.catalog.write("ivf_centroids", centroids, meta)
                meta = self.catalog.write(
                    "ivf_cells", assigned.select("id", "vec", "cell"), meta,
                    partition_by=["cell"],
                )
                # probe-time tombstones die with the refit: it reads only
                # live vectors
                meta = _drop_ivf_tombstones(meta)
                meta["ivf"] = {
                    "n_cells": int(ivf["n_cells"]),
                    "seed": int(ivf.get("seed", 42)),
                    "built_from": meta["versions"]["vectors"],
                    "built_n": int(self.meta["num_points"]) + n_new,
                    "n_refits": int(ivf.get("n_refits", 0)) + 1,
                }
            else:
                # within budget: assign the new rows to their nearest
                # EXISTING centroid (broadcast centroids — no KMeans refit,
                # no rescan of old rows) and append them as a NEW catalog
                # segment (O(batch), transactional with the meta commit —
                # the segment joins the snapshot only when save() swaps the
                # pointer, so a crash mid-append leaves an orphan dir, not
                # a half-visible layout)
                from lmdiskann_jl_spark.operators.ivf import assign_cells

                centroids = self.catalog.read("ivf_centroids", self.meta)
                meta = self.catalog.append(
                    "ivf_cells",
                    assign_cells(prepared, centroids, self.meta["metric"])
                    .select("id", "vec", "cell"),
                    meta,
                    partition_by=["cell"],
                )
                ivf["built_from"] = meta["versions"]["vectors"]
                ivf["n_appended"] = n_appended
                meta["ivf"] = ivf
        else:
            # cell layout no longer covers the new rows: unlist it (dirs
            # stay for historical commits; vacuum reclaims by reachability)
            meta = _drop_ivf_tables(meta)
        # base-table segment bound LAST, after every layout stamp above is
        # final (the restamp inside must see the freshness this batch set)
        meta = self._maybe_autocompact_tables(meta)
        parted.unpersist()
        meta["num_points"] = int(meta["num_points"]) + n_new
        # next_id is monotone — NEVER decremented by deletes, so freed ids are
        # not reused and insert-after-delete cannot collide (the reference
        # reuses slots via its freelist, src/LMDiskANN.jl:534-537; Spark
        # rewrites files, so uniqueness-forever is the simpler invariant)
        meta["next_id"] = base + n_new
        if meta["entrypoint"] < 0 and meta["num_points"] > 0:
            meta["entrypoint"] = base  # first insert seeds entrypoint, :549-561
        self.meta = meta
        if refit_blocks is not None:
            # PQ codebook refit (BLOCKS_PQ_REFIT_DRIFT): the batch is
            # committed, so the standard build path sees the full current
            # corpus — fresh codebook, fresh built_n snapshot, fresh stamps
            cb = refit_blocks["codebook"]
            self.build_beam_blocks(
                n_entrypoints=int(
                    refit_blocks.get("n_entrypoints")
                    or max(1, len(refit_blocks.get("entrypoints") or []))
                ),
                compress="pq", pq_m=len(cb), pq_k=len(cb[0]),
            )
            bbn = dict(self.meta["beam_blocks"])
            bbn["n_refits"] = int(refit_blocks.get("n_refits", 0)) + 1
            self.meta["beam_blocks"] = bbn
            meta = self.meta
        self.save(op="insert_batch")
        return self

    def _next_id(self) -> int:
        """First id for the next insert batch.  Prefers the persisted
        ``next_id`` watermark; legacy indexes without one derive it from the
        live max id (NOT num_points, which shrinks on delete)."""
        nid = self.meta.get("next_id")
        if nid is not None:
            return int(nid)
        row = self.vectors.agg(F.max("id").alias("m")).collect()[0]
        return int(row["m"]) + 1 if row["m"] is not None else 0

    def delete_batch(
        self,
        ids: Sequence[int] | DataFrame | None = None,
        keys: Sequence[str] | DataFrame | None = None,
        maintain_ivf: bool = False,
        maintain_blocks: bool = False,
    ) -> "LMDiskANNIndex":
        """Batch ann_delete! (src/LMDiskANN.jl:605-646): resolve keys -> ids,
        drop rows from vectors/key_map, remove the ids from all neighbor
        lists, repair entrypoint if deleted.

        The dead-id set is carried as a DataFrame end-to-end — anti-joins,
        never ``isin`` literal lists — so a 10^6-id delete is the same plan
        as a 10-id delete (no plan-size blowup, broadcast-hash anti-joins).
        ``ids``/``keys`` accept a DataFrame (columns ``id`` / ``key``) or a
        driver-side sequence.

        ``maintain_blocks``: when a FRESH block layout exists, append the
        repaired blocks of survivors that referenced a dead neighbor (the
        reference's in-place neighbor-list repair, :622-629) and repair the
        stored entrypoints, keeping beam on the one-fetch path.  Dead nodes'
        own block rows become unreachable garbage (no live block references
        them and seeds are live) collapsed at the next full build/compact —
        the same contract as the reference's zeroed tombstone slots.

        Maintained deletes COUNT TOWARD the frozen-artifact drift budgets
        (``n_deleted`` joins ``n_appended`` in _layout_drift_n's numerator
        for both IVF centroids and the PQ codebook): churn moves the live
        distribution away from the fit-time corpus even when net growth is
        zero, so a delete-heavy workload crosses the 25% budget in stats()
        and the next maintained insert auto-refits.  The reference has no
        analog — it never refits anything.
        """
        self._assert_writable()
        dead: DataFrame | None = None
        if ids is not None:
            dead = (
                ids.select(F.col("id").cast("long"))
                if isinstance(ids, DataFrame)
                else self.spark.createDataFrame([(int(i),) for i in ids], "id long")
            )
        if keys is not None:
            keys_df = (
                keys.select(F.col("key").cast("string"))
                if isinstance(keys, DataFrame)
                else self.spark.createDataFrame([(str(k),) for k in keys], "key string")
            )
            by_key = self.key_map.join(F.broadcast(keys_df), "key", "left_semi").select("id")
            dead = by_key if dead is None else dead.unionByName(by_key)
        if dead is None:
            return self
        # only ids actually present count toward num_points (the reference
        # raises on unknown ids, :614-620; we drop them silently but must not
        # corrupt the count)
        dead = dead.distinct().join(self.vectors.select("id"), "id", "left_semi").persist()
        n_dead = dead.count()
        if n_dead == 0:
            dead.unpersist()
            return self
        new_vectors = self.vectors.join(dead, "id", "left_anti")
        new_adj = delete_from_adjacency(self.adjacency, dead)
        new_key_map = kvmap.delete_by_ids(self.key_map, dead)

        ivf_live = maintain_ivf and self._ivf_fresh()
        all_deleted = int(self.meta["num_points"]) - n_dead <= 0
        blocks_live = maintain_blocks and self._blocks_fresh() and not all_deleted
        if blocks_live:
            # survivors whose neighbor list referenced a dead id — computed
            # against the PRE-delete adjacency, before the snapshot swap
            touched = (
                self.adjacency.select("id", F.explode("neighbors").alias("nbr"))
                .join(F.broadcast(dead.select(F.col("id").alias("nbr"))), "nbr", "left_semi")
                .select("id")
                .distinct()
                .join(dead, "id", "left_anti")
                .persist()
            )
            touched.count()  # pin before the underlying snapshots change
        meta = self._write_bucketed("vectors", new_vectors, self.meta, empty=all_deleted)
        meta = self._write_bucketed("adjacency", new_adj, meta, empty=all_deleted)
        meta = self.catalog.write("key_map", new_key_map, meta)
        if blocks_live:
            bb = dict(self.meta["beam_blocks"])
            # a delete can touch NO survivor (the dead node had no in-edges
            # after degree pruning): appending a 0-row partitioned segment
            # would leave a schema-less dir that breaks every later read —
            # skip the append, the repair below is a no-op anyway
            if touched.count() > 0:
                delta_adj = new_adj.join(touched, "id", "left_semi")
                blocks_delta = self._block_rows(
                    delta_adj, new_vectors.select("id", "vec"), bb.get("compress"),
                    bb.get("codebook"), len(bb["codebook"]) if bb.get("codebook") else 8,
                    normalized=bb.get("normalized", False),
                )
                bucket = F.pmod(F.col("id"), F.lit(N_ID_BUCKETS)).cast("int")
                meta = self.catalog.append(
                    "beam_blocks", blocks_delta.withColumn("_b", bucket), meta,
                    partition_by=["_b"], stamp_segment=True,
                )
            dead_set = {
                int(r["id"])
                for r in dead.filter(
                    F.col("id").isin([int(e) for e in bb["entrypoints"]])
                ).collect()
            }
            if dead_set:
                from lmdiskann_jl_spark.operators.beam import _pick_entrypoints

                bb["entrypoints"] = _pick_entrypoints(
                    new_vectors, "id", max(1, len(bb["entrypoints"]))
                )
            if bb.get("compress") == "pq":
                # deletes count toward codebook drift (_layout_drift_n): the
                # dead rows' distribution mass leaves the live corpus while
                # the frozen codebook keeps describing it.  Raw layouts
                # store exact copies — nothing frozen to drift from.
                bb["n_deleted"] = int(bb.get("n_deleted", 0)) + n_dead
            bb["built_from"] = [
                meta["versions"]["vectors"], meta["versions"]["adjacency"]
            ]
            meta["beam_blocks"] = bb
            meta = self._maybe_autocompact_blocks(meta)
            touched.unpersist()
        elif all_deleted:
            meta.pop("beam_blocks", None)
        if ivf_live:
            # incremental IVF maintenance: tombstone the dead ids (probe-time
            # anti-join filters them) instead of dropping the whole layout —
            # the cell copy is immutable, so deletes are metadata-sized.
            # Tombstones are a catalog table: the append is a new segment
            # that becomes visible only at the meta commit, and historical
            # commits pin exactly the tombstones that existed then.
            dead_ids = dead.select("id")
            if "ivf_tombstones" in meta.get("versions", {}):
                meta = self.catalog.append("ivf_tombstones", dead_ids, meta)
                # one segment per maintained delete (streaming: per
                # micro-batch) — bound it like every other table, or each
                # probe's anti-join unions an unbounded dir list.  Ids are
                # insert-only, so the union IS the merge.
                if (
                    len(meta["segments"].get("ivf_tombstones") or [])
                    >= TABLES_AUTOCOMPACT_SEGMENTS
                ):
                    meta = self.catalog.write(
                        "ivf_tombstones",
                        self.catalog.read("ivf_tombstones", meta),
                        meta,
                    )
                    meta["table_autocompactions"] = (
                        int(meta.get("table_autocompactions", 0)) + 1
                    )
            else:
                meta = self.catalog.write("ivf_tombstones", dead_ids, meta)
            ivf = dict(self.meta["ivf"])
            ivf["built_from"] = meta["versions"]["vectors"]
            ivf["tombstones"] = True
            # tombstones count toward centroid drift (_layout_drift_n): a
            # churn workload must not read as 0 drift while the frozen
            # centroids describe a corpus that no longer exists.  The next
            # maintained insert past the budget refits; until then stats()
            # reports the crossing.  Folding tombstones at compact() keeps
            # this counter — compaction moves bytes, the centroids stay fit
            # on the old corpus.
            ivf["n_deleted"] = int(ivf.get("n_deleted", 0)) + n_dead
            meta["ivf"] = ivf
        else:
            # stale probes would surface deleted ids: unlist the layout
            meta = _drop_ivf_tables(meta)
        meta["num_points"] = max(0, int(meta["num_points"]) - n_dead)
        ep = int(meta["entrypoint"])
        if ep >= 0 and dead.filter(F.col("id") == ep).count() > 0:  # repair, :630-638
            live = new_vectors.select("id").orderBy("id").limit(1).collect()
            meta["entrypoint"] = int(live[0]["id"]) if live else -1
        dead.unpersist()
        self.meta = meta
        self.save(op="delete_batch")
        return self

    # ---------------- query (ops 11-18) ----------------

    def build_ivf(self, n_cells: int = 16, seed: int = 42) -> "LMDiskANNIndex":
        """Fit and persist the IVF layout: a tiny ``ivf_centroids`` table and
        a cell-partitioned copy of the vectors (partition pruning makes
        ``search(mode='ivf')`` scan only the probed cells).

        Both live in the ``TableCatalog`` (round 12): ``ivf_cells`` is a
        versioned snapshot like any base table, so commits pin an exact IVF
        state and time travel / restore cover mode='ivf' — previously the
        cell store was an out-of-catalog dir maintained by in-place
        appends, the one exception to the versioned-snapshot contract."""
        self._assert_writable()
        from lmdiskann_jl_spark.operators.ivf import build_ivf as _build

        centroids, assigned = _build(
            self.vectors, n_cells=n_cells, metric=self.meta["metric"], seed=seed
        )
        meta = self.catalog.write("ivf_centroids", centroids, self.meta)
        meta = self.catalog.write(
            "ivf_cells", assigned.select("id", "vec", "cell"), meta,
            partition_by=["cell"],
        )
        meta = _drop_ivf_tombstones(meta)  # a rebuild starts with none
        # version-stamp the layout with the vectors snapshot it was built
        # from: any later mutation bumps that version, so a stale IVF can be
        # detected (and is also dropped eagerly by insert/delete)
        meta["ivf"] = {
            "n_cells": n_cells,
            "seed": seed,
            "built_from": meta["versions"]["vectors"],
            # corpus size at fit time: the drift denominator.  n_appended /
            # built_n is the fraction of rows assigned to frozen centroids;
            # dividing by the CURRENT num_points instead would shrink under
            # deletes and overstate health under churn.
            "built_n": int(self.meta["num_points"]),
        }
        self.meta = meta
        self.save(op="build_ivf")
        return self

    def _ivf_assigned(self, meta: dict | None = None) -> DataFrame:
        """The IVF cell table's live rows — union of the catalog's
        ``ivf_cells`` segments minus probe-time tombstones.  Hive ``cell``
        partitioning survives the union, so probe-time cell filters still
        prune; tombstones are a broadcast anti-join (metadata-sized)."""
        meta = self.meta if meta is None else meta
        if "ivf_cells" not in meta.get("versions", {}):
            # pre-round-12 layout: cells lived in an out-of-catalog dir
            # (meta['ivf']['dir']) maintained by in-place appends — not
            # readable through the versioned-snapshot contract
            raise ValueError(
                "legacy IVF layout (pre-catalog cell store) — migrate it "
                "with migrate_ivf(), rebuild with build_ivf(), or search "
                "with mode='exact'/'beam'"
            )
        assigned = self.catalog.read("ivf_cells", meta)
        if meta["ivf"].get("tombstones"):
            tombs = self.catalog.read("ivf_tombstones", meta)
            assigned = assigned.join(F.broadcast(tombs), "id", "left_anti")
        return assigned

    def migrate_ivf(self) -> "LMDiskANNIndex":
        """One-time upgrade of a LEGACY (pre-round-12) IVF cell store into
        the versioned catalog layout.  The legacy shape kept the cell rows
        in an out-of-catalog dir (``meta['ivf']['dir']``, maintained by
        in-place appends) with probe-time tombstones in a ``_tombstones``
        sidecar next to it; neither is readable through the
        versioned-snapshot contract, so every probe raises the curated
        rebuild error and maintenance treats the layout as absent.

        Migration is one live-filtered rewrite on machinery that already
        exists: read the legacy dir, anti-join the sidecar's tombstoned
        ids (the same fold compact() applies to catalog tombstones), and
        write the survivors through ``catalog.write('ivf_cells', ...)``.
        The ``dir`` key is dropped from the layout entry — the legacy dir
        itself stays on disk for historical commits that reference it and
        is reclaimed by vacuum once those commits age out.  Freshness is
        preserved, not granted: ``built_from`` is carried over unchanged,
        so a layout that was stale before migration stays stale (rebuild
        to refresh) while a fresh one becomes probe-able immediately."""
        self._assert_writable()
        ivf = self.meta.get("ivf")
        if not ivf or "ivf_cells" in self.meta.get("versions", {}):
            return self  # already catalog-shaped (or no layout): no-op
        legacy_dir = ivf.get("dir")
        if not legacy_dir or not os.path.isdir(legacy_dir):
            # dead reference — the old vacuum already reclaimed the store;
            # nothing to migrate, so stop carrying the phantom layout
            self.meta = _drop_ivf_tables(self.meta)
            self.save(op="migrate_ivf")
            return self
        cells = self.spark.read.parquet(legacy_dir).select("id", "vec", "cell")
        sidecar = legacy_dir + "_tombstones"
        if os.path.isdir(sidecar):
            tombs = self.spark.read.parquet(sidecar).select("id").distinct()
            cells = cells.join(F.broadcast(tombs), "id", "left_anti")
        cells = cells.persist()
        if cells.count() == 0:
            # every row was tombstoned: a 0-row partitioned write would
            # leave a schema-less dir (same landmine as compact()'s fold) —
            # the layout covers nothing, drop it instead
            cells.unpersist()
            self.meta = _drop_ivf_tables(self.meta)
            self.save(op="migrate_ivf")
            return self
        meta = self.catalog.write(
            "ivf_cells", cells, self.meta, partition_by=["cell"]
        )
        cells.unpersist()
        new_ivf = {k: v for k, v in ivf.items() if k not in ("dir", "tombstones")}
        meta["ivf"] = new_ivf
        self.meta = meta
        self.save(op="migrate_ivf")
        return self

    def _collapse_ivf_cells(self, meta: dict) -> dict:
        """Collapse the ``ivf_cells`` segment list (and its small files)
        back to one cell-partitioned snapshot — rows are insert-only, so
        the union IS the merge.  Shared by compact() and the inline
        autocompact bound so the two cannot diverge."""
        meta = self.catalog.write(
            "ivf_cells", self.catalog.read("ivf_cells", meta), meta,
            partition_by=["cell"],
        )
        return meta

    def _ivf_fresh(self) -> bool:
        """True iff an IVF layout exists, lives in the catalog, AND matches
        the current vectors snapshot (mutations invalidate it — stale
        probes would return deleted ids / miss new ones).  A LEGACY
        (pre-round-12, out-of-catalog) layout is never fresh: it cannot be
        probed, appended to, or tombstoned through the versioned-snapshot
        contract, so every maintenance path must treat it as absent (the
        maintain_ivf branches then unlist rather than KeyError into the
        catalog) and auto mode must never select it.  ``migrate_ivf()``
        brings it into the catalog."""
        ivf = self.meta.get("ivf")
        return (
            bool(ivf)
            and "ivf_cells" in self.meta.get("versions", {})
            and ivf.get("built_from") == self.meta["versions"]["vectors"]
        )

    def build_beam_blocks(
        self, n_entrypoints: int = 8, compress: str | None = None,
        pq_m: int = 8, pq_k: int = 32,
    ) -> "LMDiskANNIndex":
        """Materialize the LM-DiskANN BLOCK layout: one self-contained row
        per node — its vector, neighbor ids, and copies of the neighbor
        vectors.  The block format (and its PQ-compressed payloads) comes
        from the LM-DiskANN PAPER, section 4 (Pan/Sun/Yu, IEEE BigData 2023) — NOT from the
        reference Julia source, which stores vectors and adjacency as two
        separate mmapped arrays (src/LMDiskANN.jl:82-100 is metadata/mmap
        setup); the behavior the reference DOES share is the exact final
        re-rank (:465-471).  With blocks, each beam-search hop is ONE
        partition-pruned fetch instead of two (adjacency then vectors),
        halving the per-hop job ladder — the single-block-read-per-
        expansion contract that makes the graph path viable on disk.

        Storage trade (same as the paper's): raw blocks cost ~(1 + degree) x
        the flat vector table.  ``compress='pq'`` stores the paper's actual
        format instead — each neighbor copy as ``pq_m`` PQ codes
        (~(1 + degree*pq_m/(4*dim)) x storage; the node's OWN vector stays
        full precision in its block exactly as in the paper) — and search
        scores candidates by ADC lookups, then exact-re-ranks the retained
        set in one extra pruned fetch, so returned distances are exact in
        both modes.  PQ needs an additively-decomposable metric (euclidean/
        sqeuclidean/manhattan/dot).  COSINE indexes compress too: payloads
        are L2-normalized at build time (layout flag ``normalized``), and
        for unit vectors cosine_dist = ||a - b||^2 / 2, so the sqeuclidean
        ADC machinery serves cosine exactly (queries normalize in
        _adc_table; the exact re-rank recomputes true cosine from the
        full-precision vectors either way).
        ``n_entrypoints`` spread seed ids are computed once and stored in
        the layout's metadata so searches seed with zero extra jobs.
        Mutations invalidate the layout (version-stamped like IVF); beam
        search then falls back to the two-fetch path until rebuilt.
        """
        self._assert_writable()
        from lmdiskann_jl_spark.operators.beam import _adc_table, _pick_entrypoints

        if compress not in (None, "pq"):
            raise ValueError(f"compress must be None or 'pq', got {compress!r}")
        vec = self.vectors
        el = "double" if self.meta.get("eltype") == "float64" else "float"
        codebook_lists = None
        metric = self.meta["metric"]
        # cosine has no additive ADC decomposition on raw vectors, but on
        # L2-normalized ones cosine_dist = sqeuclidean/2 — normalize the PQ
        # training/encoding input and stamp the layout so search knows
        normalized = (
            compress == "pq" and isinstance(metric, str) and metric.lower() == "cosine"
        )
        if compress == "pq":
            import numpy as np

            from lmdiskann_jl_spark.operators.pq import build_pq

            dim = int(self.meta["dim"])
            pq_input = vec
            if normalized:
                from lmdiskann_jl_spark.functions.vector import l2_normalize_col

                pq_input = l2_normalize_col(vec.select("id", "vec"), "vec")
            cb_df = build_pq(pq_input, dim=dim, m=pq_m, k=pq_k)
            # validate the metric decomposes additively BEFORE writing
            books: list[list[list[float]]] = [[] for _ in range(pq_m)]
            for r in sorted(cb_df.collect(), key=lambda r: (r["sub"], r["code"])):
                books[r["sub"]].append([float(x) for x in r["centroid"]])
            codebook_lists = books
            _adc_table(metric, np.asarray(books), np.zeros(dim), normalized)
        blocks = self._block_rows(
            self.adjacency, vec, compress, codebook_lists, pq_m,
            universe=vec.select("id"), normalized=normalized,
        )
        # blocks are a CATALOG table (versioned, bucketed by _b, merge-on-
        # read): full builds write one snapshot; maintained inserts append
        # the touched rows as stamped segments resolved latest-wins per id
        # (the same machinery adjacency uses) — the Spark form of the
        # reference's in-place block updates on ann_insert!.
        meta = self._write_bucketed(
            "beam_blocks", blocks, self.meta, empty=int(self.meta["num_points"]) == 0
        )
        meta["beam_blocks"] = {
            "built_from": [meta["versions"]["vectors"], meta["versions"]["adjacency"]],
            "entrypoints": _pick_entrypoints(vec, "id", max(1, n_entrypoints)),
            # the CONFIGURED count, distinct from len(entrypoints): a small
            # corpus can realize fewer seeds than asked, and the drift
            # refit must re-request the configuration, not ratchet down to
            # whatever the last build realized
            "n_entrypoints": int(n_entrypoints),
            "compress": compress,
            # m*k*width doubles (default 8*32*8 = 2 KB) — meta-sized by
            # construction, so searches rebuild ADC tables with zero jobs
            "codebook": codebook_lists,
            # cosine PQ layouts store L2-normalized payloads (see docstring)
            "normalized": normalized,
            # corpus size at codebook-fit time: the PQ drift denominator
            # (see BLOCKS_PQ_REFIT_DRIFT)
            "built_n": int(self.meta["num_points"]),
        }
        self.meta = meta
        self.save(op="build_beam_blocks")
        return self

    def _block_rows(
        self, adj: DataFrame, all_vecs: DataFrame, compress: str | None,
        codebook_lists, pq_m: int, universe: DataFrame | None = None,
        normalized: bool = False,
    ) -> DataFrame:
        """(id, vec, neighbors, nbr_vecs|nbr_codes) block rows for the given
        adjacency rows, with own vectors and neighbor payloads drawn from
        ``all_vecs`` — shared by the full build and the incremental insert
        maintenance path (which passes only the touched adjacency delta).
        ``universe`` (ids) sets which nodes get a row: the full build passes
        every vector id so ISOLATED nodes keep an empty-neighbor block;
        the delta path defaults to the touched adjacency ids.
        ``normalized``: cosine PQ layouts encode L2-normalized payloads
        (codebooks were fit on normalized input; own vectors stay raw —
        exact scoring/re-rank uses the true scale-invariant metric)."""
        el = "double" if self.meta.get("eltype") == "float64" else "float"
        if compress == "pq":
            from lmdiskann_jl_spark.operators.pq import pq_encode

            cb_df = self.spark.createDataFrame(
                [
                    (sub, code, [float(x) for x in cent])
                    for sub, book in enumerate(codebook_lists)
                    for code, cent in enumerate(book)
                ],
                "sub int, code int, centroid array<double>",
            )
            enc_input = all_vecs
            if normalized:
                from lmdiskann_jl_spark.functions.vector import l2_normalize_col

                enc_input = l2_normalize_col(all_vecs.select("id", "vec"), "vec")
            payload = pq_encode(
                enc_input, cb_df, dim=int(self.meta["dim"]), m=pq_m
            ).select(F.col("id").alias("nbr"), F.col("codes").alias("_npay"))
            pay_cast = "array<array<int>>"
            pay_name = "nbr_codes"
        else:
            payload = all_vecs.select(F.col("id").alias("nbr"), F.col("vec").alias("_npay"))
            pay_cast = f"array<array<{el}>>"
            pay_name = "nbr_vecs"
        per_node = (
            adj.select("id", F.posexplode("neighbors").alias("pos", "nbr"))
            .join(payload, "nbr")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "nbr", "_npay"))).alias("s"))
            .select(
                "id",
                F.transform("s", lambda s: s["nbr"]).alias("neighbors"),
                F.transform("s", lambda s: s["_npay"]).alias(pay_name),
            )
        )
        ids = universe if universe is not None else adj.select("id")
        own = ids.select("id").join(all_vecs.select("id", "vec"), "id")
        return own.join(per_node, "id", "left").select(
            "id",
            "vec",
            F.coalesce("neighbors", F.array().cast("array<bigint>")).alias("neighbors"),
            F.coalesce(pay_name, F.array().cast(pay_cast)).alias(pay_name),
        )

    def _maybe_autocompact_tables(self, meta: dict) -> dict:
        """Bound BASE-table read amplification the way
        ``_maybe_autocompact_blocks`` bounds the block layout's: past
        TABLES_AUTOCOMPACT_SEGMENTS live segments, collapse that table
        (one latest-wins merge rewrite, new version) inside the violating
        insert — the same amortized inline latency spike, documented at
        streaming/ingest.stream_insert.  Derived layouts that were FRESH
        against the pre-compact snapshot are restamped afterwards:
        compaction moves bytes, never data (index.compact's invariant), so
        freshness must survive it or maintained ingest would stale its own
        layouts every threshold crossing."""
        over = [
            n for n in ("vectors", "adjacency", "key_map")
            if len(meta.get("segments", {}).get(n) or []) >= TABLES_AUTOCOMPACT_SEGMENTS
        ]
        # the IVF cell table accrues one segment per maintained insert
        # (streaming: per micro-batch) — same bound, cell-partitioned
        # rewrite (catalog.compact only knows the _b layout)
        if (
            meta.get("ivf")
            and len(meta.get("segments", {}).get("ivf_cells") or [])
            >= TABLES_AUTOCOMPACT_SEGMENTS
        ):
            meta = self._collapse_ivf_cells(meta)
            meta["table_autocompactions"] = (
                int(meta.get("table_autocompactions", 0)) + 1
            )
        if not over:
            return meta
        ivf = meta.get("ivf")
        ivf_fresh = bool(ivf) and ivf.get("built_from") == meta["versions"]["vectors"]
        bb = meta.get("beam_blocks")
        bb_fresh = bool(bb) and tuple(bb.get("built_from", ())) == (
            meta["versions"]["vectors"], meta["versions"]["adjacency"],
        )
        for name in over:
            meta = self.catalog.compact(
                name, meta, merge_key="key" if name == "key_map" else "id",
            )
        meta["table_autocompactions"] = int(meta.get("table_autocompactions", 0)) + 1
        if ivf_fresh:
            ivf = dict(ivf)
            ivf["built_from"] = meta["versions"]["vectors"]
            meta["ivf"] = ivf
        if bb_fresh:
            bb = dict(bb)
            bb["built_from"] = [
                meta["versions"]["vectors"], meta["versions"]["adjacency"]
            ]
            meta["beam_blocks"] = bb
        return meta

    def _maybe_autocompact_blocks(self, meta: dict) -> dict:
        """Collapse the block layout's MOR segments once
        BLOCKS_AUTOCOMPACT_SEGMENTS accumulate: one latest-wins read,
        live-filtered against vectors (drops dead nodes' unreachable rows),
        rewritten as a single bucketed snapshot.  Freshness is preserved —
        compaction rewrites bytes, not data — so the maintenance paths can
        call this inline without staling the layout.  The reference's
        analog is free (it overwrites 4 KB blocks in place,
        src/LMDiskANN.jl ann_insert!); Spark's immutable files make the
        rewrite a periodic amortized cost instead, bounding per-fetch read
        amplification at O(threshold) segment dirs.  The cost lands INLINE
        in the one mutation (batch or streaming tick) that crosses the
        threshold — a deliberate latency spike documented at the streaming
        entry point (streaming/ingest.stream_insert); latency-critical
        ingest paths leave maintain_blocks off and run compact() off the
        hot path instead."""
        segs = meta.get("segments", {}).get("beam_blocks") or []
        if len(segs) < BLOCKS_AUTOCOMPACT_SEGMENTS or not meta.get("beam_blocks"):
            return meta
        live = self.catalog.read("beam_blocks", meta, merge_key="id").join(
            self.catalog.read("vectors", meta).select("id"), "id", "left_semi"
        )
        meta = self._write_bucketed("beam_blocks", live, meta, empty=False)
        bb = dict(meta["beam_blocks"])
        bb["built_from"] = [
            meta["versions"]["vectors"], meta["versions"]["adjacency"]
        ]
        bb["n_autocompactions"] = int(bb.get("n_autocompactions", 0)) + 1
        meta["beam_blocks"] = bb
        return meta

    def _blocks_fresh(self) -> bool:
        """True iff a block layout exists AND matches the current vectors
        and adjacency snapshots (any mutation bumps those versions)."""
        bb = self.meta.get("beam_blocks")
        return bool(bb) and tuple(bb.get("built_from", ())) == (
            self.meta["versions"]["vectors"],
            self.meta["versions"]["adjacency"],
        )

    def _blocks_usable(self) -> bool:
        """Fresh block layout AND a metric with a driver-side kernel — the
        single gate every blocks-path dispatch must check."""
        from lmdiskann_jl_spark.operators.beam import _NUMPY_METRICS

        metric = self.meta["metric"]
        return (
            self._blocks_fresh()
            and isinstance(metric, str)
            and metric.lower() in _NUMPY_METRICS
        )

    def _blocks_seeds(self, n_entrypoints: int) -> list[int]:
        """Seed ids for a blocks-path search: the stored single entrypoint
        for n<=1 (reference semantics), else the layout's stored spread set.

        Asking for more seeds than the layout stores is NOT silently
        truncated (round-14 review): a scale rule that widens entrypoints
        per decade would otherwise measure a weaker probe than it claims
        whenever the index was built with a smaller ``n_entrypoints``.
        The search still runs (with every stored seed), but the divergence
        is surfaced loudly so gates and callers can rebuild the layout
        with ``build_beam_blocks(n_entrypoints=...)`` at the wider count."""
        stored = [int(e) for e in self.meta["beam_blocks"]["entrypoints"]]
        if n_entrypoints <= 1:
            ep = int(self.meta["entrypoint"])
            return [ep] if ep >= 0 else stored[:1]
        if n_entrypoints > len(stored):
            import warnings

            warnings.warn(
                f"beam search requested n_entrypoints={n_entrypoints} but the "
                f"block layout stores only {len(stored)} spread seeds — "
                f"searching with {len(stored)}; rebuild via "
                f"build_beam_blocks(n_entrypoints={n_entrypoints}) for the "
                "full probe width",
                RuntimeWarning,
                stacklevel=3,
            )
        return stored[:n_entrypoints]

    def _blocks_fetcher(self):
        """Partition-pruned point fetch over the bucketed blocks snapshot —
        the shared catalog fetcher: bucket pruning first, then latest-wins
        merge of the few fetched rows (maintained inserts append touched
        blocks as stamped segments)."""
        return self._fetcher("beam_blocks")

    def search(
        self,
        query: Sequence[float],
        topk: int = 10,
        ef: int = DEFAULT_EF_SEARCH,
        mode: str = "exact",
        nprobe: int = 4,
        where: str | None = None,
        n_entrypoints: int = 1,
    ) -> DataFrame:
        """search (src/LMDiskANN.jl:455-481): top-k with keys attached.

        Modes (physical strategies — see plans/strategy.py):
        - 'exact': full-scan TakeOrderedAndProject (oracle semantics, recall 1.0)
        - 'beam':  distributed graph beam search from the entrypoint (:383-431)
        - 'ivf':   partition-pruned probe of the nprobe nearest cells
        - 'auto':  cost-based choice among the strategies this index has built
        ef is promoted to >= topk as in ``:463``.  Returns (key, id, dist)
        nearest-first.

        ``where``: optional SQL predicate over key-map keys (filtered ANN).
        exact/auto modes pre-filter: candidates are restricted to matching
        keys BEFORE ranking, so the top-k is exact within the filtered set.
        mode='beam' on a FRESH block layout runs filter-DURING-search (the
        FilteredDiskANN form): traversal routes through every node so the
        graph stays navigable under selective filters, while the result
        list admits matching ids only — it can never under-fill k the way
        post-filtering an approximate candidate set would.  Beam without a
        block layout still raises (over-fetch and filter instead).
        """
        ef = max(topk, ef)
        if where is not None:
            metric = self.meta["metric"]
            beam_filtered = mode == "beam" and self._blocks_usable()
            if mode not in ("exact", "auto") and not beam_filtered:
                raise ValueError(
                    "filtered search supports mode='exact' (pre-filter) or "
                    "mode='beam' on a fresh block layout (filter-during-"
                    "search); for other approximate modes over-fetch and "
                    "filter the result"
                )
            allowed = self.key_map.filter(where).select("id")
            if beam_filtered:
                from lmdiskann_jl_spark.operators.beam import beam_search_batch_blocks

                # allowed admission is EXECUTOR-side: the ids stay a table
                # (beam._AllowedMembership batches one pruned membership
                # lookup per hop), so driver memory is O(ids the sweep
                # scored), never O(|allowed|) — no cardinality cap needed.
                # Highly UNselective filters are still usually better served
                # by the exact pre-filter scan (mode='exact'): that is a
                # cost choice, not a memory constraint.
                seeds = self._blocks_seeds(n_entrypoints)
                qdf = self.spark.createDataFrame(
                    [(0, [float(x) for x in query])], "qid long, qvec array<double>"
                )
                result = (
                    beam_search_batch_blocks(
                        self.spark, self._blocks_fetcher(), qdf,
                        ef=ef, metric=metric, seeds=seeds,
                        codebook=self.meta["beam_blocks"].get("codebook"),
                        allowed=allowed,
                        normalized=self.meta["beam_blocks"].get("normalized", False),
                    )
                    .select("id", "dist")
                    .orderBy(F.col("dist").asc(), F.col("id").asc())
                    .limit(topk)
                )
            else:
                filtered = self.vectors.join(F.broadcast(allowed), "id", "left_semi")
                result = exact_topk(filtered, query, k=topk, metric=self.meta["metric"])
            return (
                result.join(F.broadcast(self.key_map), "id", "left")
                .select("key", "id", "dist")
                .orderBy(F.col("dist").asc(), F.col("id").asc())
            )
        if mode == "auto":
            from lmdiskann_jl_spark.plans.strategy import SearchContext, choose_search_strategy

            mode = choose_search_strategy(
                SearchContext(
                    n_vectors=int(self.meta["num_points"]),
                    has_ivf=self._ivf_fresh(),  # stale layouts never auto-selected
                    has_graph=True,
                    has_blocks=self._blocks_fresh(),
                )
            )
            if mode == "lsh":  # single-query LSH degenerates to exact
                mode = "exact"
        if mode == "beam":
            metric = self.meta["metric"]
            if self._blocks_usable():
                # block layout present: run as a 1-row batch through the
                # one-fetch-per-hop path (same facade contract, fewer jobs)
                from lmdiskann_jl_spark.operators.beam import beam_search_batch_blocks

                seeds = self._blocks_seeds(n_entrypoints)
                qdf = self.spark.createDataFrame(
                    [(0, [float(x) for x in query])], "qid long, qvec array<double>"
                )
                result = (
                    beam_search_batch_blocks(
                        self.spark, self._blocks_fetcher(), qdf,
                        ef=ef, metric=metric, seeds=seeds,
                        codebook=self.meta["beam_blocks"].get("codebook"),
                        normalized=self.meta["beam_blocks"].get("normalized", False),
                    )
                    .select("id", "dist")
                    .orderBy(F.col("dist").asc(), F.col("id").asc())
                    .limit(topk)
                )
            else:
                # n_entrypoints > 1: ignore the stored single entrypoint and
                # auto-pick a spread seed set (beam._pick_entrypoints) — fewer
                # hops, same recall bar (the reference's single-seed semantics
                # remain the default)
                result = beam_search(
                    self.vectors, self.adjacency, query,
                    ef=ef, metric=metric,
                    entrypoint=int(self.meta["entrypoint"]) if n_entrypoints <= 1 else None,
                    n_entrypoints=n_entrypoints,
                    vectors_fetch=self._fetcher("vectors"),
                    adjacency_fetch=self._fetcher("adjacency"),
                ).orderBy(F.col("dist").asc(), F.col("id").asc()).limit(topk)
        elif mode == "ivf":
            from lmdiskann_jl_spark.operators.ivf import ivf_search

            if "ivf" not in self.meta:
                raise ValueError("no IVF layout built — call build_ivf() first")
            if "ivf_cells" not in self.meta.get("versions", {}):
                # legacy layout: _ivf_fresh() is always False for it, but
                # "stale" would mislead — the store exists, it just is not
                # readable through the versioned contract
                self._ivf_assigned()  # raises the curated migrate error
            if not self._ivf_fresh():
                raise ValueError(
                    "IVF layout is stale (vectors mutated since build_ivf) — "
                    "rebuild with build_ivf() or search with mode='exact'/'beam'"
                )
            centroids = self.catalog.read("ivf_centroids", self.meta)
            result = ivf_search(
                self._ivf_assigned(), centroids, query, k=topk, nprobe=nprobe,
                metric=self.meta["metric"],
            ).select("id", "dist")
        else:
            result = exact_topk(self.vectors, query, k=topk, metric=self.meta["metric"])
        return (
            result.join(F.broadcast(self.key_map), "id", "left")
            .select("key", "id", "dist")
            .orderBy(F.col("dist").asc(), F.col("id").asc())
        )

    def search_batch(
        self,
        queries: DataFrame,
        topk: int = 10,
        mode: str = "exact",
        ef: int = DEFAULT_EF_SEARCH,
        n_entrypoints: int = 1,
        max_hops: int = 12,
        where: str | None = None,
        tiebreak: str = "id",
        nprobe: int = 4,
    ) -> DataFrame:
        """Batched search: (qid, qvec) -> per-query top-k with keys.

        mode='exact' broadcasts queries into one scan; mode='beam' runs the
        shared-frontier batched graph traversal (beam_search_batch);
        mode='ivf' probes the cell layout for the whole batch in one job
        (union of probed cells, partition-pruned).

        ``max_hops`` (beam mode) bounds the driver loop: recall saturates
        once hops reach the graph diameter (~log_degree(n) on a healthy
        kNN graph), while the reference-style run-until-no-improvement
        tail only churns deep beam entries — each hop is a fixed-latency
        Spark job, so the bound is the beam path's cost knob.

        ``where``: same filtered-ANN contract as ``search`` — exact mode
        pre-filters (per-query top-k exact within the filtered set); beam
        mode on a fresh block layout runs filter-during-search (one allowed
        set shared by the whole batch); other approximate modes raise.

        ``tiebreak``: 'id' (default) breaks distance ties on the INTERNAL
        id — fast, but internal ids depend on insert order, so a rebuilt or
        differently-churned index can rank equidistant duplicates
        differently.  'key' breaks ties on the user KEY instead (lexical
        string order): the reproducible choice for pipelines that compare
        results across index lifecycles.  Exact mode applies it to the full
        ranking (including the top-k boundary); approximate modes apply it
        within their candidate sets.  Not supported with ``where`` (the
        filtered paths keep the id tiebreak).
        """
        if tiebreak not in ("id", "key"):
            raise ValueError(f"tiebreak must be 'id' or 'key', got {tiebreak!r}")
        if tiebreak == "key" and where is not None:
            raise ValueError("tiebreak='key' is not supported with a filter")
        if where is not None:
            return self._search_batch_filtered(
                queries, topk, mode, max(topk, ef), n_entrypoints, max_hops, where
            )
        if mode == "ivf":
            from lmdiskann_jl_spark.operators.ivf import ivf_search_batch

            if "ivf" not in self.meta:
                raise ValueError("no IVF layout built — call build_ivf() first")
            if "ivf_cells" not in self.meta.get("versions", {}):
                # legacy layout: _ivf_fresh() is always False for it, but
                # "stale" would mislead — the store exists, it just is not
                # readable through the versioned contract
                self._ivf_assigned()  # raises the curated migrate error
            if not self._ivf_fresh():
                raise ValueError(
                    "IVF layout is stale (vectors mutated since build_ivf) — "
                    "rebuild with build_ivf() or search with mode='exact'/'beam'"
                )
            assigned = self._ivf_assigned()
            centroids = self.catalog.read("ivf_centroids", self.meta)
            if tiebreak == "key":
                assigned = assigned.join(F.broadcast(self.key_map), "id")
            res = ivf_search_batch(
                assigned, centroids, queries, k=topk, nprobe=nprobe,
                metric=self.meta["metric"],
                tiebreak_col="key" if tiebreak == "key" else None,
            )
        elif mode == "beam":
            from pyspark.sql import Window

            from lmdiskann_jl_spark.operators.beam import (
                beam_search_batch,
                beam_search_batch_blocks,
            )

            metric = self.meta["metric"]
            if self._blocks_usable():
                # LM-DiskANN block path: one pruned fetch per hop, neighbors
                # scored from the vector copies in the fetched blocks; seeds
                # come pre-computed from the layout metadata (zero jobs)
                seeds = self._blocks_seeds(n_entrypoints)
                cand = beam_search_batch_blocks(
                    self.spark, self._blocks_fetcher(), queries,
                    ef=max(topk, ef), metric=metric,
                    seeds=seeds, max_hops=max_hops,
                    codebook=self.meta["beam_blocks"].get("codebook"),
                    normalized=self.meta["beam_blocks"].get("normalized", False),
                )
            else:
                cand = beam_search_batch(
                    self.vectors, self.adjacency, queries,
                    ef=max(topk, ef), metric=metric,
                    entrypoint=int(self.meta["entrypoint"]) if n_entrypoints <= 1 else None,
                    n_entrypoints=n_entrypoints,
                    max_hops=max_hops,
                    vectors_fetch=self._fetcher("vectors"),
                    adjacency_fetch=self._fetcher("adjacency"),
                )
            if tiebreak == "key":
                cand = cand.join(F.broadcast(self.key_map), "id")
                w = Window.partitionBy("qid").orderBy(
                    F.col("dist").asc(), F.col("key").asc()
                )
                res = (
                    cand.withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= topk)
                    .drop("key")
                )
            else:
                w = Window.partitionBy("qid").orderBy(
                    F.col("dist").asc(), F.col("id").asc()
                )
                res = cand.withColumn("rank", F.row_number().over(w)).filter(
                    F.col("rank") <= topk
                )
        else:
            # vectors carries key by schema contract, so the key tiebreak is
            # a free column selection, not an extra join
            res = batch_topk(
                queries, self.vectors, k=topk, metric=self.meta["metric"],
                tiebreak_col="key" if tiebreak == "key" else None,
            )
        return res.join(F.broadcast(self.key_map), "id", "left").select(
            "qid", "key", "id", "dist", "rank"
        )

    def _search_batch_filtered(
        self, queries, topk, mode, ef, n_entrypoints, max_hops, where
    ) -> DataFrame:
        """search_batch's ``where`` dispatch: exact pre-filter or blocks
        filter-during-search (see ``search`` for the contract)."""
        from pyspark.sql import Window

        from lmdiskann_jl_spark.operators.beam import beam_search_batch_blocks

        metric = self.meta["metric"]
        beam_filtered = mode == "beam" and self._blocks_usable()
        if mode not in ("exact",) and not beam_filtered:
            raise ValueError(
                "filtered search_batch supports mode='exact' (pre-filter) or "
                "mode='beam' on a fresh block layout (filter-during-search)"
            )
        allowed = self.key_map.filter(where).select("id")
        if beam_filtered:
            # executor-side membership (see search): no cardinality cap,
            # driver state bounded by the sweep's scored-id footprint
            seeds = self._blocks_seeds(n_entrypoints)
            cand = beam_search_batch_blocks(
                self.spark, self._blocks_fetcher(), queries,
                ef=ef, metric=metric, seeds=seeds, max_hops=max_hops,
                codebook=self.meta["beam_blocks"].get("codebook"),
                allowed=allowed,
                normalized=self.meta["beam_blocks"].get("normalized", False),
            )
            w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
            res = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= topk)
        else:
            filtered = self.vectors.join(F.broadcast(allowed), "id", "left_semi")
            res = batch_topk(queries, filtered, k=topk, metric=metric)
        return res.join(F.broadcast(self.key_map), "id", "left").select(
            "qid", "key", "id", "dist", "rank"
        )

    def get_embedding_from_id(self, id_: int) -> list[float]:
        """get_embedding_from_id (src/LMDiskANN.jl:658-667) — bucket-pruned
        point lookup; raises on missing id like the reference's bounds check."""
        rows = self._fetcher("vectors")([int(id_)]).select("vec").limit(1).collect()
        if not rows:
            raise KeyError(f"id {id_} not in index")
        return list(rows[0]["vec"])

    def get_embedding_from_key(self, key: str) -> list[float]:
        """get_embedding_from_key (src/LMDiskANN.jl:678-687)."""
        id_ = kvmap.get_id_from_key(self.key_map, key)
        if id_ is None:
            raise KeyError(f"key {key!r} not in index")
        return self.get_embedding_from_id(id_)

    # ---------------- KV surface (ops 19-29) ----------------

    def get_id_from_key(self, key: str) -> int | None:
        return kvmap.get_id_from_key(self.key_map, key)

    def get_key_from_id(self, id_: int) -> str | None:
        return kvmap.get_key_from_id(self.key_map, id_)

    def count_entries(self) -> int:
        return kvmap.count_entries(self.key_map)

    def list_all_keys(self) -> list[str]:
        return kvmap.list_all_keys(self.key_map)

    def vacuum(
        self, keep: int = 1, min_age_seconds: float = DEFAULT_VACUUM_RETENTION
    ) -> None:
        """Drop table snapshots no retained commit needs (IVF cell and
        tombstone tables included — they are ordinary catalog tables) and
        commit records whose snapshots are gone.

        COMMIT-AWARE semantics (round 11, session 2): protect every dir
        referenced by the CURRENT state or by the newest ``keep`` readable
        prior commits; everything else dies — including rolled-back
        future-lineage dirs a restore abandoned.  A version-NUMBER window
        (the catalog's vacuum) is wrong here once restore exists:
        collision-proof allocation makes a just-restored commit's dirs
        NUMERICALLY old (they'd die inside the keep window) while the
        rolled-back lineage's dirs are numerically new (they'd survive
        unreferenced forever).  Time-travel reach is therefore "the last
        ``keep`` commits" plus everything inside the retention horizon.

        ``min_age_seconds`` is that horizon (Delta's retention-duration
        analog, round 12): commits whose record is YOUNGER than this are
        never dropped, regardless of ``keep`` — the guard that protects a
        LIVE as-of reader.  ``load(commit=)`` validates snapshots only at
        open; a vacuum racing a long historical query would otherwise
        delete parquet files mid-job (raw FileNotFound from the reader,
        not the curated error).  Production contract: set it to comfortably
        exceed the longest-running historical query (Delta defaults to 7
        days for the same reason).  The DEFAULT is a conservative one-hour
        horizon (round 13) — the safe behavior is the one you get without
        reading this docstring; pass ``min_age_seconds=0`` explicitly for
        maintenance-style immediate reclamation when you KNOW no as-of
        reader is live (tests, single-writer batch jobs between runs)."""
        self._assert_writable()
        import shutil

        protected = {
            os.path.normpath(d) for d in _snapshot_dirs(self.path, self.meta)
        }
        cur = int(self.meta.get("commit", 0))
        cdir = os.path.join(self.path, COMMITS_DIR)
        recs: list[tuple[str, dict]] = []
        if os.path.isdir(cdir):
            for fname in sorted(os.listdir(cdir), reverse=True):  # newest first
                if fname.startswith("c") and fname.endswith(".json"):
                    with open(os.path.join(cdir, fname)) as f:
                        recs.append((fname, json.load(f)))
        horizon = time.time() - float(min_age_seconds)
        kept = 0
        for _fname, rec in recs:
            if int(rec["commit"]) == cur:
                continue
            # records are newest-first, so age protection is a prefix:
            # once a record falls outside the horizon AND the keep window
            # is full, everything older is out too
            age_protected = (
                min_age_seconds > 0 and float(rec.get("ts") or 0.0) >= horizon
            )
            if kept >= keep and not age_protected:
                break
            # readability is judged on the VERSIONED snapshot dirs only
            # (same rule as _missing_snapshot_dirs — a legacy IVF dir the
            # pre-round-12 vacuum already reclaimed must not disqualify an
            # otherwise-readable commit); protection then covers everything
            # the commit references that still exists, legacy dirs and
            # their tombstone sidecars included.
            required = [
                os.path.normpath(d)
                for d in _snapshot_dirs(
                    self.path, rec["meta"], include_legacy_ivf=False
                )
            ]
            if all(os.path.isdir(d) for d in required):
                protected.update(
                    os.path.normpath(d)
                    for d in _snapshot_dirs(self.path, rec["meta"])
                )
                if not age_protected:
                    kept += 1
        # sweep every on-disk table root (current tables AND tables an old
        # lineage had but the current meta no longer lists) — the IVF cell
        # and tombstone tables are ordinary catalog tables since round 12,
        # so the one generic sweep covers them too
        for name in os.listdir(self.path):
            table_root = os.path.join(self.path, name)
            if name == COMMITS_DIR or not os.path.isdir(table_root):
                continue
            for entry in os.listdir(table_root):
                if entry.startswith("v="):
                    full = os.path.normpath(os.path.join(table_root, entry))
                    if full not in protected:
                        shutil.rmtree(full, ignore_errors=True)
        for fname, rec in recs:
            if int(rec["commit"]) == cur:
                continue
            if _missing_snapshot_dirs(self.path, rec["meta"]):
                os.remove(os.path.join(cdir, fname))


def create_index(spark: SparkSession, path: str, dim: int, **kw) -> LMDiskANNIndex:
    return LMDiskANNIndex.create(spark, path, dim, **kw)


def load_index(
    spark: SparkSession,
    path: str,
    metric: str | None = None,
    commit: int | None = None,
) -> LMDiskANNIndex:
    return LMDiskANNIndex.load(spark, path, metric=metric, commit=commit)
