"""Index storage: versioned Parquet snapshots + a JSON metadata file.

Reference parity: the reference persists state as three mmapped/serialized
files — ``.vec`` / ``.adj`` / ``.meta`` — plus two LevelDB directories
(``/root/reference/src/LMDiskANN.jl:82-100,111-153,243-245``).  Its mutation
model is in-place slot writes with a freelist (``src/LMDiskANN.jl:534-544,640``).

Spark-first: Spark storage is immutable files, so mutations are copy-on-write
snapshots — exactly what Delta/Iceberg MERGE/DELETE do via their transaction
logs.  This container has plain Parquet only, so we implement the minimal
version of the same idea: every table write lands in ``<table>/v=<n>/`` and
``_index_meta.json`` records the current version per table (the "transaction
log").  Readers always read one consistent snapshot; a crashed writer leaves
the old version intact.  On a real cluster you would swap this class for Delta
and keep the rest of the engine untouched; the freelist / capacity-doubling /
``-1``-sentinel machinery of the reference (SURVEY.md section 4) is not needed
at all.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

META_FILE = "_index_meta.json"


def read_meta(path: str) -> dict[str, Any]:
    with open(os.path.join(path, META_FILE)) as f:
        return json.load(f)


def write_meta(path: str, meta: dict[str, Any]) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, META_FILE))  # atomic pointer swap


def merge_rows(df: DataFrame, key: str) -> DataFrame:
    """Merge-on-read resolution: keep the latest ``_seg`` row per key (rows
    from the base snapshot carry null ``_seg`` and lose to any append)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if "_seg" not in df.columns:
        return df
    w = Window.partitionBy(key).orderBy(F.col("_seg").desc_nulls_last())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seg")
    )


class TableCatalog:
    """Versioned parquet tables under one index root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _table_dir(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v={version}")

    def _next_version(self, name: str, meta: dict[str, Any]) -> int:
        """Collision-proof version allocation: one past the MAX of the
        meta's counter and every ``v=`` dir already on disk.  The meta
        counter alone is not enough once history exists — ``restore``
        re-commits an OLD meta whose counters point at early versions, and
        a naive ``versions[name]+1`` would then overwrite newer commits'
        snapshot dirs (mode('overwrite') writes), silently corrupting every
        time-travel read through them.  One driver-side listdir per write."""
        cur = int(meta["versions"].get(name, -1))
        table_root = os.path.join(self.root, name)
        if os.path.isdir(table_root):
            for entry in os.listdir(table_root):
                if entry.startswith("v="):
                    try:
                        cur = max(cur, int(entry.split("=", 1)[1]))
                    except ValueError:
                        continue
        return cur + 1

    def _segments(self, name: str, meta: dict[str, Any]) -> list[int]:
        """Version numbers whose dirs make up the current snapshot.  A table
        written only via ``write`` has one; ``append`` adds more (the
        Delta/Iceberg manifest idea: the snapshot is a LIST of files, so
        appends are O(batch) writes, not an O(table) rewrite)."""
        segs = meta.get("segments", {}).get(name)
        return list(segs) if segs else [meta["versions"][name]]

    def read(
        self,
        name: str,
        meta: dict[str, Any],
        raw: bool = False,
        merge_key: str | None = None,
    ) -> DataFrame:
        """Current snapshot of ``name`` — the union of its segment dirs.

        Insert-only tables (``vectors``): union IS the merge, rows are never
        updated in place.  Update-shaped tables (``adjacency``) pass
        ``merge_key``: appended segments carry a ``_seg`` stamp and the read
        keeps the LATEST row per key (merge-on-read, the Delta/Hudi MOR
        idea) — deletes and compaction collapse back to one segment via
        ``write``.  Physical layout columns (``_b`` bucket, ``_seg`` stamp)
        are dropped unless ``raw`` needs ``_b`` for partition pruning."""
        from pyspark.sql import functions as F

        dfs = [
            self.spark.read.parquet(self._table_dir(name, v))
            for v in self._segments(name, meta)
        ]
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        if "_seg" in df.columns:
            if raw and merge_key is None:
                # point-lookup path: caller filters (partition-pruned) FIRST,
                # then merges the few fetched rows itself (merge_rows) — a
                # pre-filter window would sit between scan and filter and
                # break pruning
                return df
            df = merge_rows(df, merge_key or "id")
        if not raw and "_b" in df.columns:
            df = df.drop("_b")
        return df

    def write(
        self,
        name: str,
        df: DataFrame,
        meta: dict[str, Any],
        partition_by: list[str] | None = None,
    ) -> dict[str, Any]:
        """Write ``df`` as the next snapshot of ``name``; returns updated meta
        (caller persists it with ``write_meta`` — the commit point).

        ``partition_by`` lays the snapshot out hive-partitioned (the Spark
        stand-in for bucketing/Z-order): readers filtering on the partition
        column scan only matching directories.  Callers must not partition
        an empty frame (a partitioned write of 0 rows leaves no schema to
        read back).
        """
        next_version = self._next_version(name, meta)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._table_dir(name, next_version))
        new_meta = dict(meta)
        new_meta["versions"] = dict(meta.get("versions", {}))
        new_meta["versions"][name] = next_version
        if "segments" in new_meta:
            # a full write supersedes every prior segment
            new_meta["segments"] = dict(new_meta["segments"])
            new_meta["segments"].pop(name, None)
        return new_meta

    def append(
        self,
        name: str,
        df: DataFrame,
        meta: dict[str, Any],
        partition_by: list[str] | None = None,
        stamp_segment: bool = False,
    ) -> dict[str, Any]:
        """Append ``df`` as a NEW SEGMENT of ``name`` — the O(batch) insert
        path: existing data is neither read nor rewritten (at 100 TB a full
        copy-on-write per batch would make ingest O(table); this is the
        manifest-append that Delta/Iceberg commits do).  Readers union the
        segment list; ``compact`` collapses it.  Only valid for insert-only
        rows (ids never updated in place — the engine's uniqueness-forever
        id invariant guarantees that for ``vectors``), or for update-shaped
        rows with ``stamp_segment=True``: the segment version is stamped on
        every row so readers resolve latest-wins per key (merge-on-read)."""
        next_version = self._next_version(name, meta)
        if stamp_segment:
            from pyspark.sql import functions as F

            df = df.withColumn("_seg", F.lit(next_version))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._table_dir(name, next_version))
        new_meta = dict(meta)
        old_segs = self._segments(name, meta)
        new_meta["versions"] = dict(meta.get("versions", {}))
        new_meta["versions"][name] = next_version
        new_meta["segments"] = dict(meta.get("segments", {}))
        new_meta["segments"][name] = [*old_segs, next_version]
        return new_meta

    def compact(
        self,
        name: str,
        meta: dict[str, Any],
        target_bytes: int = 128 * 2**20,
        merge_key: str = "id",
    ) -> dict[str, Any]:
        """OPTIMIZE-style small-file compaction: rewrite the current snapshot
        with file count sized to the data (ceil(bytes / target_bytes)), as a
        NEW version — readers of the old snapshot are unaffected, vacuum
        reclaims it later.

        Incremental workloads accrue small files (every insert/delete
        snapshot writes shuffle-partition-many files); small files tax the
        scan path (footer reads, scheduling) — at 100 TB this is the routine
        maintenance job, run off the write path.  Bucketed layouts keep
        their partition column (files coalesce WITHIN buckets).
        """
        import math

        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for v in self._segments(name, meta)
            for dp, _, fs in os.walk(self._table_dir(name, v))
            for f in fs
            if f.endswith(".parquet")
        )
        # merged view (latest-wins for MOR tables), physical _b retained —
        # compaction also collapses the segment list back to one
        df = self.read(name, meta, raw=True)
        df = merge_rows(df, merge_key)
        part_cols = [c for c in df.columns if c == "_b"]
        n_files = max(1, math.ceil(size / target_bytes))
        if part_cols:
            from pyspark.sql import functions as F

            out = df.repartition(*[F.col(c) for c in part_cols])
        else:
            out = df.repartition(n_files)
        return self.write(name, out, meta, partition_by=part_cols or None)

    def vacuum(self, meta: dict[str, Any], keep: int = 1) -> None:
        """Drop snapshots older than the current-minus-``keep`` version
        (Delta VACUUM analog)."""
        for name, cur in meta["versions"].items():
            live = set(self._segments(name, meta))  # segment dirs stay live
            table_root = os.path.join(self.root, name)
            if not os.path.isdir(table_root):
                continue
            for entry in os.listdir(table_root):
                if entry.startswith("v="):
                    v = int(entry.split("=", 1)[1])
                    if v < cur - keep + 1 and v not in live:
                        shutil.rmtree(os.path.join(table_root, entry), ignore_errors=True)
