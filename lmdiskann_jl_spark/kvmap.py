"""Key <-> ID mapping layer as DataFrame operators over one dimension table.

Reference parity: ``/root/reference/src/UserIdMapping.jl`` keeps TWO LevelDB
databases (forward user_key -> id, reverse id -> user_key) manually synced on
every insert/delete (``:45-51,113-147``).  In Spark one ``key_map(key STRING,
id BIGINT)`` table serves both directions via predicates — uniqueness on both
columns replaces the two-DB sync protocol (SURVEY.md section 1.4), and a
broadcast join resolves keys for search results.

Every function below maps 1:1 to a reference op (SURVEY.md section 2.4, ops
19-29).  They are pure DataFrame -> DataFrame transforms; persistence is the
caller's concern (the index snapshots the table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_MAP_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
    ]
)


def insert_keys(key_map: DataFrame, new_pairs: DataFrame) -> DataFrame:
    """insert_key! (UserIdMapping.jl:45-51) batched: upsert (key, id) pairs.

    Last-writer-wins on key collision, mirroring LevelDB put overwriting —
    including WITHIN the new batch: duplicate keys in ``new_pairs`` collapse
    to the max id (the batch analog of "last put wins"), preserving the
    one-row-per-key invariant both lookup directions rely on.
    """
    deduped = new_pairs.select("key", "id").groupBy("key").agg(F.max("id").alias("id"))
    return key_map.join(deduped.select("key"), "key", "left_anti").unionByName(deduped)


def get_id_from_key(key_map: DataFrame, key: str) -> int | None:
    """get_id_from_key (UserIdMapping.jl:63-78); None when absent."""
    rows = key_map.filter(F.col("key") == key).select("id").limit(1).collect()
    return int(rows[0]["id"]) if rows else None


def get_key_from_id(key_map: DataFrame, id_: int) -> str | None:
    """get_key_from_id (UserIdMapping.jl:86-101); None when absent."""
    rows = key_map.filter(F.col("id") == id_).select("key").limit(1).collect()
    return str(rows[0]["key"]) if rows else None


_SMALL = 256  # literal-filter path below this; anti-join above (plan size)


def delete_by_keys(key_map: DataFrame, keys: Sequence[str] | DataFrame) -> DataFrame:
    """delete_by_key! (UserIdMapping.jl:113-127) batched.  Large or
    DataFrame-borne key sets anti-join (no literal-list plan blowup)."""
    if not isinstance(keys, DataFrame):
        ks = [str(k) for k in keys]
        if len(ks) <= _SMALL:
            return key_map.filter(~F.col("key").isin(ks))
        keys = key_map.sparkSession.createDataFrame([(k,) for k in ks], "key string")
    return key_map.join(F.broadcast(keys.select("key")), "key", "left_anti")


def delete_by_ids(key_map: DataFrame, ids: Sequence[int] | DataFrame) -> DataFrame:
    """delete_by_id! (UserIdMapping.jl:135-147) batched.  Same strategy
    split as ``delete_by_keys``."""
    if not isinstance(ids, DataFrame):
        vals = [int(i) for i in ids]
        if len(vals) <= _SMALL:
            return key_map.filter(~F.col("id").isin(vals))
        ids = key_map.sparkSession.createDataFrame([(i,) for i in vals], "id long")
    return key_map.join(F.broadcast(ids.select("id")), "id", "left_anti")


def clear(key_map: DataFrame) -> DataFrame:
    """clear_database! / clear_all_databases! (UserIdMapping.jl:149-167):
    one table, so one empty overwrite."""
    return key_map.sparkSession.createDataFrame([], KEY_MAP_SCHEMA)


def count_entries(key_map: DataFrame) -> int:
    """count_entries (UserIdMapping.jl:169-175) — O(n) LevelDB iteration
    becomes a distributed count."""
    return key_map.count()


def list_all_keys(key_map: DataFrame) -> list[str]:
    """list_all_keys (UserIdMapping.jl:188-194)."""
    return [r["key"] for r in key_map.select("key").orderBy("key").collect()]
