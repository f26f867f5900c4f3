"""Source/sink registry: format-agnostic table IO with scale hygiene.

The reference reads exactly three bespoke files + LevelDB (SURVEY §2.6 —
no CSV/JSON/Parquet readers).  Engine-side, sources are Spark's format
registry; this module centralizes the options that matter at 100 TB so every
entry point applies them uniformly:

- explicit schemas for text formats (no sampling-based inference jobs);
- partition/bucket layout helpers for co-located joins on id keys;
- write-side file sizing (maxRecordsPerFile) to keep parquet row-groups in
  the scanner's sweet spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = {"parquet", "csv", "json", "orc"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table of any registered format.

    Text formats REQUIRE a schema: at 100 TB an inference pass is a full
    extra scan, and inferred types drift between files.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {sorted(FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} sources need an explicit schema (no inference scans)")
        reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", options.pop("header", "true"))
    elif schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, str] | None = None,
    table_name: str | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write with layout hygiene.

    ``partition_by``: directory partitioning (enables partition pruning —
    the IVF cell layout uses this).  ``bucket_by=(n, col)``: hash bucketing
    for shuffle-free co-located joins on ``col`` (requires ``table_name``,
    saveAsTable semantics).
    """
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, col = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires saveAsTable(table_name)")
        writer.bucketBy(n, col).sortBy(col).saveAsTable(table_name, path=path)
        return
    writer.save(path)
