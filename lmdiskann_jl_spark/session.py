"""SparkSession factory tuned for this engine.

Local test/bench configuration targets ``local[N]`` (single JVM); the same
settings (AQE, shuffle partitions sized to parallelism, Arrow for the few
Pandas-UDF paths) are what we would set cluster-side at 100 TB, where
``spark.sql.shuffle.partitions`` scales with executor cores and AQE coalesces
post-shuffle partitions at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lmdiskann_jl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (older event fixtures) has no Spark
        # timestamp type — read it as a raw nanos BIGINT instead of failing
        # at scan time; plans/queries._events_sec normalizes either physical
        # type to epoch seconds
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = single JVM: the driver is the only memory pool.
        # Measured: an oversized heap (48g) is ~2x SLOWER than 8g on the
        # allocation-heavy distance expressions (G1 pause behavior), so the
        # default stays modest; override via SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
