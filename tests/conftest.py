import os

import pytest

from lmdiskann_jl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lmdiskann-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---- shared streaming-test scaffolding (used by the test_streaming_* files)


def finish_stream(q):
    q.processAllAvailable()
    q.stop()
    assert q.awaitTermination(120), "streaming query did not stop"


def write_events(spark, rows, path):
    """Append (user, hour, minute, event_id) rows as one parquet file."""
    from pyspark.sql import functions as F

    spark.createDataFrame(
        [(u, f"2024-01-01 {h:02d}:{m:02d}:00", e) for u, h, m, e in rows],
        "user_id long, ts string, event_id long",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id").coalesce(
        1
    ).write.mode("append").parquet(path)


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
