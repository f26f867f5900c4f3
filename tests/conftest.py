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


# ---- shared streaming-test scaffolding, exposed as fixtures (works under
# any pytest import mode, unlike `from conftest import ...`)

STREAM_EVENT_SCHEMA = "user_id long, ts timestamp, event_id long"


@pytest.fixture(scope="session")
def stream_schema():
    """Reader-side schema matching write_events' row shape."""
    return STREAM_EVENT_SCHEMA


@pytest.fixture(scope="session")
def finish_stream():
    """Drain an availableNow query deterministically.  processAllAvailable
    blocks until every available input row is PROCESSED — the property the
    assertions actually need; the trigger's self-termination can lag far
    behind processing (state-store maintenance) on a loaded machine, so
    don't gate on it — stop() and then assert the stop completed."""

    def _finish(q, timeout=120):
        q.processAllAvailable()
        q.stop()
        assert q.awaitTermination(timeout), "streaming query did not stop"

    return _finish


@pytest.fixture(scope="session")
def write_events(spark):
    """Append (user, hour, minute, event_id) rows as one parquet file."""
    from pyspark.sql import functions as F

    def _write(rows, path):
        spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", e) for u, h, m, e in rows],
            "user_id long, ts string, event_id long",
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
        ).coalesce(1).write.mode("append").parquet(path)

    return _write


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
