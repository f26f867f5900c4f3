"""Smoke-gate the examples/ demos (round 12, VERDICT item 7): the six
demos are the first thing a human runs and the lifecycle demo is a de-facto
integration test (churn + time travel + dedup) — one slow-lane test per
demo executes its main() end-to-end against sf0.001 so a drifted API or a
stale import fails CI, not the reader."""

import importlib
import os
import sys

import pytest

EXAMPLES = [
    "quickstart",
    "lifecycle_demo",
    "maintenance_demo",
    "pipeline_demo",
    "retrieval_demo",
    "temporal_demo",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_main_runs(spark, name, monkeypatch):
    # demos size themselves from SPARK_GRAFT_SF_DIR (default sf0.01 for
    # some) — pin the smoke scale; get_spark() inside main() resolves to
    # the session fixture via getOrCreate, so no second JVM spins up
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # several demos end with spark.stop() — correct standalone, fatal to
    # the suite's shared session (every later test would hit "stopped
    # SparkContext"); suppress stop for the smoke run
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(os.path.join(root, "examples"))
    mod = importlib.import_module(name)
    try:
        mod.main()
    finally:
        sys.modules.pop(name, None)
