"""Sketch-accuracy gates at bench scale: the sf0.01 oracle asserts the
tolerance verdicts once; this holds them at sf0.1, where the sketches see
enough distinct keys for their error model to actually bite."""

import os

import pytest

from lmdiskann_jl_spark.plans.queries import q_sketch_accuracy

BENCH_SF_DIR = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not os.path.isdir(BENCH_SF_DIR), reason="bench-scale fixtures absent"
)
def test_sketch_tolerances_hold_at_bench_scale(spark):
    row = q_sketch_accuracy(spark, BENCH_SF_DIR).collect()[0]
    assert row["users_within_tol"], f"HLL++ drifted: exact={row['n_users']}"
    assert row["p50_within_tol"], f"approx median drifted from {row['p50_value']}"
    assert row["n_users"] > 0
