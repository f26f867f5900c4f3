"""Training-pipeline composition operators (operators/pipeline.py)."""

import pytest
from pyspark.sql import functions as F

import lmdiskann_jl_spark.operators.pipeline as P


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_stratified_sample_deterministic_and_rate_bounded(docs):
    a = P.stratified_sample(docs).collect()
    b = P.stratified_sample(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # pure function of id
    n_docs = docs.count()
    # overall keep rate can't exceed the max configured rate
    max_rate = max([*P.SAMPLE_RATES.values(), P.SAMPLE_DEFAULT_RATE])
    assert 0 < len(a) <= n_docs * (max_rate + 5) / 100
    assert all(r["sample_bucket"] < 100 for r in a)


def test_pack_sequences_budget_and_coverage(docs):
    packed = P.pack_sequences(docs)
    n_docs = docs.count()
    assert packed.count() == n_docs  # every doc assigned exactly once
    sums = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    # next-fit relaxation: a bin never exceeds budget by more than one doc
    bad = sums.filter(F.col("tot") - F.col("mx") >= P.PACK_BUDGET).count()
    assert bad == 0
    # the window is shard-partitioned — NOT a global single-partition window
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_quality_filter_first_failing_rule(docs):
    res = P.quality_filter(docs).collect()
    assert len(res) == docs.count()
    for r in res:
        if r["pred_lang"] != "en":
            assert r["reason"] == "lang" and not r["keep"]
        elif r["n_tokens"] < 5:
            assert r["reason"] == "too_short"
        elif r["quality_score"] >= 0.5 and r["n_tokens"] <= 5000:
            assert r["reason"] == "ok" and r["keep"]
    assert any(r["keep"] for r in res) and any(not r["keep"] for r in res)
