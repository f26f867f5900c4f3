"""Text-analysis expression semantics."""

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions import text as X


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text string").select(expr.alias("v")).collect()[0]["v"]


def test_tokens(spark):
    assert _one(spark, "Hello, World! 123", X.tokens(F.col("text"))) == ["hello", "world", "123"]
    assert _one(spark, "", X.tokens(F.col("text"))) == []


def test_word_shingles(spark):
    got = _one(spark, "a b c d", X.word_shingles(X.tokens(F.col("text")), 3))
    assert got == ["a b c", "b c d"]
    # shorter than shingle width -> empty, not a descending-sequence artifact
    assert _one(spark, "a b", X.word_shingles(X.tokens(F.col("text")), 3)) == []


def test_hash60_range_and_determinism(spark):
    h1 = _one(spark, "hello world", X.hash60(F.col("text")))
    h2 = _one(spark, "hello world", X.hash60(F.col("text")))
    assert h1 == h2 == 426544247714475757  # cross-checked against DuckDB
    assert 0 <= h1 < 2**60


def test_langid_picks_stopword_language(spark):
    assert _one(spark, "the cat and the dog is in a house", X.langid_expr(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", X.langid_expr(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty", X.langid_expr(F.col("text"))) == "und"


def test_quality_features(spark):
    feats = X.quality_features(F.col("text"))
    df = spark.createDataFrame([("the cat sat",)], "text string")
    row = df.select(*[c.alias(n) for n, c in feats.items()]).collect()[0]
    assert row["n_chars"] == 11
    assert row["n_tokens"] == 3
    assert row["mean_token_len"] == pytest.approx(3.0, abs=1e-9)
    assert row["stopword_ratio"] == pytest.approx(1 / 3, abs=1e-4)
    assert 0.0 <= row["quality_score"] <= 1.0


def test_token_counts(spark):
    counts = X.token_counts(F.col("text"))
    df = spark.createDataFrame([("hello world 42!",)], "text string")
    row = df.select(*[c.alias(n) for n, c in counts.items()]).collect()[0]
    assert row["n_ws_tokens"] == 3
    # hello(2) + world(2) + '4','2','!' (3) = 7
    assert row["n_bpe_tokens"] == 7


def test_fingerprint_equal_for_equal_texts(spark):
    df = spark.createDataFrame([(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")], "id long, text string")
    fps = {r["id"]: r["fp"] for r in df.select("id", X.fingerprint_expr(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
