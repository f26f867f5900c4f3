"""Property-based invariants (hypothesis) for the metric and dedup layers.

One Spark job per property class (batched examples into a single DataFrame)
to keep runtime sane.
"""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import (
    cosine_distance,
    euclidean_distance,
    manhattan_distance,
)

finite = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)
vec = st.lists(finite, min_size=4, max_size=4)


@pytest.fixture(scope="module")
def eval_dist(spark):
    def _run(pairs, fn):
        df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
        return [r["d"] for r in df.select(fn(F.col("a"), F.col("b")).alias("d")).collect()]

    return _run


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=8))
def test_metric_axioms(eval_dist, pairs):
    """d(x,y) >= 0, d(x,x) == 0, symmetry — for every built-in metric."""
    batch = [(list(a), list(b)) for a, b in pairs]
    for fn in (euclidean_distance, manhattan_distance):
        fwd = eval_dist(batch, fn)
        rev = eval_dist([(b, a) for a, b in batch], fn)
        self_d = eval_dist([(a, a) for a, _ in batch], fn)
        assert all(d >= 0 for d in fwd)
        assert all(math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12) for x, y in zip(fwd, rev))
        assert all(abs(d) < 1e-9 for d in self_d)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=6))
def test_euclidean_triangle_via_origin(eval_dist, pairs):
    """d(a,b) <= d(a,0) + d(0,b) (triangle inequality through the origin)."""
    zero = [0.0, 0.0, 0.0, 0.0]
    batch = [(list(a), list(b)) for a, b in pairs]
    ab = eval_dist(batch, euclidean_distance)
    a0 = eval_dist([(a, zero) for a, _ in batch], euclidean_distance)
    b0 = eval_dist([(zero, b) for _, b in batch], euclidean_distance)
    for d, x, y in zip(ab, a0, b0):
        assert d <= x + y + 1e-9


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=10, max_size=60), min_size=2, max_size=5
    )
)
def test_jaccard_bounds_and_self_similarity(spark, texts):
    from lmdiskann_jl_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(100, texts[0])],  # planted dup of doc 0
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    for v in out.values():
        assert 0.0 <= v <= 1.0
    # identical text (if it has >= 3 tokens) must pair at jaccard 1.0
    n_tokens = len([w for w in texts[0].split() if w])
    if n_tokens >= 3:
        assert out.get((0, 100)) == pytest.approx(1.0)


def test_oracle_output_types_have_no_hugeint_or_decimal(sf_dir):
    """Every declared oracle's output schema must avoid HUGEINT/DECIMAL.

    DuckDB's sum(BIGINT) returns HUGEINT (int128); fetched via pandas it
    degrades to float64 and via Arrow to decimal128 — both serialize
    differently from Spark's int64 in the driver's value hash even when the
    values are identical (root cause of the r_above_avg_* reds in rounds
    4-6).  DESCRIBE resolves the declared output type without executing the
    query, so walking all oracles is cheap permanent insurance.
    """
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in entry.oracle_sql().items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # statement shape DESCRIBE can't handle; hash gate still covers it
        for row in rows:
            ct = str(row[1]).upper()
            if "HUGEINT" in ct or ct.startswith("DECIMAL"):
                bad.append(f"{name}.{row[0]}: {ct}")
    assert not bad, f"oracle outputs with hash-unstable types: {bad}"


doc_tokens = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(st.lists(doc_tokens, min_size=2, max_size=6))
def test_remove_duplicate_spans_matches_python_reference(spark, docs_tokens):
    """remove_duplicate_spans == the literal Lee-et-al cut computed in
    plain Python: for every w-window occurring in >= 2 distinct docs, all
    covered token positions are dropped; survivors keep order."""
    from lmdiskann_jl_spark.operators.dedup import remove_duplicate_spans

    w = 3
    # python reference over the same tokenization (tiny alnum alphabet ->
    # whitespace split == functions.text.tokens)
    span_docs = {}
    for d, tk in enumerate(docs_tokens):
        for i in range(len(tk) - w + 1):
            span_docs.setdefault(tuple(tk[i : i + w]), set()).add(d)
    expected = {}
    for d, tk in enumerate(docs_tokens):
        covered = set()
        for i in range(len(tk) - w + 1):
            if len(span_docs[tuple(tk[i : i + w])]) >= 2:
                covered.update(range(i, i + w))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        expected[d] = (" ".join(kept), len(kept), len(tk) - len(kept))

    df = spark.createDataFrame(
        [(d, " ".join(tk)) for d, tk in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_spans(df, w=w).collect()
    }
    assert got == expected
