"""Round-14 optimization invariants.

1. The fixed-dim unrolled distance kernels (functions/vector.py) must be
   bit-identical to the higher-order-function forms when sizes match, and
   must fall back to the HOF result (not garbage / not raise) on ragged,
   short, long, and null arrays.
2. lsh_knn_join's collision dedup: configs under the measured codegen cliff
   (FIRST_COLLISION_MAX_TERMS) dedup by a map-side first-collision filter —
   no aggregate in the plan at all; wider configs keep the single-exchange
   groupBy form (dedup aggregate + rank window over one shuffle).  Both
   shapes must return identical rows.
3. semantic_dedup_pairs' score-before-dedup reorder must keep the output a
   set (no duplicate pairs from shared probe cells).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.functions.vector import (
    cosine_distance,
    dot_product,
    euclidean_distance,
    l2_norm,
    manhattan_distance,
    sq_euclidean_distance,
)


@pytest.fixture(scope="module")
def emb_small(spark, embeddings):
    """First 64 corpus vectors as (id, vec, label) — 8-dim slices keep the
    LSH/semantic plans fast while exercising the real operators."""
    return (
        embeddings.filter(F.col("vec_id") < 64)
        .select(
            F.col("vec_id").alias("id"),
            F.slice("embedding", 1, 8).alias("vec"),
            "label",
        )
        .cache()
    )


@pytest.fixture(scope="module")
def vec_pairs(spark):
    rows = [
        # equal-length pairs (the unrolled fast path)
        (1, [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
        (3, [-1.5, 2.5, -3.5, 4.5], [0.1, 0.2, 0.3, 0.4]),
        # ragged: shorter / longer than the declared dim (guard -> HOF path)
        (4, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (5, [1.0, 2.0, 3.0, 4.0, 5.0], [5.0, 4.0, 3.0, 2.0, 1.0]),
        # mismatched lengths
        (6, [1.0, 2.0, 3.0, 4.0], [1.0, 2.0]),
        # null array
        (7, None, [1.0, 2.0, 3.0, 4.0]),
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


@pytest.mark.parametrize(
    "fn,binary",
    [
        (dot_product, True),
        (sq_euclidean_distance, True),
        (euclidean_distance, True),
        (manhattan_distance, True),
        (cosine_distance, True),
        (l2_norm, False),
    ],
)
def test_unrolled_matches_hof_bitwise(vec_pairs, fn, binary):
    if binary:
        hof = fn(F.col("a"), F.col("b"))
        fast = fn(F.col("a"), F.col("b"), 4)
    else:
        hof = fn(F.col("a"))
        fast = fn(F.col("a"), 4)
    rows = vec_pairs.select("id", hof.alias("h"), fast.alias("u")).collect()
    assert len(rows) == 7
    for r in rows:
        # bit-for-bit: same accumulation order on the fast path, literal
        # HOF fallback on every guarded shape — repr-compare so NaN==NaN
        # and -0.0 vs 0.0 would be caught too
        assert repr(r["h"]) == repr(r["u"]), f"id={r['id']}: {r['h']} != {r['u']}"


def test_expr_string_fastpath_and_dsl_fallback(vec_pairs):
    """With dim and plain column refs the kernel is assembled as ONE parsed
    SQL string (a single py4j round-trip, ~1 ms, vs 0.8-2.1 s for the
    operator-by-operator Column-DSL chain — optimization round 14); any
    other input shape (qualified, computed, literal) keeps the DSL
    construction.  Both constructions must stay bit-identical to each other
    and to the HOF form on every row shape."""
    from lmdiskann_jl_spark.functions.vector import _attr_sql

    # detection: plain single-part refs in; qualified/computed shapes out
    assert _attr_sql(F.col("a")) == "`a`"
    assert _attr_sql(F.col("t.a")) is None
    assert _attr_sql(F.col("a") + 1) is None
    assert _attr_sql(F.array(F.lit(1.0))) is None

    # identity transform keeps values but is NOT an attribute ref, so it
    # routes construction through the DSL fallback; the plain ref routes
    # through the SQL string.  Same data -> results must match bitwise.
    via_sql = sq_euclidean_distance(F.col("a"), F.col("b"), 4)
    via_dsl = sq_euclidean_distance(
        F.transform(F.col("a"), lambda x: x), F.col("b"), 4
    )
    rows = vec_pairs.select("id", via_sql.alias("s"), via_dsl.alias("d")).collect()
    assert len(rows) == 7
    for r in rows:
        assert repr(r["s"]) == repr(r["d"]), f"id={r['id']}: {r['s']} != {r['d']}"


def test_unrolled_dim_cap_returns_hof():
    # above the unroll cap the call must degrade to the plain HOF column.
    # Lambda variable ids (x_12, y_13, ...) are allocated from a global
    # counter, so two separately-built columns never stringify identically —
    # normalize them away before comparing structure.
    import re

    def shape(c):
        return re.sub(r"[xy]_\d+", "v", str(c))

    big = dot_product(F.col("a"), F.col("b"), 10_000)
    plain = dot_product(F.col("a"), F.col("b"))
    assert shape(big) == shape(plain)


def _plan_tree(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [
        ln for ln in buf.getvalue().splitlines()
        if ln.strip().startswith(("+-", ":-", ":", "Window", "AdaptiveSparkPlan"))
    ]


def test_lsh_knn_join_first_collision_no_dedup_aggregate(spark, emb_small):
    """Configs whose (table x probe) term count fits the codegen cliff
    (FIRST_COLLISION_MAX_TERMS) dedup by first-collision filter inside the
    join stage: the plan must carry NO HashAggregate anywhere — the only
    shuffle left is the rank window's."""
    from lmdiskann_jl_spark.operators.knn_join import lsh_knn_join

    df = lsh_knn_join(
        emb_small, emb_small, k=4, dim=8, metric="euclidean",
        n_planes=3, n_tables=4,
        left_id="id", right_id="id", vec_col="vec",
    )
    tree = _plan_tree(df)
    aggs = [ln for ln in tree if "HashAggregate (" in ln]
    assert not aggs, f"first-collision path must not aggregate: {aggs}"
    # and the output is already a set: exactly one row per (l, r)
    rows = df.collect()
    keys = [(r["id_l"], r["id_r"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_lsh_knn_join_wide_config_keeps_single_exchange_dedup(spark, emb_small):
    """Above the measured codegen cliff the operator falls back to the
    round-14 single-exchange groupBy dedup: two HashAggregates (partial +
    final) directly above ONE exchange, shared with the rank window."""
    from lmdiskann_jl_spark.operators.knn_join import lsh_knn_join

    df = lsh_knn_join(
        emb_small, emb_small, k=4, dim=8, metric="euclidean",
        n_planes=2, n_tables=40,  # 40 terms > FIRST_COLLISION_MAX_TERMS
        left_id="id", right_id="id", vec_col="vec",
    )
    tree = _plan_tree(df)
    widx = next(i for i, ln in enumerate(tree) if "Window (" in ln)
    below = tree[widx:]
    eidx = next(i for i, ln in enumerate(below) if "Exchange (" in ln)
    between = below[:eidx]
    aggs = [ln for ln in between if "HashAggregate (" in ln]
    exchanges = [ln for ln in between if "Exchange (" in ln]
    assert len(aggs) == 2, f"expected partial+final agg above one exchange: {between}"
    assert not exchanges


def test_lsh_knn_join_first_collision_matches_groupby_dedup(
    spark, emb_small, monkeypatch
):
    """The two dedup shapes must produce identical (l, r, dist, rank) rows.
    The guard picks the shape from the term count, so run the same configs
    twice — once naturally (first-collision) and once with the guard forced
    to 0 (groupBy fallback) — and compare row sets exactly.  Covers both a
    single-bucket and a multiprobe (asymmetric sides) configuration."""
    from lmdiskann_jl_spark.operators import knn_join as KJ

    configs = [
        dict(n_planes=3, n_tables=4),              # single-bucket, 4 terms
        dict(n_planes=2, n_tables=6, probes=4),    # multiprobe, 24 terms
    ]
    for cfg in configs:
        fc = KJ.lsh_knn_join(
            emb_small, emb_small, k=3, dim=8, metric="euclidean",
            left_id="id", right_id="id", vec_col="vec", **cfg,
        )
        fc_rows = {tuple(r) for r in fc.collect()}
        keys = [(a, b) for a, b, *_ in fc_rows]
        assert len(keys) == len(set(keys))
        monkeypatch.setattr(KJ, "FIRST_COLLISION_MAX_TERMS", 0)
        gb = KJ.lsh_knn_join(
            emb_small, emb_small, k=3, dim=8, metric="euclidean",
            left_id="id", right_id="id", vec_col="vec", **cfg,
        )
        gb_rows = {tuple(r) for r in gb.collect()}
        monkeypatch.undo()
        assert fc_rows == gb_rows, f"dedup shapes disagree for {cfg}"


def test_semantic_dedup_no_duplicate_pairs(spark, emb_small):
    from lmdiskann_jl_spark.operators.dedup import semantic_dedup_pairs

    # plant one exact twin so at least one pair crosses the threshold; with
    # assign_probes=2 the twin pair is generated from BOTH probe cells and
    # must still appear exactly once after the post-score dedup
    twin = emb_small.filter(F.col("id") == 0).select(
        (F.col("id") + 1000).alias("id"), F.col("vec"), *(
            [c for c in emb_small.columns if c not in ("id", "vec")]
        )
    )
    pairs = semantic_dedup_pairs(
        emb_small.unionByName(twin), threshold=0.95, n_cells=4,
        id_col="id", vec_col="vec",
    ).collect()
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert (0, 1000) in keys
    assert len(keys) == len(set(keys)), "duplicate pairs leaked through dedup"
