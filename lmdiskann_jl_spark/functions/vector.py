"""Distance metrics as native Catalyst column expressions.

Reference parity: the reference dispatches every distance through one generic
helper ``_dist(index, x, y) = Distances.evaluate(index.metric, x, y)``
(``/root/reference/src/LMDiskANN.jl:62``) with ``Euclidean()`` default and
``CosineDist()`` exercised in tests (``test/runtests.jl:31-67``).

Spark-first: each metric is a pure column expression over two
``ARRAY<FLOAT/DOUBLE>`` columns built from ``zip_with`` + ``aggregate`` higher-
order functions, so the whole hot path stays inside JVM whole-stage codegen —
no Python serialization per row.  Accumulation is forced to DOUBLE regardless
of the array element type (mirrors the reference computing distances in the
index element type but avoids float32 accumulation error at dim>=1000).

A user-supplied metric (the reference's ``metric::PreMetric`` extension
surface, ``src/LMDiskANN.jl:58,242``) can be any Python callable
``(Column, Column) -> Column``; ``resolve_metric`` accepts either a name or
such a callable.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

MetricFn = Callable[[Column, Column], Column]

_D = "double"

# Fixed-dimension fast path (optimization round 14).  Spark's array
# higher-order functions (zip_with / aggregate / transform) are
# CodegenFallback expressions: every evaluation is interpreted AND
# zip_with materializes an intermediate array per row — measured 6-8x
# slower than the equivalent unrolled expression chain on the 4M-pair
# crossJoin at sf0.1.  When the caller knows the (static) vector
# dimension, the metrics below emit an unrolled sum
#     ((0 + t_0) + t_1) + ... + t_{dim-1}
# over a[i]/b[i] element accesses, which stays inside whole-stage
# codegen.  The accumulation order is IDENTICAL to the HOF fold's
# left-to-right order, so results are bit-for-bit equal whenever both
# arrays have exactly ``dim`` elements (verified: 0 mismatching rows on
# the full 4M-pair fixture crossJoin) — and a ``size(a)==dim`` guard
# routes every other shape (ragged, null, shorter/longer arrays)
# through the original HOF expression, so behavior is unchanged in all
# cases.  Above _UNROLL_MAX_DIM the unrolled expression tree would bloat
# codegen; such calls keep the HOF form.
_UNROLL_MAX_DIM = 512

# Single-parse construction of the unrolled form (optimization round 14).
# Building the unrolled chain through the Column DSL costs one py4j
# round-trip per operator — measured 0.8 s (dot / sqeuclidean) to 2.1 s
# (cosine: three chains + guards) of pure DRIVER time per invocation at
# dim=64, dwarfing the execution win on all but the largest joins, and it
# is paid again on every fresh DataFrame build (every bench rep, every
# real call).  Assembling the identical expression as ONE SQL string and
# parsing it with a single F.expr() call costs ~1 ms to build and the same
# ~50-150 ms of analysis the DSL tree pays anyway.  The SQL text mirrors
# the DSL construction operator for operator (same left-to-right fold,
# same casts, same size() guard routing ragged/null arrays through the
# original HOF aggregate), so results stay bit-for-bit identical — pinned
# by tests/test_r14_kernels.py across all three forms.  The string path
# needs the inputs' SQL names, so it applies when both inputs are plain
# single-part column references (what every bulk call site passes); any
# other input shape keeps the Column-DSL construction below.

_SQL_ZERO = "CAST(0.0 AS DOUBLE)"


def _attr_sql(c: Column) -> str | None:
    """Backtick-quoted SQL text for a plain single-part column reference,
    else None (caller falls back to Column-DSL construction)."""
    try:
        node = c._jc.node()
        if node.getClass().getSimpleName() != "UnresolvedAttribute":
            return None
        parts = node.nameParts()
        if parts.size() != 1:
            return None
        name = parts.apply(0)
    except Exception:
        return None
    if "`" in name:
        return None
    return f"`{name}`"


def _sql_cast(e: str) -> str:
    return f"CAST({e} AS DOUBLE)"


def _sql_fold(terms: list[str]) -> str:
    # left-associative `0.0 + t0 + t1 + ...` parses to the identical
    # ((0+t0)+t1)+... tree the DSL _unrolled_fold builds
    return "(" + " + ".join([_SQL_ZERO, *terms]) + ")"


def _sql_guard2(asql: str, bsql: str, dim: int, fast: str, hof: str) -> str:
    return (
        f"CASE WHEN ((size({asql}) = {dim}) AND (size({bsql}) = {dim})) "
        f"THEN {fast} ELSE {hof} END"
    )


def _dot_sql(asql: str, bsql: str, dim: int) -> str:
    fast = _sql_fold(
        [f"{_sql_cast(f'{asql}[{i}]')} * {_sql_cast(f'{bsql}[{i}]')}" for i in range(dim)]
    )
    hof = (
        f"aggregate(zip_with({asql}, {bsql}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), {_SQL_ZERO}, (acc, x) -> acc + x)"
    )
    return _sql_guard2(asql, bsql, dim, fast, hof)


def _l2_sql(asql: str, dim: int) -> str:
    fast = "sqrt(" + _sql_fold(
        [f"{_sql_cast(f'{asql}[{i}]')} * {_sql_cast(f'{asql}[{i}]')}" for i in range(dim)]
    ) + ")"
    hof = (
        f"sqrt(aggregate({asql}, {_SQL_ZERO}, "
        f"(acc, x) -> acc + (CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    return f"CASE WHEN (size({asql}) = {dim}) THEN {fast} ELSE {hof} END"


def _sqeuclid_sql(asql: str, bsql: str, dim: int) -> str:
    def term(i: int) -> str:
        x, y = _sql_cast(f"{asql}[{i}]"), _sql_cast(f"{bsql}[{i}]")
        return f"({x} - {y}) * ({x} - {y})"

    fast = _sql_fold([term(i) for i in range(dim)])
    hof = (
        f"aggregate(zip_with({asql}, {bsql}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"{_SQL_ZERO}, (acc, x) -> acc + x)"
    )
    return _sql_guard2(asql, bsql, dim, fast, hof)


def _manhattan_sql(asql: str, bsql: str, dim: int) -> str:
    fast = _sql_fold(
        [f"abs({_sql_cast(f'{asql}[{i}]')} - {_sql_cast(f'{bsql}[{i}]')})" for i in range(dim)]
    )
    hof = (
        f"aggregate(zip_with({asql}, {bsql}, (x, y) -> "
        f"abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), {_SQL_ZERO}, (acc, x) -> acc + x)"
    )
    return _sql_guard2(asql, bsql, dim, fast, hof)


def _guarded(a: Column, b: Column | None, dim: int, fast: Column, hof: Column) -> Column:
    ok = F.size(a) == F.lit(dim)
    if b is not None:
        ok = ok & (F.size(b) == F.lit(dim))
    return F.when(ok, fast).otherwise(hof)


def _unrolled_fold(terms: list[Column]) -> Column:
    acc = F.lit(0.0).cast(_D)
    for t in terms:
        acc = acc + t
    return acc


def query_vector_lit(vec: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column for a driver-side query vector."""
    return F.array(*[F.lit(float(v)).cast(_D) for v in vec])


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """sum_i a_i * b_i, accumulated in double."""
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        asql, bsql = _attr_sql(a), _attr_sql(b)
        if asql is not None and bsql is not None:
            return F.expr(_dot_sql(asql, bsql, dim))
    hof = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast(_D) * y.cast(_D)),
        F.lit(0.0).cast(_D),
        lambda acc, x: acc + x,
    )
    if dim is None or dim > _UNROLL_MAX_DIM:
        return hof
    fast = _unrolled_fold([a[i].cast(_D) * b[i].cast(_D) for i in range(dim)])
    return _guarded(a, b, dim, fast, hof)


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        asql = _attr_sql(a)
        if asql is not None:
            return F.expr(_l2_sql(asql, dim))
    hof = F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast(_D),
            lambda acc, x: acc + x.cast(_D) * x.cast(_D),
        )
    )
    if dim is None or dim > _UNROLL_MAX_DIM:
        return hof
    fast = F.sqrt(
        _unrolled_fold([a[i].cast(_D) * a[i].cast(_D) for i in range(dim)])
    )
    return _guarded(a, None, dim, fast, hof)


def l2_normalize_col(df, vec_col: str, out_col: str | None = None):
    """Project ``vec_col`` L2-normalized (array<double>; zero vectors pass
    through) in ONE norm computation per ROW: the norm lands as a sibling
    column first, and the transform lambda only references it.  Embedding
    the l2_norm aggregate inside the lambda would re-evaluate it per
    ELEMENT — higher-order functions are interpreted, not codegen'd, so
    that shape is O(dim^2) per row and was measured as redundant work
    across the whole cosine PQ build/encode path.

    Used by the cosine PQ block layout: for unit vectors
    cosine_dist(a, b) = ||a - b||^2 / 2, so normalizing payloads at build
    time lets the sqeuclidean ADC machinery serve cosine exactly."""
    out = out_col or vec_col
    tmp = "_l2n"
    while tmp in df.columns:  # never clobber a caller's column
        tmp += "_"
    safe = F.when(F.col(tmp) == 0.0, F.lit(1.0)).otherwise(F.col(tmp))
    return (
        df.withColumn(tmp, l2_norm(F.col(vec_col)))
        .withColumn(out, F.transform(F.col(vec_col), lambda x: x.cast(_D) / safe))
        .drop(tmp)
    )


def sq_euclidean_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """Squared L2 — monotone in L2, cheaper: use for ranking, sqrt only at the end."""
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        asql, bsql = _attr_sql(a), _attr_sql(b)
        if asql is not None and bsql is not None:
            return F.expr(_sqeuclid_sql(asql, bsql, dim))
    hof = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast(_D) - y.cast(_D)) * (x.cast(_D) - y.cast(_D))),
        F.lit(0.0).cast(_D),
        lambda acc, x: acc + x,
    )
    if dim is None or dim > _UNROLL_MAX_DIM:
        return hof

    def term(i: int) -> Column:
        x, y = a[i].cast(_D), b[i].cast(_D)
        return (x - y) * (x - y)

    return _guarded(a, b, dim, _unrolled_fold([term(i) for i in range(dim)]), hof)


def euclidean_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """Euclidean() — the reference's default metric (src/LMDiskANN.jl:242)."""
    return F.sqrt(sq_euclidean_distance(a, b, dim))


def manhattan_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        asql, bsql = _attr_sql(a), _attr_sql(b)
        if asql is not None and bsql is not None:
            return F.expr(_manhattan_sql(asql, bsql, dim))
    hof = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast(_D) - y.cast(_D))),
        F.lit(0.0).cast(_D),
        lambda acc, x: acc + x,
    )
    if dim is None or dim > _UNROLL_MAX_DIM:
        return hof
    fast = _unrolled_fold([F.abs(a[i].cast(_D) - b[i].cast(_D)) for i in range(dim)])
    return _guarded(a, b, dim, fast, hof)


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    # try_divide: a zero-norm vector has no defined cosine — yield NULL (the
    # SQL-idiomatic "undefined") instead of an ANSI DIVIDE_BY_ZERO crash.
    # Bit-identical to plain division whenever the norms are non-zero.
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        asql, bsql = _attr_sql(a), _attr_sql(b)
        if asql is not None and bsql is not None:
            return F.expr(
                f"try_divide({_dot_sql(asql, bsql, dim)}, "
                f"({_l2_sql(asql, dim)}) * ({_l2_sql(bsql, dim)}))"
            )
    return F.try_divide(dot_product(a, b, dim), l2_norm(a, dim) * l2_norm(b, dim))


def cosine_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """CosineDist() = 1 - cos similarity (Distances.jl semantics used by the
    reference's cosine tests, test/runtests.jl:31-67)."""
    return F.lit(1.0) - cosine_similarity(a, b, dim)


_METRICS: dict[str, Callable[..., Column]] = {
    "euclidean": euclidean_distance,
    "l2": euclidean_distance,
    "sqeuclidean": sq_euclidean_distance,
    "cosine": cosine_distance,
    "manhattan": manhattan_distance,
    "l1": manhattan_distance,
    "dot": lambda a, b, dim=None: -dot_product(a, b, dim),  # max inner product
}


def resolve_metric(metric: str | MetricFn, dim: int | None = None) -> MetricFn:
    """Name -> distance expression; passthrough for user-supplied callables
    (the Spark analog of the reference's pluggable ``Distances.PreMetric``).

    ``dim``: static vector dimension hint — built-in metrics then use the
    codegen'd unrolled form (bit-identical, size-guarded; see the module
    note above).  Ignored for user-supplied callables."""
    if callable(metric):
        return metric
    try:
        fn = _METRICS[metric.lower()]
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; built-ins: {sorted(_METRICS)} "
            "or pass a callable (Column, Column) -> Column"
        ) from None
    if dim is None:
        return fn
    return lambda a, b: fn(a, b, dim)
