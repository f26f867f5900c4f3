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
