"""Seeded driver-side Lloyd's k-means over a bounded sample.

Codebook/centroid TRAINING is the one piece of the IVF/PQ pipeline that does
not need the cluster: the standard practice at any scale (FAISS trains its
quantizers the same way) is to fit on a bounded sample — k-means quality
saturates long before the sample stops fitting in one machine's memory — and
keep ASSIGNMENT/ENCODING distributed, which this package does (broadcast
centroid join, scan-stage argmin).

The previous MLlib path ran m x (k-means|| init + 20 iterations) of tiny
Spark jobs — ~200 scheduler round-trips to fit 256 codewords on kilobytes of
data; pure overhead locally and still the wrong shape on a real cluster.

Deterministic: seeded numpy RandomState, k-means++ init, fixed iteration
count, ties broken by lowest index.  No randomness outside the seed.
"""

from __future__ import annotations

import numpy as np

MAX_TRAIN_ROWS = 65_536

# points per centroid actually used by a fit: k-means quality saturates
# around a few hundred points per center (the FAISS guideline), so larger
# samples only slow training down.  fit_kmeans subsamples an even stride of
# the canonically-ordered input beyond this — deterministic.
TRAIN_POINTS_PER_CENTROID = 256


def _pairwise_sq(X: np.ndarray, C: np.ndarray, x2: np.ndarray | None = None) -> np.ndarray:
    """(n, k) squared euclidean distances via the matmul expansion.  ``x2``
    optionally passes the precomputed per-row squared norms (the dominant
    redundant cost when called in a loop over candidate centers)."""
    if x2 is None:
        x2 = (X * X).sum(axis=1)
    d2 = x2[:, None] + (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
    np.maximum(d2, 0.0, out=d2)
    return d2


def fit_kmeans(
    X: np.ndarray, k: int, seed: int, n_iter: int = 20, n_init: int = 4
) -> np.ndarray:
    """Lloyd's with k-means++ init on an in-memory sample; returns (k, dim)
    float64 centers.  Empty clusters keep their previous center (stable).

    ``n_init`` independent seeded restarts, keeping the lowest-inertia run
    (the sklearn/FAISS ``n_init``/``nredo`` practice): k-means++ is
    init-sensitive, and a single unlucky draw measurably degrades both
    quantization error (PQ ADC accuracy) and cell balance (IVF recall)."""
    X = np.asarray(X, dtype=np.float64)
    cap = TRAIN_POINTS_PER_CENTROID * k
    if len(X) > cap:
        X = X[np.linspace(0, len(X) - 1, cap).astype(np.int64)]
    best: tuple[float, np.ndarray] | None = None
    for run in range(max(1, n_init)):
        centers = _fit_once(X, k, seed + run, n_iter)
        inertia = float(_pairwise_sq(X, centers).min(axis=1).sum())
        if best is None or inertia < best[0]:
            best = (inertia, centers)
    return best[1]


def _fit_once(X: np.ndarray, k: int, seed: int, n_iter: int) -> np.ndarray:
    n = X.shape[0]
    rng = np.random.RandomState(seed)
    k = min(k, n)
    x2 = (X * X).sum(axis=1)
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.randint(n)]
    d2 = _pairwise_sq(X, centers[:1], x2).ravel()
    for j in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            centers[j] = X[rng.randint(n)]
        else:
            centers[j] = X[rng.choice(n, p=d2 / tot)]
        d2 = np.minimum(d2, _pairwise_sq(X, centers[j : j + 1], x2).ravel())
    prev = None
    for _ in range(n_iter):
        labels = _pairwise_sq(X, centers, x2).argmin(axis=1)
        if prev is not None and np.array_equal(labels, prev):
            break  # converged: assignments fixed -> centers fixed
        prev = labels
        # vectorized Lloyd update: one bincount per dimension instead of k
        # boolean-mask scans (empty clusters keep their previous center)
        counts = np.bincount(labels, minlength=k)
        nz = counts > 0
        for d in range(X.shape[1]):
            sums = np.bincount(labels, weights=X[:, d], minlength=k)
            centers[nz, d] = sums[nz] / counts[nz]
    return centers


def sample_matrix(vectors, vec_col: str, seed: int, max_rows: int = MAX_TRAIN_ROWS) -> np.ndarray:
    """Collect a bounded, DETERMINISTIC seeded sample of a vector column as
    an (n, dim) numpy array.

    Selection = the ``max_rows`` rows with the smallest seeded content hash
    (``xxhash64(vec, seed)``) — a pure function of the DATA, so the sample
    (and every centroid trained from it) is identical across partition
    layouts, repartitions, and environments.  (``df.sample().limit()`` is
    not: which rows survive the limit depends on physical partition order.)
    Physical plan is TakeOrderedAndProject — a per-partition bounded heap +
    driver merge, no full sort, no separate count() job.  Hash ties can only
    come from equal-content rows (xxhash64 collisions aside), which are
    interchangeable as training points."""
    from pyspark.sql import functions as F

    rows = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)).asc(), F.col(vec_col).asc())
        .limit(max_rows)
        .collect()
    )
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    # canonical (lexicographic) row order: k-means++ indexes into X, so row
    # ORDER — not just row membership — must be a pure function of content
    # for trained centroids to be reproducible
    return X[np.lexsort(X.T[::-1])] if len(X) else X
