"""Cost-based physical strategy selection for similarity search.

The reference hard-codes one physical plan (greedy graph search,
src/LMDiskANN.jl:383-431).  Spark-side we have four, with different
scale/recall tradeoffs; this module is the tiny planner that picks one the
way Catalyst picks a join strategy:

| strategy | cost shape | recall | when |
|---|---|---|---|
| exact scan | O(n) fully parallel, shuffle-free (TakeOrderedAndProject) | 1.0 | n small enough to scan per query batch |
| IVF probe | O(n * nprobe / n_cells) with partition pruning | ~.8+ | clustered data, index prebuilt |
| LSH bucket join | O(sum of bucket^2) | ~.7-.9 | massive self-joins (dedup) |
| graph beam | O(hops * ef * degree) point lookups | ~.7-.9+ | single queries on a built graph |

``choose_search_strategy`` is deliberately simple and deterministic: exact
under the scan budget, else IVF when an index exists, else beam when a graph
exists, else exact with a warning-sized cost.  At 100 TB "exact" means one
full columnar scan — still the right answer for large *batched* query sets
(amortized one scan for all queries), which is why batch size factors in.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SearchContext:
    n_vectors: int
    n_queries: int = 1
    has_ivf: bool = False
    has_graph: bool = False
    # a fresh LM-DiskANN block layout (index.build_beam_blocks): the hop
    # ladder is ONE pruned fetch per hop shared by the whole batch (chunked
    # driver sweeps bound memory), so beam stops being a small-batch-only
    # strategy
    has_blocks: bool = False
    # a single executor comfortably scans ~10^6 64-dim vectors/sec/core;
    # exact stays optimal while n * n_queries stays under this per-batch budget
    exact_budget: int = 50_000_000


def choose_search_strategy(ctx: SearchContext) -> str:
    """Returns one of 'exact' | 'ivf' | 'beam' | 'lsh'."""
    if ctx.n_vectors * max(1, ctx.n_queries) <= ctx.exact_budget:
        return "exact"
    if ctx.has_ivf:
        return "ivf"
    if ctx.has_graph and (ctx.has_blocks or ctx.n_queries <= 100):
        # without blocks, beam pays a two-job driver ladder per hop — only
        # worth it for small batches; WITH blocks the ladder is one pruned
        # fetch per hop amortized across the whole (chunked) batch
        return "beam"
    if ctx.n_queries > 100:
        # huge query batches against huge tables: bucketed join amortizes
        return "lsh"
    return "exact"
