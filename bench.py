"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line (totals only — small enough that a tail-capture
of stdout always keeps it intact):
  {"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": <sf>, ...}
where "queries" holds ONLY the headline subset.  The full per-query time map
(one row per declared query) goes to BENCH_DETAIL.json next to this script and to stderr.

The headline set exercises every engine subsystem: exact search (scan top-k),
batched search (crossJoin+window), graph build (kNN join + prune), LSH
approximate join, the dedup suite, text analysis, and the relational demos.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lmdiskann_jl_spark.plans import queries as Q
    from lmdiskann_jl_spark.session import get_spark

    spark = get_spark(
        app_name="lmdiskann-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # the UI is off by default; the bench turns it on to read per-query
        # shuffle volume from the REST API (metrics below)
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
            # the status store evicts old stages past this bound; the
            # shuffle-volume metric below sums NEW stage ids per query, so
            # retention only needs to cover one query's stages — sized with
            # two orders of magnitude of slack
            "spark.ui.retainedStages": "50000",
        },
    )

    qs = Q.queries()
    # EVERY declared query is benchmarked so round-over-round regressions are
    # visible across the whole surface; `headline_total` preserves the
    # round-1-comparable subset sum.
    bench_queries = sorted(qs)
    headline = [
        "v_exact_topk_euclidean",
        "v_exact_topk_cosine",
        "v_batch_topk",
        "v_filtered_topk",
        "v_hybrid_search",
        "v_quantize",
        "v_knn_join",
        "v_adjacency_build",
        "a_lsh_knn",
        "d_dedup_exact",
        "d_minhash_lsh_pairs",
        "d_simhash",
        "d_ngram_jaccard_pairs",
        "d_embedding_neardup",
        "t_lang_id",
        "t_quality_score",
        "t_fingerprint",
        "r_tpch_q1",
        "r_tpch_q3",
        "r_user_sessions",
        "r_events_hourly",
    ]

    # warm the JVM + parquet footers once so per-query times measure the work
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    def completed_stages() -> list[tuple[int, int]] | None:
        """(stageId, shuffleWriteBytes) for completed stages (REST API).
        Returns None (and the bench degrades gracefully) if the UI is off.
        Per-query volume is the sum over stage ids NEWER than the previous
        query's high-water mark — a cumulative-sum delta would go NEGATIVE
        whenever the status store evicts old stages past retainedStages."""
        try:
            import urllib.request

            ui = spark.sparkContext.uiWebUrl
            if not ui:
                return None
            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=5
            ) as r:
                stages = json.load(r)
            return [
                (s.get("stageId", -1), s.get("shuffleWriteBytes", 0)) for s in stages
            ]
        except Exception:
            return None

    times: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    rep_ratios: list[float] = []  # worst/best across the two reps per query
    for name in bench_queries:
        best, worst, n, mark = None, None, 0, None
        for run in range(2):  # best-of-2: damps co-tenant noise on shared hosts
            if run == 1:
                # shuffle volume is measured over the SECOND run only: the
                # reported time is effectively the warm run's, and queries
                # with memoized artifacts (the recall-gate caches) shuffle
                # less when warm — halving a two-run total would report a
                # volume matching neither run.
                # The status store is fed asynchronously (AppStatusListener
                # can lag the action's return), so a run-1 stage may register
                # AFTER this snapshot and get mis-counted into run 2 — poll
                # until the completed-stage set is stable across two samples
                # before taking the high-water mark.
                before = completed_stages()
                if before is not None:
                    for _ in range(20):
                        time.sleep(0.05)
                        again = completed_stages()
                        if again is None or {i for i, _ in again} == {
                            i for i, _ in before
                        }:
                            before = again if again is not None else before
                            break
                        before = again
                mark = (
                    max((i for i, _ in before), default=-1)
                    if before is not None
                    else None
                )
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()  # force full execution
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
            worst = elapsed if worst is None else max(worst, elapsed)
        # the post-run snapshot races the async status store the same way
        # the pre-run one does — poll to stability so a run-2 stage that
        # registers late is counted here, not silently dropped
        after = completed_stages()
        if after is not None:
            for _ in range(20):
                time.sleep(0.05)
                again = completed_stages()
                if again is None or {i for i, _ in again} == {i for i, _ in after}:
                    after = again if again is not None else after
                    break
                after = again
        if after is not None and mark is not None:
            shuffle_mb[name] = round(sum(b for i, b in after if i > mark) / 1e6, 3)
        times[name] = round(best, 3)
        if best and best > 0.2:
            # sub-0.2s entries are scheduler-latency-dominated: their rep
            # ratio measures jitter of fixed overheads, not ambient load
            rep_ratios.append(worst / best)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    # warm-vs-warm noise probe: the rep ratios above compare a COLD first
    # run (gate-cache builds, plan compilation) against a warm one, which
    # overstates ambient noise.  One extra pass over the headline subset —
    # everything is warm now — measures co-tenant jitter proper: the band
    # a round-over-round delta must clear before it means anything.
    warm_ratios: list[float] = []
    for name in headline:
        if name not in times or times[name] <= 0.2:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        lo, hi = sorted((dt, times[name]))
        warm_ratios.append(hi / max(lo, 1e-9))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "full_suite_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        # totals-only line: the headline subset is small enough to inline;
        # the full per-query map lives in BENCH_DETAIL.json (below)
        "queries": {q: times[q] for q in headline if q in times},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        "headline_total": round(sum(times[q] for q in headline if q in times), 3),
        # a_* entries are index-build + recall QUALITY GATES (KMeans
        # fits, multi-query eval loops), not per-query latencies —
        # split out so query time is comparable round over round
        "gates_total": round(
            sum(t for q, t in times.items() if q.startswith("a_")), 3
        ),
        "queries_total": round(
            sum(t for q, t in times.items() if not q.startswith("a_")), 3
        ),
        # measured ambient-noise band for THIS invocation.  The usable
        # band is median_warm_ratio: headline queries re-run fully warm vs
        # their recorded best — pure co-tenant jitter.  median_cold_warm
        # _ratio (each query's two main reps) includes one-time gate-cache
        # builds and plan compilation, so it OVERSTATES noise; it is kept
        # as the warmup-cost indicator, not the regression band.
        # Round-over-round suite deltas inside the warm band are session
        # pressure, not code — four identical-code runs spanned ±10% on
        # this box (SCALING.md "ambient-variance"); A/B isolated worktrees
        # before attributing anything within ~1.5x of the band.
        "noise": {
            "median_warm_ratio": round(
                sorted(warm_ratios)[len(warm_ratios) // 2], 3
            ) if warm_ratios else None,
            "median_cold_warm_ratio": round(
                sorted(rep_ratios)[len(rep_ratios) // 2], 3
            ) if rep_ratios else None,
            "ambient_band_frac": 0.10,
        },
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {**summary, "queries": times, "shuffle_write_mb": shuffle_mb},
            f, indent=1, sort_keys=True,
        )
    print(json.dumps({**summary, "queries": times}), file=sys.stderr)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
