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

    # Pre-warm the session-memoized gate artifacts (index builds, k-means
    # fits, exact baselines — _GATE_CACHE in plans.queries) BEFORE the timed
    # loop: gate rows then measure SEARCH, not one-time artifact builds
    # (isolated evidence, round 10: a_lsh_auto_recall cold 12.4 s vs warm
    # 2.2 s — best-of-2 only absorbs that on a quiet box).  The build cost
    # stays visible as gates_warmup_sec.  Since round 13 the expensive
    # builds also persist across processes (_gate_disk_root's
    # fingerprint-keyed disk cache), so on an unchanged tree this loop
    # mostly RELOADS — gates_disk_hits/_misses in the output record which
    # case this run was.
    t0 = time.time()
    for name in bench_queries:
        # s_* streaming gates are memoized one-time runs too (index builds,
        # availableNow replays) — warming them keeps the timed reps
        # homogeneous (both reps read the materialized result); the
        # time-travel gate rides the churn gate's memoized index lifecycle
        if name.startswith(("a_", "s_")) or name in (
            "v_time_travel_search", "v_time_travel_ivf",
        ):
            qs[name](spark, sf_dir).count()
    gates_warmup = round(time.time() - t0, 3)
    print(f"# gate artifact warmup: {gates_warmup}s", file=sys.stderr)

    def stable_stages():
        """completed_stages(), polled to stability: the status store is fed
        asynchronously (AppStatusListener can lag the action's return), so a
        just-finished stage may register after a single snapshot."""
        snap = completed_stages()
        if snap is not None:
            for _ in range(20):
                time.sleep(0.05)
                again = completed_stages()
                if again is None or {i for i, _ in again} == {i for i, _ in snap}:
                    snap = again if again is not None else snap
                    break
                snap = again
        return snap

    def timed_pass():
        """One full measurement pass: best-of-2 per query, shuffle volume
        from the second (warm) rep.  Returns (times, shuffle_mb, rep_ratios)."""
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
                    before = stable_stages()
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
            after = stable_stages()
            if after is not None and mark is not None:
                shuffle_mb[name] = round(
                    sum(b for i, b in after if i > mark) / 1e6, 3
                )
            times[name] = round(best, 3)
            if best and best > 0.2:
                # sub-0.2s entries are scheduler-latency-dominated: their rep
                # ratio measures jitter of fixed overheads, not ambient load
                rep_ratios.append(worst / best)
            print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)
        return times, shuffle_mb, rep_ratios

    def warm_probe(times):
        """Warm-vs-warm noise probe: re-run the headline subset (everything
        is warm now) against its recorded best — pure co-tenant jitter, the
        band a round-over-round delta must clear before it means anything."""
        ratios: list[float] = []
        for name in headline:
            if name not in times or times[name] <= 0.2:
                continue
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            lo, hi = sorted((dt, times[name]))
            ratios.append(hi / max(lo, 1e-9))
        return ratios

    def med(vals):
        return round(sorted(vals)[len(vals) // 2], 3) if vals else None

    # Self-validation (round 11): a loaded box produces a per-query map
    # that is unusable for round-over-round comparison (BENCH_r10 recorded
    # +46% while its own probe read 1.248).  If the warm probe exceeds the
    # band, the whole pass is re-measured once — everything is warm, so the
    # retry is cheap — and the better-attested pass is recorded.  A run that
    # STILL fails the band is marked "valid": false rather than standing as
    # the round's number.
    WARM_RATIO_BAND = 1.15
    attempts = 0
    times, shuffle_mb, rep_ratios = timed_pass()
    warm_ratios = warm_probe(times)
    if (med(warm_ratios) or 1.0) > WARM_RATIO_BAND:  # one retry, by design
        attempts = 1
        print(
            f"# warm probe {med(warm_ratios)} > {WARM_RATIO_BAND}: box is "
            "loaded — re-measuring the full pass", file=sys.stderr,
        )
        t2, s2, r2 = timed_pass()
        w2 = warm_probe(t2)
        if (med(w2) or 1.0) <= (med(warm_ratios) or 1.0):
            times, shuffle_mb, rep_ratios, warm_ratios = t2, s2, r2, w2
    valid = (med(warm_ratios) or 1.0) <= WARM_RATIO_BAND

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
        # gate rows are WARM searches (artifacts pre-built before the timed
        # loop); the one-time build cost is gates_warmup_sec
        "gates_total": round(
            sum(t for q, t in times.items() if q.startswith("a_")), 3
        ),
        "gates_warmup_sec": gates_warmup,
        # round 13: expensive gate artifacts persist across processes in a
        # fingerprint-keyed disk cache (plans/queries._gate_disk_root) —
        # these counters record whether THIS run's warmup was cold (first
        # run on a changed tree rebuilds everything) or warm (unchanged
        # tree: builds reload).  A warm warmup is legitimate: every cached
        # output is deterministic for the (source, data, session-layout)
        # key, the same property the oracle hash gate asserts.
        "gates_disk_hits": getattr(Q, "DISK_GATE_HITS", 0),
        "gates_disk_misses": getattr(Q, "DISK_GATE_MISSES", 0),
        "queries_total": round(
            sum(t for q, t in times.items() if not q.startswith("a_")), 3
        ),
        # false = the warm probe exceeded the band even after one full
        # re-measure: the box was loaded for the whole invocation and this
        # artifact must not be used for round-over-round comparison
        "valid": valid,
        # measured ambient-noise band for THIS invocation.  The usable
        # band is median_warm_ratio: headline queries re-run fully warm vs
        # their recorded best — pure co-tenant jitter.  median_cold_warm
        # _ratio (each query's two main reps) includes first-run plan
        # compilation (gate-cache builds no longer appear in it — they are
        # pre-warmed before the timed loop since r11), so it still
        # OVERSTATES noise; it is kept as the warmup-cost indicator, not
        # the regression band.
        # Round-over-round suite deltas inside the warm band are session
        # pressure, not code — four identical-code runs spanned ±10% on
        # this box (SCALING.md "ambient-variance"); A/B isolated worktrees
        # before attributing anything within ~1.5x of the band.
        "noise": {
            "median_warm_ratio": med(warm_ratios),
            "median_cold_warm_ratio": med(rep_ratios),
            "ambient_band_frac": 0.10,
            "warm_ratio_band": WARM_RATIO_BAND,
            "remeasured": attempts,
        },
        # self-describing validity caveat so readers of the JSON alone
        # (round-15 ADVICE) do not treat an invalid run's total as attested
        "validity_note": (
            "valid:true — warm-probe ratio within the band; totals usable "
            "for round-over-round comparison"
            if valid
            else "valid:false — co-tenant load exceeded the warm-probe "
            "band; totals are NOT attested, use only same-run relative "
            "comparisons"
        ),
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
