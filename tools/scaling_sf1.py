"""One-decade scaling extension for the LSH kNN operating point (round 12).

SCALING.md's sf0.001->0.1 sweep flagged `a_lsh_knn_auto` (3.58x/10x) and
`a_lsh_knn` (2.35x/10x) as the suite's worst last-step ratios — by design
shuffle-volume-bound (the n^rho candidate-pair floor of sign-projection
LSH), but the claim that the AUTO operating point holds at the NEXT decade
was extrapolated, not measured.  This tool measures it.

The driver ships sf0.001/0.01/0.1 only (read-only), so the sf1 embeddings
table is SYNTHESIZED to the same distribution the smaller tables follow —
verified empirically isotropic unit-norm 64-dim vectors (per-label centroid
norms ~0.07 vs per-point norms 1.0 at sf0.1, i.e. labels do not separate
clusters), so 10x more of the same process is the honest extension.  Rows
= 10x sf0.1's 2000, seeded, unit-normalized float32, label = i % 10.  The
synthetic dir lives under /tmp (never /root/testdata, which is read-only
by contract) and is content-stable across runs (fixed seed).

Measures best-of-2 warm wall + warm-run shuffle-write MB (UI REST, the
bench.py/scaling_report.py approach) for the LSH trio at sf0.1 and sf1,
prints one line each, and rewrites the "## sf1 extension" section of
SCALING.md.  The recall gate (`a_lsh_auto_recall`) rides along: it RAISES
below the 0.70 bar, so a passing run proves the AUTO point's recall holds
at the new decade, not just its wall time.

Usage: python3 tools/scaling_sf1.py
"""

from __future__ import annotations

import json as _json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/lmdiskann_scaling_sf1"
SF1_ROWS_MULT = 10
SEED = 4242
QUERIES = [
    "a_lsh_knn",
    "a_lsh_knn_auto",
    "a_lsh_auto_recall",
    # round 12: multiprobe at a quarter of the AUTO table budget — its gate
    # raises below 0.70, so a completed row certifies multiprobe recall at
    # sf1 too (round 13 moved the AUTO default onto this point, so the
    # auto and multiprobe rows now measure the same configuration)
    "a_lsh_multiprobe_recall",
    # round 13: the beam/graph path and the IVF probe measured at the same
    # decade instead of extrapolated past sf0.1.  Both gates RAISE below
    # the 0.70 bar; their one-time index/k-means builds are session-cached
    # (_GATE_CACHE keyed by sf_dir), so the second timed rep reads the
    # memoized result — the row's value is the gate COMPLETING at sf1
    # (recall held at 10x corpus) plus the first-rep build/probe wall.
    "a_beam_recall",
    "a_ivf_recall",
    # round 13 (second pass): the remaining beam-family paths at the same
    # decade — filter-during-search and the PQ-compressed block format in
    # both metrics.  First-rep walls are build-dominated (shared index /
    # edge set / codebook, all session+disk cached); the row completing is
    # the recall claim (measured 0.78 / 0.72 / 0.74 at first
    # certification, vs raw beam's 0.92 — ADC compression pays ~0.2 of
    # recall at the bar-holding probe budget, the paper's trade).
    "a_filtered_beam_recall",
    "a_beam_pq_recall",
    "a_beam_pq_cosine_recall",
    # round 13 (third pass): the graph-BUILD path at the decade.  The old
    # pinned-8-table default measured 0.312 at n=20000; the AUTO-resolved
    # default (occupancy planes + quarter-budget multiprobe tables)
    # measures 0.996 — the rule the production ingest path (insert_batch
    # past LSH_INSERT_THRESHOLD) now inherits.
    "a_graph_build_lsh_recall",
]


def _ensure_sf1() -> str:
    """Synthesize the sf1 embeddings table once (idempotent, seeded)."""
    dest = os.path.join(SF1_DIR, "embeddings.parquet")
    if os.path.exists(dest):
        return SF1_DIR
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n01 = duckdb.connect().execute(
        f"select count(*) from '{SF01}/embeddings.parquet'"
    ).fetchone()[0]
    n = int(n01) * SF1_ROWS_MULT
    rng = np.random.default_rng(SEED)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(n)], pa.int32()),
        }
    )
    os.makedirs(SF1_DIR, exist_ok=True)
    pq.write_table(tbl, dest)
    print(f"# synthesized sf1 embeddings: {n} rows at {dest}", file=sys.stderr)
    return SF1_DIR


def main() -> int:
    import __spark_entry__ as entry
    from lmdiskann_jl_spark.session import get_spark

    sf1 = _ensure_sf1()
    spark = get_spark(
        app_name="scaling-sf1",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "2000",
        },
    )
    qs = entry.queries()
    for sf in (SF01, sf1):
        spark.read.parquet(f"{sf}/embeddings.parquet").count()

    def completed_stages():
        try:
            import urllib.request

            ui = spark.sparkContext.uiWebUrl
            if not ui:
                return None
            app = spark.sparkContext.applicationId

            def snap():
                with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages?status=complete",
                    timeout=5,
                ) as r:
                    return [
                        (s.get("stageId", -1), s.get("shuffleWriteBytes", 0))
                        for s in _json.load(r)
                    ]

            cur = snap()
            for _ in range(20):
                time.sleep(0.05)
                again = snap()
                if {i for i, _ in again} == {i for i, _ in cur}:
                    return again
                cur = again
            return cur
        except Exception:
            return None

    lines = []
    for name in QUERIES:
        cells = []
        for sf in (SF01, sf1):
            best, mark = None, None
            for run in range(2):
                if run == 1:
                    before = completed_stages()
                    mark = (
                        max((i for i, _ in before), default=-1)
                        if before is not None
                        else None
                    )
                t0 = time.time()
                qs[name](spark, sf).count()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            after = completed_stages()
            smb = (
                round(sum(b for i, b in after if i > mark) / 1e6, 2)
                if after is not None and mark is not None
                else None
            )
            cells.append((best, smb))
        (t01, s01), (t1, s1) = cells
        ratio = t1 / t01 if t01 > 0 else float("nan")
        sratio = (s1 / s01) if (s01 and s1) else None
        line = (
            f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.2f} | "
            f"{'?' if s01 is None else f'{s01:g}'} | "
            f"{'?' if s1 is None else f'{s1:g}'} | "
            f"{'?' if sratio is None else f'{sratio:.2f}'} |"
        )
        lines.append(line)
        print(line, file=sys.stderr)

    section = (
        "\n## sf1 extension — the ANN decade check (rounds 12-13)\n\n"
        "The sweep above stops at sf0.1; the two worst last-step ratios\n"
        "(`a_lsh_knn_auto`, `a_lsh_knn`) are shuffle-volume-bound by the\n"
        "n^rho candidate-pair floor, and this section MEASURES the next\n"
        "decade instead of extrapolating it.  sf1 = 10x sf0.1 rows of the\n"
        "same verified-isotropic unit-norm process (synthesized, seeded —\n"
        "tools/scaling_sf1.py; /root/testdata is read-only).  The recall\n"
        "gate rows RAISE below 0.70, so their presence certifies each\n"
        "path's recall at sf1, not just its wall.  Round 13 adds the\n"
        "beam/graph path (`a_beam_recall`: shared index build + one\n"
        "shared-frontier block-layout traversal) and the IVF probe\n"
        "(`a_ivf_recall`: k-means fit + one partition-pruned batch scan)\n"
        "at the same decade — for those two the sf0.1/sf1 walls are\n"
        "dominated by the one-time session-cached artifact build (index,\n"
        "cells, exact baseline) of the FIRST rep, so read their ratios as\n"
        "build-cost growth; the gate completing is the recall claim.\n"
        "THE BEAM MEASUREMENT FALSIFIED THE FIXED PROBE POINT, exactly as\n"
        "round 12's LSH measurement falsified rho=0.3: (ef=100, hops=6,\n"
        "eps=4) measured 0.540 at n=20000 — a pure top-maxdegree kNN\n"
        "graph (reference parity, degree 8) has no long-range shortcuts,\n"
        "so its effective diameter outgrows log_d(n) and frontiers stall.\n"
        "Measured levers (tools, full sweep in the round-13 notes): hops\n"
        "6->10 alone recovers 0.740; doubling entrypoints 4->8 dominates,\n"
        "0.760->0.920 at ef=200; wider plateaus at 0.92-0.94.  The gate\n"
        "now probes at beam_gate_params(n) — ef x2 / hops +4 /\n"
        "entrypoints x2 per decade beyond n=2000, bit-identical at every\n"
        "driver SF.  IVF at the gate's config (16 cells, nprobe=8)\n"
        "measured 0.760 at sf1 — above the bar with no rule change (the\n"
        "probe fraction is constant, so recall decays slowly; 64-cell /\n"
        "nprobe-32 measures 0.860 for deployments wanting margin).\n"
        "Round 13 also moved the AUTO LSH default onto the quarter-budget\n"
        "multiprobe point, so `a_lsh_knn_auto`/`a_lsh_auto_recall` now\n"
        "measure that configuration (T/4 stored tables, probes=4) and\n"
        "`a_lsh_multiprobe_recall` pins the same point explicitly.\n\n"
        "| query | sf0.1 s | sf1 s | wall x10 | shuf MB .1 | shuf MB 1 |"
        " shuf x10 |\n"
        "|---|---|---|---|---|---|---|\n"
        + "\n".join(lines)
        + "\n\nReading: AUTO's candidate-pair (and thus shuffle) growth per\n"
        "decade should track 10^(1+rho) = 10^1.515 ~ 32.7x — a measured\n"
        "shuf x10 near that value means the operating point sits ON its\n"
        "theoretical floor, not above it; the fixed gate configuration's\n"
        "n^2/2^p growth (~100x/decade) is why it is a recall-gate shape,\n"
        "never the production path.  Round-12 measured the FULL-TABLE\n"
        "point: AUTO shuffle 33.3x (floor 32.7x), fixed 129x, recall gate\n"
        "green (vs 0.628 under the old rho=0.3).  Round 13's AUTO rows\n"
        "measure the quarter-budget multiprobe form of the same point —\n"
        "identical probe-bucket budget (T/4 tables x 4 probes), so the\n"
        "candidate floor and its per-decade exponent are unchanged; what\n"
        "drops is the corpus-side bucketing/state volume (4x fewer stored\n"
        "tables), and the gate completing at sf1 certifies recall held\n"
        "through the move.\n"
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out) as f:
        txt = f.read()
    # replace ONLY this tool's section — up to the next heading, not end of
    # file (round 14: the greedy form deleted the cap-decade and alpha-A/B
    # sections appended after it)
    txt = re.sub(r"\n## sf1 extension.*?(?=\n## |\Z)", "", txt, flags=re.S)
    with open(out, "a" if not txt else "w") as f:
        f.write(txt + section)
    print("SCALING.md sf1 section updated", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
