"""Alpha-RobustPrune A/B at the sf1 decade (round 14, judge item 5).

The sf1 beam measurement (round 13) showed the LEAN probe point
(ef=100, hops=6, eps=4) collapsing to 0.540 on the DEFAULT graph — a
pure top-maxdegree kNN prune (reference parity, degree 8) has no
long-range shortcuts, so frontiers stall and the gate now pays wider
probes per decade (beam_gate_params).  The STRUCTURAL alternative is
alpha-diversified RobustPrune (graph.alpha_prune_and_collect, DiskANN
Algorithm 2): dominated near-cluster neighbors collapse to few slots,
freeing degree budget for long edges that restore navigability.

This tool runs the A/B the decision needs: build the SAME sf1 corpus
(n=20,000, the seeded isotropic twin from tools/scaling_sf1.py) into
two on-disk indexes — default top-k prune vs create(alpha=1.2) — and
measure beam recall@10 at the LEAN point and at the scaled
beam_gate_params point on both, against a 20-query brute-force exact
baseline.  It also reports each graph's mean kept-edge distance: on
ISOTROPIC data concentration of measure can make the dominance rule
never fire (alpha degenerates to nearest-k — graph.py's round-11
geometry note), and identical edge statistics would say exactly that.

The decision rule (VERDICT r13 item 5): if alpha holds >= 0.70 at the
LEAN point, alpha becomes the documented default for scale builds; if
the graphs are measurably identical (isotropic degeneration), the
probe-width rule stays and alpha remains the documented knob for
clustered real-world corpora.  Either way the outcome is recorded in
SCALING.md.

Usage: python3 tools/alpha_ab_sf1.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AB_DIR = "/tmp/lmdiskann_alpha_ab"
N_QUERIES = 20
K = 10
BAR = 0.70
LEAN = ("lean (ef=100, hops=6, eps=4)", 100, 6, 4)
SCALED = ("scaled beam_gate_params(20k)", 200, 10, 8)


def _build(spark, path: str, emb, alpha: float | None):
    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.index import LMDiskANNIndex, load_index

    if os.path.exists(os.path.join(path, "idx", "_meta.json")):
        return load_index(spark, f"{path}/idx")
    t0 = time.time()
    idx = LMDiskANNIndex.create(
        spark, f"{path}/idx", dim=64, maxdegree=8, metric="euclidean",
        **({"alpha": alpha} if alpha is not None else {}),
    )
    batch = emb.select(
        F.col("embedding").alias("vec"),
        F.format_string("vec-%08d", F.col("vec_id")).alias("k"),
    )
    idx.insert_batch(batch, vec_col="vec", key_col="k")
    idx.build_beam_blocks(n_entrypoints=8)
    print(f"# built {path} (alpha={alpha}) in {time.time()-t0:.0f}s", file=sys.stderr)
    return idx


def main() -> int:
    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.operators.topk import batch_topk, recall_at_k
    from lmdiskann_jl_spark.session import get_spark
    from tools.scaling_sf1 import _ensure_sf1

    sf1 = _ensure_sf1()
    spark = get_spark(app_name="alpha-ab-sf1")
    emb = spark.read.parquet(f"{sf1}/embeddings.parquet")
    n = emb.count()
    qids = list(range(0, n, n // N_QUERIES))
    qdf = (
        emb.filter(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .persist()
    )
    qdf.count()
    exact = (
        batch_topk(qdf, emb, k=K, metric="euclidean",
                   vec_col="embedding", id_col="vec_id")
        .select("qid", F.col("vec_id").alias("id"))
        .persist()
    )
    exact.count()

    rows = []
    edge_stats = {}
    for name, alpha in (("topk (default)", None), ("alpha=1.2", 1.2)):
        idx = _build(spark, os.path.join(AB_DIR, name.split()[0].replace("=", "")), emb, alpha)
        # graph shape diagnostic: mean/max kept-edge distance — identical
        # stats across the two graphs == the dominance rule never fired
        adj = idx.adjacency.select("id", F.explode("neighbors").alias("nbr"))
        vec = idx.vectors
        from lmdiskann_jl_spark.functions.vector import resolve_metric

        dist = resolve_metric("euclidean")
        ed = (
            adj.join(vec.select(F.col("id").alias("nbr"), F.col("vec").alias("_nv")), "nbr")
            .join(vec, "id")
            .select(dist(F.col("vec"), F.col("_nv")).alias("d"))
            .agg(
                F.avg("d").alias("mean_d"),
                F.expr("percentile_approx(d, 0.99)").alias("p99_d"),
                F.count("*").alias("n_edges"),
            )
            .collect()[0]
        )
        edge_stats[name] = ed
        for pname, ef, hops, eps in (LEAN, SCALED):
            t0 = time.time()
            approx = idx.search_batch(
                qdf, topk=K, mode="beam", ef=ef, n_entrypoints=eps, max_hops=hops
            ).select(
                "qid",
                F.regexp_extract("key", r"vec-(\d+)", 1).cast("long").alias("id"),
            )
            r = recall_at_k(approx, exact, k=K)
            wall = time.time() - t0
            line = f"| {name} | {pname} | {r:.3f} | {wall:.1f} |"
            rows.append(line)
            print(line, file=sys.stderr)

    for name, ed in edge_stats.items():
        print(
            f"# {name}: edges={ed['n_edges']} mean_d={ed['mean_d']:.4f} "
            f"p99_d={ed['p99_d']:.4f}",
            file=sys.stderr,
        )

    t_mean = float(edge_stats["topk (default)"]["mean_d"])
    a_mean = float(edge_stats["alpha=1.2"]["mean_d"])
    diverged = abs(a_mean - t_mean) / t_mean > 0.01
    section = (
        "\n## alpha-RobustPrune A/B at sf1 (round 14)\n\n"
        "Round 13's sf1 decade showed the LEAN beam probe (ef=100, hops=6,\n"
        "eps=4) collapsing to 0.540 on the default top-k graph, and the fix\n"
        "widened probes per decade (beam_gate_params) at growing probe\n"
        "cost.  The structural alternative — alpha-diversified RobustPrune\n"
        "(create_index(alpha=1.2), graph.alpha_prune_and_collect) — was\n"
        "measured head-to-head on the same corpus, same probe points, same\n"
        "20-query exact baseline (tools/alpha_ab_sf1.py):\n\n"
        "| graph | probe point | recall@10 | wall s |\n"
        "|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n\nEdge-shape diagnostic (does alpha change the graph at all on\n"
        "this corpus?):\n\n"
        "| graph | edges | mean edge dist | p99 edge dist |\n"
        "|---|---|---|---|\n"
        + "\n".join(
            f"| {name} | {ed['n_edges']} | {float(ed['mean_d']):.4f} |"
            f" {float(ed['p99_d']):.4f} |"
            for name, ed in edge_stats.items()
        )
        + (
            "\n\nThe graphs DIVERGED: alpha's dominance rule fired and"
            " reallocated degree budget toward longer edges.\n"
            if diverged
            else "\n\nThe graphs are statistically IDENTICAL (<1% mean-edge"
            "-distance delta): on this verified-isotropic 64-dim corpus,\n"
            "concentration of measure keeps d(kept, c) ~ d(node, c) for\n"
            "every candidate pair, the dominance test never fires, and\n"
            "alpha degenerates to nearest-k — exactly graph.py's round-11\n"
            "geometry note, now confirmed at the sf1 decade.  DECISION:\n"
            "the measured probe-width rule (beam_gate_params) remains the\n"
            "default scale path on worst-case isotropic data; alpha=1.2\n"
            "stays the documented build knob for clustered real-world\n"
            "embedding corpora (low intrinsic dimension), where the\n"
            "DiskANN paper's long-range edges exist to be kept.\n"
        )
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out) as f:
        txt = f.read()
    txt = re.sub(r"\n## alpha-RobustPrune A/B.*?(?=\n## |\Z)", "", txt, flags=re.S)
    with open(out, "w") as f:
        f.write(txt + section)
    print("SCALING.md alpha A/B section updated", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
