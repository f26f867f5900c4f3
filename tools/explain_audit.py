"""Physical-plan audit: dump explain(formatted) for the declared queries and
flag scale anti-patterns (missing pushdown, global sorts, cartesian products
where a broadcast was intended, row-at-a-time Python evals).

Usage: python3 tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RED_FLAGS = {
    "BatchEvalPython": "row-at-a-time Python UDF in plan",
    "CartesianProduct": "non-broadcast cartesian product",
    "Exchange rangepartitioning": "global sort exchange (expect TakeOrdered instead)",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from lmdiskann_jl_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", master="local[8]", shuffle_partitions=8)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans_audit")
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        if name.startswith("a_"):  # driver-loop ops have no single plan
            continue
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            continue
        flags = [msg for pat, msg in RED_FLAGS.items() if pat.lower() in plan.lower()]
        n_exchanges = plan.count("Exchange")
        n_scans = plan.count("Scan parquet")
        codegen = plan.count("WholeStageCodegen")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        status = "FLAG" if flags else "ok  "
        print(f"{status} {name}: exchanges={n_exchanges} scans={n_scans} codegen={codegen}"
              + (f" | {'; '.join(flags)}" if flags else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
