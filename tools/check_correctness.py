"""Local replica of the driver's duckdb-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python3 tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    """The exact normalized lines the value hash is computed over —
    columns sorted by name, cells normalized, rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in norm_lines(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import pyspark

    import __spark_entry__ as entry
    from lmdiskann_jl_spark.session import get_spark

    print(f"# oracle replica: duckdb {duckdb.__version__} / pyspark {pyspark.__version__}")

    spark = get_spark(app_name="check-correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            # Rows-only gates still assert quality: any row carrying a falsy
            # `passed` column (the recall gates' contract) is a FAILURE here,
            # not a pass — mirrors _recall_row's raise-below-bar behavior so
            # a recall collapse can't hide behind "has rows".
            if "passed" in scols:
                pi = scols.index("passed")
                bad = [r for r in srows if not r[pi]]
                if bad:
                    print(
                        f"FAIL  {name}: {len(bad)} gate row(s) with "
                        f"passed=false [{time.time()-t0:.1f}s]"
                    )
                    failures.append(name)
                    continue
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        # Output-type guard: DuckDB sum(BIGINT) returns HUGEINT (int128),
        # which degrades to float64 under pandas fetch and decimal128 under
        # Arrow — either serializes differently from Spark's int64 in the
        # driver's value hash even when the VALUES are identical (the
        # r_above_avg_* three-round red).  fetchall() str()-normalizes
        # hugeints so this replica would pass silently; DESCRIBE catches the
        # declared output type without running the query twice.
        try:
            for drow in con.execute(f"DESCRIBE {oracles[name]}").fetchall():
                cname, ct = drow[0], str(drow[1]).upper()
                if "HUGEINT" in ct or ct.startswith("DECIMAL"):
                    problems.append(
                        f"oracle output type guard: {cname} is {ct} "
                        "(cast to BIGINT/DOUBLE in the oracle SQL)"
                    )
        except Exception:
            pass  # DESCRIBE unsupported for this statement shape; hash still runs
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} != {dh}")
                # postmortem probe: diff the NORMALIZED lines the hash is
                # actually computed over (sorted columns, normalized cells)
                # — a raw-row diff can look identical while a float-format
                # or type normalization difference flips the hash.  Column
                # order of the diff lines is sorted(cols).
                sset = set(norm_lines(scols, srows))
                dset = set(norm_lines(dcols, drows))
                sonly, donly = sorted(sset - dset), sorted(dset - sset)
                problems.append(
                    f"normalized-line diff: {len(sonly)} spark-only, "
                    f"{len(donly)} duck-only (cols={sorted(scols)})"
                )
                for x in sonly[:3]:
                    problems.append(f"  spark-only: {x.replace(chr(1), '|')[:200]}")
                for x in donly[:3]:
                    problems.append(f"  duck-only:  {x.replace(chr(1), '|')[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
