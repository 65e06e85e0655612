"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given sf dir, compare row count, column names, and order-insensitive
values (floats to 1e-9 after the queries' own rounding).

Usage: python tools/check_entry.py [--receipt] [sf_dir] [query ...]

``--receipt`` additionally writes ``CHECK_ALL.json`` at the repo root —
the per-round proof that the FULL registry (not just the driver's
~50-query sample) was run green before shipping.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    receipt = "--receipt" in args
    if receipt:
        args.remove("--receipt")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from elasticsearch_spark.session import get_spark

    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name:26s} spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?   {name:26s} rows={len(srows)} (no oracle, rows-only) {time.time()-t0:.1f}s")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name:26s} duckdb error: {str(e)[:200]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name:26s} {'; '.join(problems)[:300]}")
        else:
            print(f"PASS  {name:26s} rows={len(srows)} {time.time()-t0:.1f}s")

    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if receipt:
        import json
        import datetime

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CHECK_ALL.json",
        )
        with open(path, "w") as f:
            json.dump(
                {
                    "when_utc": datetime.datetime.now(
                        datetime.timezone.utc
                    ).isoformat(timespec="seconds"),
                    "sf_dir": os.path.abspath(sf_dir),
                    "n_registered": len(qs),
                    "n_run": n_run,
                    "n_passed": n_run - len(failures),
                    "failures": [
                        {"query": n, "problem": p} for n, p in failures
                    ],
                },
                f,
                indent=2,
            )
        print(f"receipt -> {path}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
