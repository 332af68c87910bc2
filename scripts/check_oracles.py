#!/usr/bin/env python
"""Run the driver-style Spark-vs-DuckDB oracle comparison for a subset
of queries (all, if none named) at a given sf dir — the fast local loop
for verifying an optimization kept a query's results identical.

Usage: python scripts/check_oracles.py [--sf DIR] [query ...]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    import __spark_entry__ as entrymod
    from oracle_harness import compare_query
    from ontoea_spark.session import get_spark

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    names = args or [n for n in qs if n in sqls]
    spark = get_spark("check-oracles")
    entrymod._ensure_shipped(spark)
    failed = []
    for name in names:
        if name not in sqls:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.perf_counter()
        try:
            compare_query(spark, sf_dir, qs[name], sqls[name])
            print(f"{name}: OK ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL ({time.perf_counter() - t0:.1f}s) {e}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
