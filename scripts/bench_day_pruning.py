#!/usr/bin/env python
"""Measured day-partition pruning on the canonical consumer workload
(VERDICT r5 next #7): the write_day_partitioned layout already had a
PLAN test (PartitionFilters, tests/test_tables.py) — this script makes
the pruning show up in a measured query: the canonical_two_hop shape
(self-join on o=s + groupBy over predicate pairs) over a 2-day range of
a D-day provenance history, against the same query over the full scan,
with the executed scan's own numFiles metric as the pruning evidence.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_day_pruning.py [days] [rows_per_day]
Prints one JSON line; numbers recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DAY = 86400
EPOCH0 = 1704067200  # 2024-01-01


def _num_files(df) -> int:
    """Sum of the executed scans' numFiles metrics (inputFiles() ignores
    pushed partition filters — verify skill gotcha)."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.length()):
        m = leaves.apply(i).metrics()
        if m.contains("numFiles"):
            total += m.apply("numFiles").value()
    return total


def _timed(fn, runs: int = 3) -> float:
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    import __spark_entry__ as entrymod
    from ontoea_spark.session import get_spark
    from ontoea_spark.sources.tables import read_day_range, write_day_partitioned

    spark = get_spark("bench-day-pruning")
    entrymod._ensure_shipped(spark)
    out = tempfile.mkdtemp(prefix="day_pruning_")
    try:
        n = days * rows_per_day
        # synthetic canonical provenance rows spread uniformly over the
        # day range; entity space sized so the two-hop join has real fan
        prov = spark.range(n).select(
            F.concat(F.lit("e"), F.pmod(F.col("id") * 7919, F.lit(n // 8)).cast("string")).alias("s"),
            F.concat(F.lit("p"), F.pmod(F.col("id"), 50).cast("string")).alias("p"),
            F.concat(F.lit("e"), F.pmod(F.col("id") * 104729 + 13, F.lit(n // 8)).cast("string")).alias("o"),
            (F.lit(EPOCH0) + (F.col("id") % days) * DAY + F.pmod(F.col("id"), DAY)).alias("first_ts"),
        )
        t0 = time.perf_counter()
        write_day_partitioned(prov, out, ts_col="first_ts")
        write_s = time.perf_counter() - t0

        def two_hop(df):
            e1 = df.select(F.col("p").alias("p1"), F.col("o").alias("mid"))
            e2 = df.select(F.col("s").alias("mid"), F.col("p").alias("p2"))
            return (
                e1.join(e2, "mid")
                .groupBy("p1", "p2")
                .agg(F.count("*").alias("n_paths"))
            )

        lo = EPOCH0 + (days - 2) * DAY
        hi = EPOCH0 + days * DAY - 1
        ranged = two_hop(read_day_range(spark, out, lo, hi))
        full = two_hop(spark.read.parquet(out))

        ranged_wall = _timed(
            lambda: ranged.write.format("noop").mode("overwrite").save()
        )
        full_wall = _timed(
            lambda: full.write.format("noop").mode("overwrite").save()
        )
        # metrics live on the executed queryExecution: collect() runs
        # through the DataFrame's OWN execution (a write.noop spawns a
        # fresh one whose metrics this handle can't see). AQE is turned
        # off for the probe only — AdaptiveSparkPlan's collectLeaves
        # stops at query-stage boundaries and never reaches the scans.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            r2 = two_hop(read_day_range(spark, out, lo, hi))
            f2 = two_hop(spark.read.parquet(out))
            r2.collect()
            nf_ranged = _num_files(r2)
            f2.collect()
            nf_full = _num_files(f2)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            json.dumps(
                {
                    "metric": "canonical_two_hop_day_pruning",
                    "days": days,
                    "rows": n,
                    "write_s": round(write_s, 1),
                    "two_hop_2day_s": round(ranged_wall, 2),
                    "two_hop_full_s": round(full_wall, 2),
                    "speedup": round(full_wall / ranged_wall, 2),
                    "num_files_2day": nf_ranged,
                    "num_files_full": nf_full,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
