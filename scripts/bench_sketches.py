"""Measured sketch accuracy + cost vs exact at a real SF (BASELINE.md).

Runs on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):
  - KMV distinct per event_type (k=64, 256) vs exact COUNT(DISTINCT):
    relative error per key + wall for sketch vs exact.
  - global KMV over event user_ids.
  - CMS point estimates (d=4, w=1024) vs exact counts: mean/max
    overestimate ratio.
  - AMS F2 per event_type (d=8, 16) vs exact sum f(v)^2.

All numbers are deterministic (fixed hash family) — the run documents
the accuracy of THIS engine's sketches at this SF, not a random draw.

Usage: python scripts/bench_sketches.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ontoea_spark.operators import sketches as SK  # noqa: E402
from ontoea_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")


def main() -> None:
    spark = get_spark(
        app_name="bench-sketches", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").localCheckpoint(True)
    n = ev.count()
    out: dict = {"sf_dir": SF_DIR, "rows": n, "cpus": CPUS}

    t0 = time.perf_counter()
    exact = {
        r.event_type: r.nd
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    t_exact = time.perf_counter() - t0

    for k in (64, 256):
        t0 = time.perf_counter()
        est = {
            r.event_type: r.est_distinct
            for r in SK.kmv_estimate(
                SK.kmv_sketch(ev, ["event_type"], "user_id", k=k), k=k
            ).collect()
        }
        wall = time.perf_counter() - t0
        rel = {
            t: round(abs(est[t] / exact[t] - 1.0), 4) for t in sorted(exact)
        }
        out[f"kmv_k{k}"] = {
            "wall_s": round(wall, 2),
            "exact_wall_s": round(t_exact, 2),
            "rel_err": rel,
            "max_rel_err": max(rel.values()),
        }

    g = SK.kmv_estimate(
        SK.kmv_sketch_global(ev, "user_id", k=256), k=256
    ).collect()[0]
    exact_g = ev.select("user_id").distinct().count()
    out["kmv_global_k256"] = {
        "est": g.est_distinct,
        "exact": exact_g,
        "rel_err": round(abs(g.est_distinct / exact_g - 1.0), 4),
    }

    # CMS: per-user event counts (d=4, w=1024)
    cms = SK.cms_sketch(ev, "user_id", d=4, w=1024)
    est_df = SK.cms_estimate(
        cms, ev.select("user_id").distinct(), "user_id", d=4, w=1024
    )
    exact_df = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    j = est_df.join(exact_df, "user_id").select(
        (F.col("est_count") / F.col("c")).alias("ratio")
    )
    r = j.agg(
        F.round(F.avg("ratio"), 4).alias("mean"),
        F.round(F.max("ratio"), 4).alias("max"),
        F.round(F.min("ratio"), 4).alias("min"),
    ).collect()[0]
    out["cms_d4_w1024_ratio"] = {"mean": r.mean, "max": r.max, "min": r.min}

    # AMS F2 per event_type over user_id
    f2_exact = {
        r.event_type: r.f2
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .groupBy("event_type")
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
        .collect()
    }
    for d in (8, 16):
        f2_est = {
            r.event_type: r.f2_est
            for r in SK.ams_f2_estimate(
                SK.ams_f2_sketch(ev, ["event_type"], "user_id", d=d)
            ).collect()
        }
        rel = {
            t: round(abs(f2_est[t] / f2_exact[t] - 1.0), 4)
            for t in sorted(f2_exact)
        }
        out[f"ams_d{d}"] = {"rel_err": rel, "max_rel_err": max(rel.values())}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
