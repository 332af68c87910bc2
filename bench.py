#!/usr/bin/env python
"""Headline benchmark — run the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end KG-construction throughput
(triples/sec over the pages->extract->dedup->encode->edges pipeline,
BASELINE.json:2), reported alongside per-query wall seconds.

Set ``SPARK_BENCH_SCALING=1`` to also run the pipeline at local[8] vs
local[32] (same input) and report throughput at both plus scaling
efficiency — the sandbox proxy for the N vs 4N executor criterion.
That mode re-executes this script in subprocesses (a Spark local master
cannot change core count in-process).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_pipeline_once(spark, sf_dir: str) -> tuple[float, int]:
    """Full KG-construction DAG; returns (seconds, n_edges)."""
    from ontoea_spark.pipeline.kg_build import build_kg
    from ontoea_spark.pipeline.pages import synthesize_pages

    t0 = time.perf_counter()
    pages = synthesize_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    result = build_kg(pages)
    n_edges = result.edges.count()
    return time.perf_counter() - t0, n_edges


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Per-query wall seconds for a representative headline subset."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = [
        "extract_triples",
        "dict_encode_triples",
        "links_fixpoint",
        "q1_pricing",
        "q3_top_revenue",
        "topk_orders_per_customer",
        "events_sessionize",
        "dedup_minhash",
        "dedup_simhash",
        "doc_fingerprint",
        "ann_topk",
        "csls_top1",
        "hits_metrics",
    ]
    out: dict[str, float] = {}
    for name in headline:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def single_run() -> dict:
    from ontoea_spark.session import get_spark

    spark = get_spark("bench")
    pipe_s, n_edges = run_pipeline_once(spark, SF_DIR)
    queries = bench_queries(spark, SF_DIR)
    total = round(pipe_s + sum(queries.values()), 3)
    result = {
        "metric": "kg_pipeline_plus_headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": {"kg_pipeline": round(pipe_s, 3), **queries},
        "sf": _sf_from_dir(SF_DIR),
        "kg_edges": n_edges,
        "triples_per_sec": round(n_edges / pipe_s, 1),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    spark.stop()
    return result


def scaling_run() -> dict:
    """Pipeline-only throughput at local[8] vs local[32] (subprocesses)."""
    import subprocess

    out: dict[str, dict] = {}
    for cores in ("8", "32"):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = cores
        env["SPARK_BENCH_PIPELINE_ONLY"] = "1"
        env.pop("SPARK_BENCH_SCALING", None)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    tput8 = out["8"]["triples_per_sec"]
    tput32 = out["32"]["triples_per_sec"]
    # efficiency of scaling cores 8 -> 32 (4x): speedup / 4
    eff = (tput32 / tput8) / 4.0
    return {
        "throughput_8": tput8,
        "throughput_32": tput32,
        "speedup_8_to_32": round(tput32 / tput8, 3),
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    if os.environ.get("SPARK_BENCH_PIPELINE_ONLY"):
        from ontoea_spark.session import get_spark

        spark = get_spark("bench-pipeline")
        pipe_s, n_edges = run_pipeline_once(spark, SF_DIR)
        print(
            json.dumps(
                {
                    "metric": "kg_pipeline_wall",
                    "value": round(pipe_s, 3),
                    "unit": "sec",
                    "queries": {"kg_pipeline": round(pipe_s, 3)},
                    "sf": _sf_from_dir(SF_DIR),
                    "triples_per_sec": round(n_edges / pipe_s, 1),
                }
            )
        )
        spark.stop()
        return

    result = single_run()
    if os.environ.get("SPARK_BENCH_SCALING"):
        result["scaling"] = scaling_run()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
