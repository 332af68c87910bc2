#!/usr/bin/env python
"""Headline benchmark — run the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end KG-construction throughput
(triples/sec over the pages->extract->dedup->encode->edges pipeline,
BASELINE.json:2), reported alongside per-query wall seconds.

Set ``SPARK_BENCH_SCALING=1`` to also run the pipeline at local[2] vs
local[8] (same input — see scaling_run's docstring for why not 8 vs 32)
and report throughput at both plus scaling efficiency — the sandbox
proxy for the N vs 4N executor criterion.
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


def scaling_job(spark, sf_dir: str, replicate: int = 50) -> tuple[float, int]:
    """Compute-dominated scaling workload: replicate the corpus
    ``replicate``x (deterministic doc_id remap), then run the extraction
    stage end-to-end — html synthesis -> Arrow-UDF text extraction ->
    mention detection -> exact dedup (hash shuffle) -> count.

    This is the stage that dominates at 100 TB (per-page CPU + one
    shuffle); it has no global-window serialization, so throughput should
    track cores. Returns (seconds, distinct_mentions_processed) where the
    numerator for throughput is the *pre-dedup* mention count (work done),
    captured via the same job.
    """
    import time as _t

    from pyspark.sql import functions as F

    from ontoea_spark.pipeline.extract import extract_mentions, extract_pages_text
    from ontoea_spark.pipeline.pages import synthesize_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    # repartition the SMALL side first so replication happens inside 128
    # parallel tasks (replicating after a single-file scan would funnel
    # the whole expanded corpus through one shuffle-map task)
    big = docs.repartition(128).crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    t0 = _t.perf_counter()
    pages = synthesize_pages(big)
    mentions = extract_mentions(
        extract_pages_text(pages).select("url", "lang", "text")
    )
    n = mentions.count()
    # exact-dedup shuffle included in the measured span
    mentions.select("s", "p", "o").dropDuplicates().count()
    return _t.perf_counter() - t0, n


def run_pipeline_once(spark, sf_dir: str) -> tuple[float, int]:
    """Full KG-construction DAG; returns (seconds, n_edges)."""
    from ontoea_spark.pipeline.kg_build import build_kg
    from ontoea_spark.pipeline.pages import synthesize_pages

    t0 = time.perf_counter()
    pages = synthesize_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    result = build_kg(pages)
    n_edges = result.edges.count()
    return time.perf_counter() - t0, n_edges


def bench_queries(spark, sf_dir: str, runs: int = 3) -> tuple[dict[str, float], dict[str, dict]]:
    """Per-query wall seconds for a representative headline subset.

    Each query runs ``runs`` times in the same session; we report the
    MEDIAN (this box's turbo/thermal variance is 2-3x run-to-run, so a
    single sample routinely reads as a fake regression) plus the
    {min, max} spread. The first run pays plan compilation and fixture
    materialization; the median reflects warmed execution, which is the
    number that projects to a long-running cluster job.

    Exception: queries whose core work IS a memoized fixture derivation
    (extract_triples) get the fixture memo cleared before EVERY timed
    sample — otherwise runs 2-3 time a localCheckpoint read, not the
    operator. The downstream queries intentionally keep the fixture
    warm: their operator starts where the fixture ends.
    """
    import __spark_entry__ as entrymod

    from ontoea_spark import driver_queries as DQ

    cold_fixture = {"extract_triples": "triples_"}
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
        "dedup_clusters",
        "doc_fingerprint",
        "pii_scrub",
        "repetition",
        "contamination",
        "ann_topk",
        "csls_top1",
        "hits_metrics",
        "para_dedup",
        "curation_pipeline",
    ]
    out: dict[str, float] = {}
    spread: dict[str, dict] = {}
    for name in headline:
        fn = qs.get(name)
        if fn is None:
            continue
        samples: list[float] = []
        for _ in range(runs):
            if name in cold_fixture:
                DQ.reset_memo(cold_fixture[name])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = round(samples[len(samples) // 2], 3)
        spread[name] = {
            "min": round(samples[0], 3),
            "max": round(samples[-1], 3),
            "runs": runs,
        }
    return out, spread


def single_run() -> dict:
    import __spark_entry__ as entrymod

    from ontoea_spark.session import get_spark

    spark = get_spark("bench")
    # ship the package zip so executor Python workers can unpickle
    # pandas-UDF closures even when bench.py is launched from another cwd
    entrymod._ensure_shipped(spark)
    pipe_s, n_edges = run_pipeline_once(spark, SF_DIR)
    queries, spread = bench_queries(spark, SF_DIR)
    # scale-meaningful throughput: the corpus at this sf is tiny (fixed
    # job overhead dominates the end-to-end pipeline wall), so also
    # measure the extraction stage on a replicated corpus — the number
    # that projects to 100 TB (see BASELINE.md scaling section)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # replicate=80 so >=10^6 triples flow through the measured span
    # (throughput over a corpus big enough that fixed overhead is noise)
    rep = 80
    scale_s, n_mentions = scaling_job(spark, SF_DIR, replicate=rep)
    total = round(pipe_s + sum(queries.values()), 3)
    result = {
        "metric": "kg_pipeline_plus_headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": {"kg_pipeline": round(pipe_s, 3), **queries},
        # per-query {min, max, runs} around the median reported above
        "queries_spread": spread,
        "sf": _sf_from_dir(SF_DIR),
        "kg_edges": n_edges,
        # Headline throughput: (s,p,o) triples EMITTED (pre-dedup) through
        # the replicated-corpus extract->dedup stage. One mention = one
        # emitted triple, so this is a single metric with one name.
        # (r1/r2 reported the same value under both "triples_per_sec" and
        # "extraction_mentions_per_sec" — collapsed here; compare
        # emitted_triples_per_sec against either historical key.)
        "emitted_triples_per_sec": round(n_mentions / scale_s, 1),
        "triples_emitted": n_mentions,
        # distinct edges materialized by the sf-scale pipeline per second
        # of end-to-end pipeline wall (small corpus: overhead-dominated)
        "pipeline_distinct_edges_per_sec": round(n_edges / pipe_s, 1),
        "extraction_pages_per_sec": round(n_docs * rep / scale_s, 1),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    spark.stop()
    return result


def scaling_run() -> dict:
    """Extraction-stage throughput at local[2] vs local[8] on the same
    replicated input — the sandbox proxy for N vs 4N executors.

    Why 2 vs 8 and not 8 vs 32: this box's CPU raises clocks when few
    cores are active (turbo), so 8->32 measures clock scaling as much as
    software scaling (a pure-JVM md5 map-agg with zero shuffle tops out
    at ~2.9x for 4x cores here). 2->8 keeps both points in the same
    clock regime — the honest software-scaling measurement; a real
    multi-executor cluster adds nodes, not SMT/turbo contention.
    """
    import subprocess

    out: dict[str, dict] = {}
    for cores in ("2", "8"):
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
    tput_n = out["2"]["mentions_per_sec"]
    tput_4n = out["8"]["mentions_per_sec"]
    # efficiency of scaling cores N -> 4N: speedup / 4
    eff = (tput_4n / tput_n) / 4.0
    return {
        "cores_n": 2,
        "cores_4n": 8,
        "throughput_n": tput_n,
        "throughput_4n": tput_4n,
        "speedup_n_to_4n": round(tput_4n / tput_n, 3),
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    if os.environ.get("SPARK_BENCH_PIPELINE_ONLY"):
        import __spark_entry__ as entrymod

        from ontoea_spark.session import get_spark

        spark = get_spark("bench-scaling")
        entrymod._ensure_shipped(spark)
        scaling_job(spark, SF_DIR, replicate=20)  # warm JVM + python workers
        secs, n_mentions = scaling_job(spark, SF_DIR)
        print(
            json.dumps(
                {
                    "metric": "extraction_scaling_wall",
                    "value": round(secs, 3),
                    "unit": "sec",
                    "queries": {"extraction_replicated": round(secs, 3)},
                    "sf": _sf_from_dir(SF_DIR),
                    "mentions_per_sec": round(n_mentions / secs, 1),
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
