"""Curation-suite unit tests beyond the DuckDB oracles: the salted
stratified cap must (a) produce byte-identical output to the naive
single-window cap, and (b) physically split a hot domain across salt
partitions so no window task holds the whole domain."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window


def _skewed_docs(spark):
    """1 hot source (2000 docs) + 20 cold sources (10 docs each)."""
    hot = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("hot.example").alias("source")
    )
    cold = spark.range(2000, 2200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("cold"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    return hot.unionByName(cold)


def test_stratified_cap_parity_with_naive_window(spark):
    from ontoea_spark.functions.hashing import portable_hash64
    from ontoea_spark.pipeline.curation import stratified_cap

    docs = _skewed_docs(spark)
    cap = 25
    got = stratified_cap(docs, per_source=cap, n_salts=8)

    naive_w = Window.partitionBy("source").orderBy(
        portable_hash64(F.col("doc_id").cast("string")).asc(),
        F.col("doc_id").asc(),
    )
    want = (
        docs.withColumn("rn", F.row_number().over(naive_w).cast("long"))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "source", "rn")
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    # hot source is capped exactly; cold sources keep all 10 docs
    per_src = {r["source"]: r["n"] for r in
               got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src["hot.example"] == cap
    assert all(v == 10 for s, v in per_src.items() if s != "hot.example")


def test_stratified_cap_phase1_bounds_survivors(spark):
    """Phase 1 must leave <= cap * n_salts rows per source for the final
    source-level window — the bound that makes the phase-2 partition
    size independent of domain size."""
    from ontoea_spark.functions.hashing import portable_hash64
    from ontoea_spark.pipeline.curation import stratified_cap

    docs = _skewed_docs(spark)
    cap, n_salts = 25, 8
    # replicate phase 1 exactly as stratified_cap builds it
    salted = docs.select(
        "doc_id", "source",
        portable_hash64(F.col("doc_id").cast("string")).alias("_h"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)).alias("_salt"),
    )
    w1 = Window.partitionBy("source", "_salt").orderBy(
        F.col("_h").asc(), F.col("doc_id").asc()
    )
    survivors = (
        salted.withColumn("_rs", F.row_number().over(w1))
        .filter(F.col("_rs") <= cap)
        .groupBy("source").agg(F.count("*").alias("n"))
    )
    for r in survivors.collect():
        assert r["n"] <= cap * n_salts, (r["source"], r["n"])
    # the hot domain actually used >1 salt partition (i.e. it was split)
    n_hot_salts = (
        salted.filter(F.col("source") == "hot.example")
        .select("_salt").distinct().count()
    )
    assert n_hot_salts == n_salts
    # and phase 1 is not vacuous: it pruned the hot domain before phase 2
    hot_survivors = [r["n"] for r in survivors.collect()
                     if r["source"] == "hot.example"][0]
    assert hot_survivors == cap * n_salts < 2000
    # sanity: the public function still returns exactly `cap` hot rows
    assert (
        stratified_cap(docs, per_source=cap, n_salts=n_salts)
        .filter(F.col("source") == "hot.example").count() == cap
    )
