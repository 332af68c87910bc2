"""Dispatch-logic test for the Iceberg/parquet switch point
(VERDICT r01 'What's missing' #6 / next-round item 10)."""

from __future__ import annotations

import os

from ontoea_spark.sources.tables import ICEBERG_CATALOG_CLASS, detect_format, read_pages, write_edges


def test_detect_format_parquet_default():
    assert detect_format({}) == "parquet"
    assert detect_format({"spark.sql.shuffle.partitions": "32"}) == "parquet"
    # non-Iceberg catalog impl does not flip the switch
    assert (
        detect_format({"spark.sql.catalog.x": "com.example.OtherCatalog"})
        == "parquet"
    )
    # deeper catalog sub-keys (catalog options) are not catalog decls
    assert (
        detect_format({"spark.sql.catalog.cc.type": ICEBERG_CATALOG_CLASS})
        == "parquet"
    )


def test_detect_format_iceberg():
    assert (
        detect_format({"spark.sql.catalog.cc": ICEBERG_CATALOG_CLASS})
        == "iceberg"
    )


def test_read_write_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "b", 1, "kg1"), ("c", "d", 2, "kg2")], "s string, o string, s_id long, kg string"
    )
    out = str(tmp_path / "edges")
    fmt = write_edges(df, out)
    assert fmt == "parquet"
    assert sorted(os.listdir(out))  # kg= partition dirs + _SUCCESS
    assert any(p.startswith("kg=") for p in os.listdir(out))
    back = read_pages(spark, out)
    assert back.count() == 2


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join
    with ZERO Exchange operators — the co-located layout the edge tables
    ship with (pay one clustered write, skip a shuffle per join)."""
    from pyspark.sql import functions as F

    from ontoea_spark.sources.tables import write_bucketed

    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("s_id"), F.col("id").alias("o_id")
    )
    deg = spark.range(97).select(
        F.col("id").alias("s_id"), (F.col("id") * 2).alias("deg")
    )
    write_bucketed(edges, "edges_b", str(tmp_path / "edges_b"), n_buckets=8)
    write_bucketed(deg, "deg_b", str(tmp_path / "deg_b"), n_buckets=8)
    try:
        # force a non-broadcast join so bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("edges_b").join(spark.table("deg_b"), "s_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert joined.count() == 2000
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_b")
        spark.sql("DROP TABLE IF EXISTS deg_b")


def test_day_partition_pruning(spark, tmp_path):
    """A day-range read over the day-partitioned layout must prune whole
    partition directories at planning time (PartitionFilters on
    day_bucket, fewer input files) and still return exactly the rows in
    the timestamp range — the crawl-history layout where a one-week query
    never touches the other years."""
    from pyspark.sql import functions as F

    from ontoea_spark.sources.tables import read_day_range, write_day_partitioned

    base = 1704067200  # 2024-01-01 UTC, the pages fixture epoch
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.lit(base) + F.col("id") * 3600).alias("first_ts"),  # ~42 days
    )
    out = str(tmp_path / "prov_days")
    write_day_partitioned(df, out, ts_col="first_ts")

    start, end = base + 5 * 86400, base + 7 * 86400 - 1  # days 5..6
    got = read_day_range(spark, out, start, end, ts_col="first_ts")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    assert "day_bucket" in plan[plan.index("PartitionFilters") :][:300], plan

    def files_read(df):
        # the scan's own post-execution metric (inputFiles() ignores
        # pushed partition filters, so it can't evidence pruning)
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        return leaves.apply(0).metrics().apply("numFiles").value()

    full = files_read(spark.read.parquet(out))
    pruned = files_read(read_day_range(spark, out, start, end, ts_col="first_ts"))
    assert pruned < full, (pruned, full)
    assert pruned <= 2 * (full // 42 + 1), (pruned, full)  # ~2 of ~43 days

    rows = got.collect()
    assert len(rows) == 48  # 2 days x 24 hourly rows
    assert all(start <= r.first_ts <= end for r in rows)


def test_day_partition_negative_timestamps_floor(spark, tmp_path):
    """Pre-epoch (negative) timestamps: the write-side bucket must FLOOR
    like the read side's // — trunc-toward-zero would file ts=-3600
    under bucket 0 and the day-range read would prune it away."""
    from ontoea_spark.sources.tables import read_day_range, write_day_partitioned

    df = spark.createDataFrame(
        [(1, -3600), (2, 3600)], "doc_id long, first_ts long"
    )
    out = str(tmp_path / "prov_neg")
    write_day_partitioned(df, out, ts_col="first_ts")
    got = read_day_range(spark, out, -86400, -1, ts_col="first_ts").collect()
    assert [r.doc_id for r in got] == [1]
