"""Table-format dispatch: Iceberg when a catalog is configured, parquet
otherwise (BASELINE.json north rule: the production input is an Iceberg
table of Common-Crawl-style pages; this sandbox has no Iceberg runtime
jar, so the parquet path is what tests exercise — the dispatch itself is
unit-tested either way).

The switch point is deliberately tiny: readers/writers everywhere else
take DataFrames, so swapping the storage format touches only this
module. To run against Iceberg, submit with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.cc.type=hive ...

and pass table identifiers like ``cc.db.pages`` instead of paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def detect_format(conf_items: dict[str, str]) -> str:
    """'iceberg' iff any spark.sql.catalog.<name> entry is an Iceberg
    SparkCatalog, else 'parquet'. Pure — unit-testable without a session."""
    for k, v in conf_items.items():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and (
            v == ICEBERG_CATALOG_CLASS
        ):
            return "iceberg"
    return "parquet"


def table_format(spark: SparkSession) -> str:
    return detect_format(dict(spark.sparkContext.getConf().getAll()))


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the web-pages input table (url, warc_ts, html, text, lang).

    ``source`` is a path for parquet, a catalog table identifier
    (``catalog.db.table``) for Iceberg. Column pruning and partition
    pruning push down identically through either DSv2 source.
    """
    fmt = table_format(spark)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...] = ("s_id",),
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed+sorted table so downstream equi-joins and
    aggregations on the bucket key are CO-LOCATED — Spark reads matching
    buckets pairwise and skips the shuffle entirely (verified by the
    no-Exchange plan assertion in tests/test_tables.py). This is the
    layout for the big edge/adjacency tables that every alignment round
    re-joins on entity id: pay one clustered write, skip a shuffle per
    downstream join. (Iceberg's analogue is a bucket partition transform;
    the parquet path uses the Spark bucketing catalog protocol, which
    requires saveAsTable.)"""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def write_day_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "first_ts",
    mode: str = "overwrite",
) -> None:
    """Write a table partitioned by crawl DAY (``ts DIV 86400`` as an
    integer day number) — the layout for time-keyed crawl artifacts
    (provenance, snapshots) whose standing queries are time-ranged: a
    day-range predicate prunes whole partition directories at planning
    time instead of scanning the full history (PartitionFilters — plan-
    asserted in tests/test_tables.py). The epoch-day integer, not a
    formatted date string, keeps the partition value session-TZ-proof.
    Iceberg's analogue is the hidden ``days(ts)`` partition transform."""
    from pyspark.sql import functions as F

    (
        # floor, not int-cast truncation: read_day_range's Python //
        # floors, and trunc-vs-floor disagree for pre-epoch (negative)
        # timestamps — a corrupt/sentinel WARC ts would land in a bucket
        # the read then prunes
        df.withColumn(
            "day_bucket", F.floor(F.col(ts_col) / 86400).cast("int")
        )
        .write.mode(mode)
        .partitionBy("day_bucket")
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, start_ts: int, end_ts: int, ts_col: str = "first_ts"
) -> DataFrame:
    """Read a day-partitioned table restricted to ``[start_ts, end_ts]``:
    the derived day-bucket bounds prune partition directories (coarse,
    planning-time), the raw timestamp predicate trims the boundary days
    (exact, pushed to the row-group scan)."""
    from pyspark.sql import functions as F

    lo, hi = start_ts // 86400, end_ts // 86400
    return (
        spark.read.parquet(path)
        .filter(F.col("day_bucket").between(lo, hi))
        .filter(F.col(ts_col).between(start_ts, end_ts))
    )


def write_edges(
    df: DataFrame,
    target: str,
    partition_cols: tuple[str, ...] = ("kg",),
    mode: str = "overwrite",
) -> str:
    """Write the materialized edge table partitioned by ``partition_cols``
    — Iceberg table when the catalog is configured (hidden partitioning
    via partitionedBy on first create is handled by the DDL owner; here
    we append/overwrite into the existing layout), parquet dir otherwise.
    """
    fmt = table_format(df.sparkSession)
    w = df.write.mode(mode)
    if fmt == "iceberg":
        w.format("iceberg").saveAsTable(target)
    else:
        w.partitionBy(*partition_cols).parquet(target)
    return fmt
