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
