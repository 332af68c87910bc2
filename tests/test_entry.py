"""Smoke tests for the driver contract: entry() + pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_entry_returns_edges(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert [f.name for f in df.schema.fields] == ["s_id", "p_id", "o_id", "kg"]


def test_extraction_byte_identical(spark):
    """BASELINE.json:15 invariant: extracted text == gold text per url."""
    from ontoea_spark.pipeline.extract import extract_pages_text
    from ontoea_spark.pipeline.pages import synthesize_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = synthesize_pages(docs).cache()
    extracted = extract_pages_text(pages).select("url", "text")
    gold = pages.select("url", F.col("text").alias("gold_text"))
    j = extracted.join(gold, "url")
    n_total = j.count()
    n_match = j.filter(F.col("text") == F.col("gold_text")).count()
    assert n_total == docs.count()
    assert n_match == n_total, f"{n_total - n_match} urls differ"
    pages.unpersist()


def test_extraction_jvm_udf_parity(spark):
    """The default JVM-expression extractor and the Arrow-UDF seam
    (``use_udf=True``) are byte-identical per url — the invariant that
    lets the pipeline run the built-in path (guide §4.1) while keeping
    the UDF signature for real-crawl extractors; also covers link-laden
    pages (with_links=True), where the non-greedy match must stop at
    the FIRST </p>."""
    from ontoea_spark.pipeline.extract import extract_pages_text
    from ontoea_spark.pipeline.pages import synthesize_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for with_links in (False, True):
        pages = synthesize_pages(docs, with_links=with_links).cache()
        jvm = extract_pages_text(pages).select("url", "text")
        udf = extract_pages_text(pages, use_udf=True).select(
            "url", F.col("text").alias("udf_text")
        )
        j = jvm.join(udf, "url")
        n_total = j.count()
        n_match = j.filter(F.col("text") == F.col("udf_text")).count()
        assert n_match == n_total == docs.count(), (
            f"with_links={with_links}: {n_total - n_match} urls differ"
        )
        pages.unpersist()


def test_queries_have_oracles_or_docstring(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25


def test_driver_window_contract(spark):
    """Rotation guard: the driver checks exactly the first 50 queries()
    entries against oracles — every one of them must HAVE an oracle
    (a no-oracle query inside the window burns a checked slot), and the
    no-oracle queries must sit at the very end."""
    import __spark_entry__ as entrymod

    q = list(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert len(q) >= 50
    missing = [n for n in q[:50] if n not in o]
    assert missing == [], f"no-oracle queries inside the window: {missing}"
    no_oracle = [n for n in q if n not in o]
    assert q[-len(no_oracle):] == no_oracle, (
        "no-oracle queries must be last", no_oracle)
