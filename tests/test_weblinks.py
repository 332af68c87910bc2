"""Web link-graph semantics (pipeline/weblinks.py) + the page-synthesis
invariant the family depends on: the anchor block must be invisible to
the text-extraction path."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _pages(spark, with_links):
    from ontoea_spark.pipeline.pages import synthesize_pages

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return synthesize_pages(docs, with_links=with_links)


def test_links_block_invisible_to_extraction(spark):
    """with_links must not perturb the byte-exact extraction invariant:
    the extractor takes the first non-greedy <p>…</p>, and anchors sit
    after it."""
    from ontoea_spark.pipeline.extract import extract_text_udf

    pages = _pages(spark, with_links=True)
    bad = pages.filter(
        extract_text_udf(F.col("html")) != F.col("text")
    ).count()
    assert bad == 0


def test_extract_links_schedule(spark):
    """Every page emits exactly LINKS_PER_PAGE anchors, and the regex
    path reproduces the analytic schedule for a hand-checked doc."""
    from ontoea_spark.pipeline.pages import LINKS_PER_PAGE
    from ontoea_spark.pipeline.weblinks import extract_links

    pages = _pages(spark, with_links=True)
    links = extract_links(pages)
    n_pages = pages.count()
    assert links.count() == n_pages * LINKS_PER_PAGE
    per_src = links.groupBy("src_url").count()
    assert per_src.filter(F.col("count") != LINKS_PER_PAGE).count() == 0
    # doc_id=3: schedule (0,0,7,1),(3,1,11,3),(7,4,13,7) ->
    # hosts src0/src10/src5, paths 22/36/46
    got = sorted(
        r.dst_url
        for r in links.filter(F.col("src_url").endswith("/doc/3")).collect()
    )
    assert got == [
        "https://src0.example.org/doc/22",
        "https://src10.example.org/doc/36",
        "https://src5.example.org/doc/46",
    ]


def test_extract_links_no_anchors_no_rows(spark):
    from ontoea_spark.pipeline.weblinks import extract_links

    pages = _pages(spark, with_links=False)
    assert extract_links(pages).count() == 0


def test_extract_anchor_texts_schedule(spark):
    """Anchor surface forms follow the (doc_id + j) parity schedule, and
    the (src, dst) projection agrees exactly with extract_links."""
    from ontoea_spark.pipeline.weblinks import extract_anchor_texts, extract_links

    pages = _pages(spark, with_links=True)
    anchors = extract_anchor_texts(pages)
    # doc_id=3: j=0 -> 3 odd 'page 22'; j=1 -> 4 even 'doc 36';
    # j=2 -> 5 odd 'page 46'
    got = sorted(
        (r.dst_url, r.anchor_text)
        for r in anchors.filter(F.col("src_url").endswith("/doc/3")).collect()
    )
    assert got == [
        ("https://src0.example.org/doc/22", "page 22"),
        ("https://src10.example.org/doc/36", "doc 36"),
        ("https://src5.example.org/doc/46", "page 46"),
    ]
    links = extract_links(pages)
    proj = anchors.select("src_url", "dst_url")
    assert proj.exceptAll(links).count() == 0
    assert links.exceptAll(proj).count() == 0


def test_anchor_text_index_support_counts(spark):
    """The alias dictionary's n_refs sum to the anchor count, every
    target carries at most the two schedule surface forms ('doc N' /
    'page N'), and each form's trailing number equals the target's
    path id."""
    from ontoea_spark.pipeline.pages import LINKS_PER_PAGE
    from ontoea_spark.pipeline.weblinks import anchor_text_index, extract_anchor_texts

    pages = _pages(spark, with_links=True)
    idx = anchor_text_index(extract_anchor_texts(pages)).collect()
    assert sum(r.n_refs for r in idx) == pages.count() * LINKS_PER_PAGE
    forms: dict[str, set] = {}
    for r in idx:
        forms.setdefault(r.dst_url, set()).add(r.anchor_text)
        path_id = r.dst_url.rsplit("/", 1)[1]
        assert r.anchor_text in (f"doc {path_id}", f"page {path_id}")
    assert all(len(v) <= 2 for v in forms.values())


def test_host_graph_drops_self_and_counts(spark):
    """Self-host edges are dropped; kept edge weights equal the raw
    anchor multiplicity (checked against a groupBy of the link rows)."""
    from ontoea_spark.pipeline.weblinks import extract_links, host_link_graph
    from ontoea_spark.functions import urls as U

    links = extract_links(_pages(spark, with_links=True))
    g = host_link_graph(links)
    assert g.filter(F.col("src_host") == F.col("dst_host")).count() == 0
    raw = (
        links.select(
            U.url_host(F.col("src_url")).alias("src_host"),
            U.url_host(F.col("dst_url")).alias("dst_host"),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )
    assert g.exceptAll(raw).count() == 0 and raw.exceptAll(g).count() == 0


def test_host_pagerank_hub_ranks_first(spark):
    """The baked-in hub (every page's link 0 targets src0) must surface
    as the top-ranked host, and ranks must be a valid distribution
    (<= 1 total; leak-not-redistribute convention)."""
    from ontoea_spark.pipeline.weblinks import extract_links, host_pagerank

    pr = host_pagerank(
        extract_links(_pages(spark, with_links=True)), iters=5
    ).collect()
    top = max(pr, key=lambda r: r.pagerank)
    assert top.host == "src0.example.org"
    # <= 1 pre-rounding; each host's rank is 6dp-rounded, so allow n*0.5e-6
    assert sum(r.pagerank for r in pr) <= 1.0 + 0.5e-6 * len(pr)


def test_extract_links_plan_drops_html(spark):
    """The heavy html binary must not survive past extraction: the link
    frame's scan schema may read html, but no exchange above it carries
    it (narrow transform, project-then-explode)."""
    from ontoea_spark.pipeline.weblinks import extract_links

    links = extract_links(_pages(spark, with_links=True))
    assert "html" not in links.columns
    out = links.groupBy("dst_url").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    # html may (must) appear in the project/generate directly above the
    # scan — but never above the shuffle: nothing after the first
    # Exchange node (reading top-down, the aggregate side) may carry it
    assert "html" not in plan[: plan.index("Exchange")], plan


def test_domain_prior_hub_uplift(spark):
    """The prior uplift (prior_score - quality_score) is a per-host
    constant, maximal for the baked-in hub src0."""
    from ontoea_spark import driver_queries as DQ

    rows = DQ.queries()["domain_prior"](spark, SF_SMOKE).collect()
    by_host: dict[str, set] = {}
    for r in rows:
        by_host.setdefault(r.host, set()).add(
            round(r.prior_score - r.quality_score, 6)
        )
    # prior_score is rounded AFTER fusion, so per-doc uplift may wobble
    # by one 6dp ulp at rounding boundaries — constant within that
    assert all(max(v) - min(v) <= 1e-6 + 1e-12 for v in by_host.values()), by_host
    uplift = {h: max(v) for h, v in by_host.items()}
    hub = max(uplift, key=lambda h: uplift[h])
    assert hub == "src0.example.org"
    assert uplift[hub] > 0
