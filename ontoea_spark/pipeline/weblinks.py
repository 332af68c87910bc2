"""Web link-graph construction over the crawl pages table.

The other half of webtext KG construction: besides the in-text entity
graph (pipeline/extract.py), a crawl carries a *hyperlink* graph —
page -> page anchors that aggregate into the host/domain graph used for
crawl frontier ranking, spam/hub detection, and domain-level quality
priors (the Common Crawl host-level web graph is exactly this artifact).

Pipeline (all JVM-side Catalyst expressions, zero UDF):

* :func:`extract_links` — href parsing out of the raw html bytes via
  ``regexp_extract_all`` + explode. Narrow per-row transform; the heavy
  ``html`` column is dropped in the same select, so nothing downstream
  ever shuffles page bytes.
* :func:`host_link_graph` — (src_host, dst_host, n_links) edge weights
  via functions/urls.url_host. One groupBy shuffle on the host pair;
  output is |hosts|^2-bounded (in practice ~linear), i.e. tiny relative
  to the page table — the standard crawl-graph rollup.
* :func:`host_pagerank` — fixed-iteration PageRank over the distinct
  host edges (operators/graph.pagerank: per-round localCheckpoint, only
  the vertex count touches the driver).

Scale: link extraction is the only stage that sees page bytes and it is
embarrassingly parallel; everything after operates on the host-level
rollup, which is smaller than the input by the pages-per-host factor
(10^3-10^5 on real crawls). The hub skew the fixture bakes in (every
page links to src0) is the documented reason host-keyed joins downstream
go through operators/salting.py.

Reference scope: the reference engine builds its KG from relation files
only (read.py); the hyperlink graph is rebuild-only surface for the
webtext tier (BASELINE.json input_hint pages table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoea_spark.functions import urls as U
from ontoea_spark.operators.graph import pagerank

_HREF_PATTERN = r'href="([^"]+)"'


def extract_links(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (src_url, dst_url), one row per anchor.

    Pages with no anchors drop (explode, not explode_outer) — the link
    graph only carries edges. Pure JVM regex over the decoded html.
    """
    hrefs = F.regexp_extract_all(
        F.decode(F.col("html"), "utf-8"), F.lit(_HREF_PATTERN), F.lit(1)
    )
    return pages.select(
        F.col("url").alias("src_url"), F.explode(hrefs).alias("dst_url")
    )


def host_link_graph(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_url, dst_url) -> weighted host edges (src_host, dst_host,
    n_links). ``drop_self`` removes intra-host edges (web convention:
    self-navigation says nothing about inter-host endorsement)."""
    g = links.select(
        U.url_host(F.col("src_url")).alias("src_host"),
        U.url_host(F.col("dst_url")).alias("dst_host"),
    )
    if drop_self:
        g = g.filter(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n_links")
    )


def host_pagerank(links: DataFrame, iters: int = 5) -> DataFrame:
    """Host-level PageRank from raw page links: rollup -> distinct host
    edges -> fixed-iteration power steps. Returns (host, pagerank)."""
    g = host_link_graph(links, drop_self=True)
    return pagerank(
        g.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst")),
        iters=iters,
    ).select(F.col("id").alias("host"), "pagerank")


_ANCHOR_PATTERN = r'<a href="([^"]+)">([^<]*)</a>'


def extract_anchor_texts(pages: DataFrame) -> DataFrame:
    """pages -> (src_url, dst_url, anchor_text), one row per anchor.

    Same narrow JVM-regex shape as :func:`extract_links`, but keeps the
    anchor's surface text: two capture groups extracted in parallel and
    zipped (regexp_extract_all takes one group index per call — the
    extract_mentions pattern). Anchor text is how the web NAMES the
    page it links to, i.e. the alias/entity-name signal KG construction
    mines (the anchor-text dictionaries behind entity-linking systems).
    """
    html_str = F.decode(F.col("html"), "utf-8")
    pat = F.lit(_ANCHOR_PATTERN)
    zipped = F.arrays_zip(
        F.regexp_extract_all(html_str, pat, F.lit(1)).alias("u"),
        F.regexp_extract_all(html_str, pat, F.lit(2)).alias("t"),
    )
    return pages.select(
        F.col("url").alias("src_url"), F.explode(zipped).alias("a")
    ).select(
        "src_url",
        F.col("a.u").alias("dst_url"),
        F.col("a.t").alias("anchor_text"),
    )


def anchor_text_index(anchors: DataFrame) -> DataFrame:
    """Anchor-text alias dictionary: for every target url, each distinct
    surface form with its support count — (dst_url, anchor_text,
    n_refs). One combiner-friendly groupBy; the output is bounded by
    distinct (target, name) pairs, far below the anchor count."""
    return anchors.groupBy("dst_url", "anchor_text").agg(
        F.count("*").cast("long").alias("n_refs")
    )
