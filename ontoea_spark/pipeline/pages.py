"""Synthesize the Common-Crawl-style pages table (BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

The sandbox provides no real crawl, so pages are derived deterministically
from the driver's ``documents`` fixture: one page per document, html built
by a pure template around the document text. The html is the *input* of
the extraction UDF; the ``text`` column is the gold the UDF must reproduce
byte-identically per url (BASELINE.json:15).

Everything is JVM-side expression work (concat/encode) — no Python row
loop — so page synthesis itself scales like a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# warc_ts base: 2024-01-01T00:00:00Z
_WARC_EPOCH0 = 1704067200

HTML_PREFIX = "<html><head><title>doc-"
HTML_MID = "</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"

# Deterministic outlink schedule (with_links=True): every page carries
# LINKS_PER_PAGE anchors after its </p> body. Target hosts are pure
# doc_id arithmetic over the fixture's source vocabulary (src0..src19),
# with link 0 always pointing at src0 — a deliberate hub, so the derived
# host graph has the in-degree skew a real web graph has (and that the
# salting/PageRank operators exist to measure).
N_LINK_SOURCES = 20
LINKS_PER_PAGE = 3
# (source-index multiplier, source-index offset, path multiplier, path offset)
LINK_SCHEDULE = [(0, 0, 7, 1), (3, 1, 11, 3), (7, 4, 13, 7)]
LINK_PATH_MOD = 1000


def _links_block(doc_id) -> F.Column:
    """The anchor block appended between </p> and </body>.

    Anchor TEXT is deterministic too — the j-th anchor names its target
    either 'doc N' or 'page N' depending on parity of (doc_id + j), so
    a target URL accumulates up to two distinct surface forms across
    the corpus: the alias-dictionary shape anchor-text mining exists
    to extract (weblinks.anchor_text_index)."""
    anchors = []
    for j, (sm, so, pm, po) in enumerate(LINK_SCHEDULE):
        src_idx = F.pmod(doc_id * sm + so, F.lit(N_LINK_SOURCES))
        path_id = F.pmod(doc_id * pm + po, F.lit(LINK_PATH_MOD))
        label = F.concat(
            F.when(F.pmod(doc_id + j, F.lit(2)) == 0, F.lit("doc ")).otherwise(
                F.lit("page ")
            ),
            path_id.cast("string"),
        )
        anchors.append(
            F.concat(
                F.lit('<a href="https://src'),
                src_idx.cast("string"),
                F.lit(".example.org/doc/"),
                path_id.cast("string"),
                F.lit('">'),
                label,
                F.lit("</a>"),
            )
        )
    return F.concat(*anchors)


def synthesize_pages(documents: DataFrame, with_links: bool = False) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages table.

    ``with_links=True`` appends the deterministic anchor block after the
    </p> body (extraction is unaffected: the text extractor takes the
    first non-greedy <p>…</p> match). Default False keeps the byte-exact
    fixture the extraction-fidelity and crawl queries were oracled on.
    """
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
    )
    tail = (
        F.concat(F.lit("</p>"), _links_block(F.col("doc_id")), F.lit("</body></html>"))
        if with_links
        else F.lit(HTML_SUFFIX)
    )
    html = F.encode(
        F.concat(
            F.lit(HTML_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(HTML_MID),
            F.col("text"),
            tail,
        ),
        "utf-8",
    )
    warc_ts = F.timestamp_seconds(F.lit(_WARC_EPOCH0) + F.col("doc_id"))
    return documents.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
    )
