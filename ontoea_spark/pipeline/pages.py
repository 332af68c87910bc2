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


def synthesize_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages table."""
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
    )
    html = F.encode(
        F.concat(
            F.lit(HTML_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(HTML_MID),
            F.col("text"),
            F.lit(HTML_SUFFIX),
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
