"""URL canonicalization edge cases (functions/urls.py; the oracle-green
url_canonical query covers the bulk fixture — these pin the corners)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.functions import urls as U


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    host = U.url_host(F.col("url"))
    out = df.select(
        U.canonical_url(F.col("url")).alias("c"),
        U.apex_domain(host).alias("a"),
    ).collect()
    return [(r.c, r.a) for r in out]


def test_canonical_url_corners(spark):
    cases = {
        # scheme+host case, default port, trailing slash, fragment
        "HTTPS://WWW.Example.COM:443/A/b/#top": (
            "https://example.com/A/b",
            "example.com",
        ),
        # http default port dropped; https-port-on-http kept
        "http://example.com:80/x": ("http://example.com/x", "example.com"),
        "http://example.com:443/x": (
            "http://example.com:443/x",
            "example.com",
        ),
        # tracker-only query vanishes with its '?'
        "https://a.co.uk/p?utm_source=x&utm_medium=y": (
            "https://a.co.uk/p",
            "a.co.uk",
        ),
        # kept params preserve order; trackers removed in the middle
        "https://a.io/p?b=2&utm_x=1&a=1": (
            "https://a.io/p?b=2&a=1",
            "a.io",
        ),
        # root path normalizes away; bare host stays apex
        "https://sub.dom.example.co.jp/": (
            "https://sub.dom.example.co.jp",
            "example.co.jp",
        ),
        "https://example.org": ("https://example.org", "example.org"),
        # ADVICE r3: bare valueless tracker params strip too
        "https://a.io/p?fbclid&a=1": ("https://a.io/p?a=1", "a.io"),
        "https://a.io/p?gclid": ("https://a.io/p", "a.io"),
        # ADVICE r3: a '?' first appearing inside the fragment is NOT a
        # query string (SPA route) — the whole fragment drops
        "https://a.io/p#/route?x=1": ("https://a.io/p", "a.io"),
        # ...but a real query before the fragment still survives
        "https://a.io/p?a=1#/route?x=2": ("https://a.io/p?a=1", "a.io"),
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, (raw, g, want)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over the full messy-url
    fixture — the definitional property of a canonicalizer (a second
    normalization pass must find nothing left to normalize)."""
    from tests.conftest import SF_SMOKE
    from ontoea_spark.driver_queries import q_url_canonical

    out = q_url_canonical(spark, SF_SMOKE).select("canon_url")
    twice = out.select(
        "canon_url",
        U.canonical_url(F.col("canon_url")).alias("canon2"),
    )
    assert twice.filter(F.col("canon_url") != F.col("canon2")).count() == 0
