"""URL canonicalization edge cases (functions/urls.py; the oracle-green
url_canonical query covers the bulk fixture — these pin the corners)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.functions import urls as U
from ontoea_spark.functions.psl import with_apex_domain


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(raw)], "i long, url string"
    )
    df = df.select(
        "i",
        U.canonical_url(F.col("url")).alias("c"),
        U.url_host(F.col("url")).alias("host"),
    )
    out = with_apex_domain(df, "host", out="a").orderBy("i").collect()
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


def test_apex_full_psl(spark):
    """Full public-suffix-list semantics (VERDICT r4 'missing' #3): the
    former 9-entry embedded list mis-grouped every registry it didn't
    know (com.sg, co.kr, ...), and couldn't express wildcard or
    exception rules at all. Cases exercise each rule family of the
    vendored ICANN snapshot."""
    cases = {
        # 2-label suffixes ABSENT from the old embedded list
        "shop.example.com.sg": "example.com.sg",
        "a.b.news.co.kr": "news.co.kr",
        "x.gov.br": "x.gov.br",
        # 3-label exact suffix (e.g. act.edu.au)
        "school.act.edu.au": "school.act.edu.au",
        "www2.school.act.edu.au": "school.act.edu.au",
        # wildcard rule *.ck: any 2-label tail under ck is a suffix
        "a.b.whatever.ck": "b.whatever.ck",
        # ...with its exception !www.ck
        "a.www.ck": "www.ck",
        "www.ck": "www.ck",
        # 2-label wildcard base *.kawasaki.jp + exception city.kawasaki.jp
        "shop.foo.kawasaki.jp": "shop.foo.kawasaki.jp",
        "a.city.kawasaki.jp": "city.kawasaki.jp",
        # host that IS a public suffix falls back to itself
        "co.uk": "co.uk",
        # unlisted TLD -> default rule (suffix = last label)
        "foo.bar.notarealtld": "bar.notarealtld",
        "plain.example.com": "example.com",
    }
    df = spark.createDataFrame(list(cases.items()), "host string, want string")
    out = with_apex_domain(df, "host").collect()
    for r in out:
        assert r.apex == r.want, (r.host, r.apex, r.want)
