"""URL canonicalization for web-crawl corpora (rebuild extra).

The north-rule input is a Common-Crawl-style pages table keyed by
``url``; crawl dedup and per-source statistics need a CANONICAL url and
a registrable (apex) domain, not the raw string — the same page is
crawled as ``HTTPS://WWW.Example.com:443/a/?utm_source=feed#top`` and
``https://example.com/a``. Everything here is pure Catalyst column
expressions (no UDFs): linear per-row work, no shuffle, and a DuckDB
oracle can mirror each step (driver query ``url_canonical``).

Canonical form (RFC 3986 normalizations + tracker stripping):
  * scheme and host lowercased; leading ``www.`` dropped
  * default ports dropped (``:80`` http, ``:443`` https); others kept
  * fragment dropped
  * tracking params dropped (``utm_*``, ``fbclid``, ``gclid``); param
    ORDER IS PRESERVED for the rest (sorting would merge genuinely
    different urls on servers where order matters)
  * trailing ``/`` of the path dropped (``/a/`` == ``/a``; root == '')

Apex domain: full Mozilla Public Suffix List semantics, implemented in
:mod:`ontoea_spark.functions.psl` (``with_apex_domain`` — a DataFrame
transformer, because the 5.9k-entry exact-suffix membership is a pair of
broadcast joins, not a literal set; see that module's doc for the
measured reasoning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# mirrored literally in the DuckDB oracle — keep in sync with
# driver_queries.oracle_sql()['url_canonical']
TRACKER_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"


def _part(u: Column, regex: str) -> Column:
    return F.regexp_extract(u, regex, 1)


def url_scheme(u: Column) -> Column:
    return F.lower(_part(u, r"^([^:/?#]+)://"))


def url_host(u: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped (no port)."""
    raw = F.lower(_part(u, r"^[^:/?#]+://([^/:?#]+)"))
    return F.regexp_replace(raw, r"^www\.", "")


def url_port(u: Column) -> Column:
    return _part(u, r"^[^:/?#]+://[^/:?#]+:([0-9]+)")


def url_path(u: Column) -> Column:
    """Path with the trailing slash normalized away (root -> '')."""
    return F.regexp_replace(
        _part(u, r"^[^:/?#]+://[^/?#]+([^?#]*)"), r"/$", ""
    )


def url_query_kept(u: Column) -> Column:
    """Query string minus tracking params, original order preserved.

    Anchored to the pre-fragment region (``^[^#]*?\\?``) so a '?' that
    first appears inside the fragment (SPA routes like ``/p#/r?x=1``)
    is not mistaken for a query string.
    """
    q = _part(u, r"^[^#]*?\?([^#]*)")
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKER_RE),
    )
    return F.array_join(kept, "&")


def canonical_url(u: Column) -> Column:
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    default_port = (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (port == F.lit("443")))
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    q = url_query_kept(u)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(
        scheme, F.lit("://"), host, port_part, url_path(u), q_part
    )


# Registrable (apex) domain: ontoea_spark.functions.psl.with_apex_domain —
# full PSL semantics over the vendored list (the former embedded 9-entry
# MULTI_SUFFIXES expression mis-grouped *.com.sg / *.co.kr hosts).
