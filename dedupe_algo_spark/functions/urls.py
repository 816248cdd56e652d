"""URL column functions — registered-domain extraction.

The reference's cheap per-file key functions are extension extraction
(scanner.rs:176-179) and prefix tests (scanner.rs:150); our web-scale
analog is the registered domain of a url, used as a blocking key
component. Implemented entirely with built-in JVM-side expressions
(parse_url-style split + a small public-suffix list folded into a
``when`` ladder) so it stays inside whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal public-suffix list (two-label suffixes). A production deployment
# would broadcast-join the full PSL; the mechanism is identical.
TWO_LABEL_SUFFIXES = [
    "co.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "co.in", "com.br", "co.nz",
]


def host_of(url: Column) -> Column:
    """Hostname of an http(s) url, lowercased."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup (the cheapest dedup key a
    crawl pipeline has — dedupe BEFORE fetching/hashing content):

    - scheme and host lowercased
    - a leading ``www.`` label dropped
    - the scheme's default port dropped (``:80`` http, ``:443`` https)
    - the fragment (``#…``) dropped — never sent to the server
    - a trailing ``/`` dropped (the root path ``/`` canonicalizes to
      the empty path — ``https://a.com/`` ≡ ``https://a.com``)
    - the query string kept verbatim (reordering parameters can change
      server semantics, so a canonicalizer must not sort them)

    Pure regexp/string built-ins — whole-stage codegen, and exactly
    reproducible in any engine with RE2-style regexes (the DuckDB
    oracle runs the same patterns).
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.regexp_replace(host_of(url), r"^www\.", "")
    port = F.regexp_extract(url, r"^[^/?#]*://[^/:?#]+:(\d+)", 1)
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(url, r"^[^/?#]*://[^/?#]*(/[^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(url, r"^[^?#]*(\?[^#]*)", 1)
    return F.concat(scheme, F.lit("://"), host, port, path, query)


def registered_domain(url: Column) -> Column:
    """eTLD+1: last two host labels, or last three when the two-label
    tail is a known public suffix (so ``a.b.site.co.uk`` → ``site.co.uk``
    and ``news.site.org`` → ``site.org``)."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(TWO_LABEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )
