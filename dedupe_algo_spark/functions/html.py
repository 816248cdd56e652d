"""HTML → extracted-text as pure Catalyst expressions (zero Python).

The reference dedups pages by their EXTRACTED text (the byte-compare
pass operates on file content — reference src-tauri/src/lib.rs hash +
byte-compare cascade), and the north-star invariant is *byte-identical
extracted text per url*.  This module closes the loop from the raw
``html: binary`` column of the input table (BASELINE input_hint) to
that text column, so a corpus that arrives as WARC-style raw HTML can
be brought to the canonical ``text`` column inside the same Spark job.

Extraction pipeline (every step a JVM ``regexp_replace`` / ``replace``
— whole-stage codegen end to end, no UDF, no Arrow transfer):

1. decode the UTF-8 bytes,
2. drop ``<head>…</head>`` wholesale (title/meta/style boilerplate is
   markup, not content),
3. drop ``<script>…</script>`` and ``<style>…</style>`` blocks
   (their character data is code, and may contain ``<`` / ``&`` that
   must not leak into text),
4. drop HTML comments,
5. strip every remaining tag,
6. decode the five core character entities, ``&amp;`` strictly last
   (so ``&amp;lt;`` round-trips to the literal ``&lt;``, not ``<``).

Patterns are deliberately RE2-safe (no backreferences, no lookaround)
so the DuckDB oracle (`regexp_replace(..., 'g')`, RE2) evaluates the
exact same automaton as Spark's Java regex — the CORRECTNESS twin is
bit-for-bit, not approximate.  At 100 TB this matters: the whole
extraction is one narrow map over the scan, shuffles nothing, and
Parquet column pruning drops ``html`` the moment the projection does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: container blocks first (their char-data may contain '<'),
# then comments, then the generic tag strip.  `(\s[^>]*)?` (not
# `[^>]*`) after the tag name so `<header>` / `<scripted>` do NOT
# match the `<head>` / `<script>` block rules.
BLOCK_STRIP_PATTERNS: tuple[str, ...] = (
    r"(?is)<head(\s[^>]*)?>.*?</head\s*>",
    r"(?is)<script(\s[^>]*)?>.*?</script\s*>",
    r"(?is)<style(\s[^>]*)?>.*?</style\s*>",
    r"(?s)<!--.*?-->",
    r"(?s)<[^>]*>",
)

# Decode order is load-bearing: named/numeric entities BEFORE &amp;,
# so text that originally contained the literal string "&lt;" (encoded
# by the inverse map to "&amp;lt;") round-trips byte-identically.
ENTITY_DECODE: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_html_text(html: Column) -> Column:
    """Extracted text of a raw ``binary`` HTML column — pure codegen.

    Bytes become a string via CAST, not ``decode``: under ANSI mode
    (Spark 4 default) ``decode`` THROWS on invalid UTF-8, and real
    crawls are full of mislabeled charsets — one bad page must not
    kill an ingest job. The cast wraps bytes as-is (byte-identical to
    decode for valid UTF-8, which is what the byte-identity oracle
    checks); genuinely non-text bytes yield garbage text that the
    lang-id/quality gates downstream discard."""
    s = html.cast("string")
    for pat in BLOCK_STRIP_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    for ent, ch in ENTITY_DECODE:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def encode_html_text(text: str) -> str:
    """Inverse map (driver-side helper for synth/tests): entity-encode
    text for embedding as HTML character data.  ``&`` strictly first."""
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def ensure_text(pages: DataFrame) -> DataFrame:
    """Canonicalize a pages frame: where ``text`` is NULL, derive it
    from ``html``; rows with neither stay NULL (filter downstream).
    A narrow projection — no shuffle, no UDF — safe to prepend to the
    dedup pipeline at any scale."""
    return pages.withColumn(
        "text", F.coalesce(F.col("text"), extract_html_text(F.col("html")))
    )


def extract_outlinks(html: Column) -> Column:
    """All ``href`` targets of a raw html column, as an array — pure
    codegen ``regexp_extract_all``, the WAT-style link extraction a
    link-graph pass (outdegree, PageRank) starts from."""
    return F.regexp_extract_all(
        # cast, not decode: ANSI decode throws on invalid UTF-8 bytes
        html.cast("string"), F.lit(r'href="([^"]+)"'), 1
    )


def link_host(url: Column) -> Column:
    """Host of an extracted link target (absolute links only; relative
    links yield empty string — filter as needed). Delegates to
    ``urls.host_of`` so link-graph nodes normalize exactly like page
    hosts (lowercased, port/query stripped) — a case or `:443` mismatch
    would otherwise split rank onto phantom nodes that never join back
    to the pages' own hosts."""
    from .urls import host_of

    return host_of(url)
