"""PII detection and redaction for training corpora.

Web text must be scrubbed of personally identifying strings before it
trains anything. The public protocol (Dolma's `pii` tagger, the
BigScience ROOTS pipeline) is regex-based: detect emails / IP
addresses / phone numbers, then mask each match with a fixed sentinel
token so downstream tokenization sees a stable vocabulary item rather
than a hole.

Everything here is whole-stage codegen — ``regexp_extract_all`` /
``regexp_replace`` over the text column, zero shuffle, zero Python —
so the operator is a pure narrow map that scales with the scan. The
patterns are deliberately restricted to the regex dialect both Java
(Spark) and RE2 (DuckDB, Go) evaluate identically: character classes,
bounded repetition, non-capturing groups, ASCII word boundaries — no
backreferences, no lookaround — so the DuckDB oracle replays the
identical algebra and the redaction is value-checked byte-for-byte.

Redaction order is part of the contract (EMAIL → IPV4 → PHONE,
alphabetical = application order): a later pattern must never match
inside an earlier pattern's sentinel, which the ``|||NAME|||``
sentinel shape guarantees (no digits, no ``@``, no dots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied (and counted) in this sequence on both engines.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # international-ish: +CC then 2-4 groups of 3-4 digits, -/. /space
    # separated. Deliberately strict — a loose phone regex is the
    # classic false-positive factory on web text (prices, ids, dates).
    "phone": r"\+\d{1,3}(?:[-. ]\d{3,4}){2,4}\b",
}


def _sentinel(kind: str) -> str:
    return f"|||{kind.upper()}|||"


def pii_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (``id_col``, n_email, n_ipv4, n_phone, n_pii): per-document
    match counts per PII class, counted on the SAME progressively
    redacted text the redaction sees (so overlapping classes are never
    double-counted and counts always equal what :func:`redact_pii`
    removes)."""
    cur: Column = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, _sentinel(kind))
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return docs.select(F.col(id_col), *counts, total.alias("n_pii"))


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (``id_col``, redacted_text, n_pii): every PII match replaced by
    its class sentinel (``|||EMAIL|||`` etc.), classes applied in the
    fixed PII_PATTERNS order. Idempotent: sentinels contain no
    characters any pattern can match."""
    cur: Column = F.col(text_col)
    n: Column = F.lit(0).cast("long")
    for kind, pat in PII_PATTERNS.items():
        n = n + F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, _sentinel(kind))
    return docs.select(
        F.col(id_col), cur.alias("redacted_text"), n.cast("long").alias("n_pii")
    )
