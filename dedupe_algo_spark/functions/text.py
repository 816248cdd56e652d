"""Text-analysis columns for training-data pipelines.

All pure built-in expressions (JVM, codegen) except the fingerprint,
which is an Arrow-batched pandas UDF. Each has a `queries()` entry with
a DuckDB oracle (see __spark_entry__.py); the SQL twins constrain these
to portable expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# heuristic language ID (public common-word lists).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "un", "una", "por", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def word_tokens(text: Column) -> Column:
    """BPE-ish tokenization: letters-runs, digit-runs, or single
    punctuation — the regex analog of a byte-pair pre-tokenizer."""
    return F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def char_len(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - stripped) / n.cast("double")
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are common stopwords of ``lang``."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length score × (1 − punct
    excess) × stopword presence. Monotone, portable to SQL."""
    n = F.length(text).cast("double")
    length_score = F.least(n / 2000.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    sw_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return F.round(length_score * punct_penalty * (0.5 + 0.5 * sw_score), 6)


def lang_id_heuristic(text: Column) -> Column:
    """Stopword-vote language ID over {en,de,fr,es}; 'und' (undetermined)
    when no list scores. Pure built-ins: one filter+size per language."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")

    def contains_any(words: list[str]):
        # NB: a two-arg lambda would be read by F.filter as (element,
        # index) — keep the closure single-parameter.
        return lambda t: t.isin(words)

    scores = {
        lang: F.size(F.filter(toks, contains_any(sw)))
        for lang, sw in STOPWORDS.items()
    }
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    # deterministic tie-break: alphabetical language order, first max wins
    for lang in sorted(scores):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score) & (expr == "und"),
            F.lit(lang),
        ).otherwise(expr)
    return expr


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Document fingerprint: 64-bit rolling (polynomial) hash over the
    byte stream — winnowing-style content fingerprint, Arrow-batched."""
    B = np.uint64(1000003)

    def fp(t: str | None) -> int | None:
        if t is None:
            return None
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        h = np.uint64(0xCBF29CE484222325)
        # vectorized Horner: h = ((h*B)+b) mod 2^64, computed via cumulative powers
        # loop-free approximation: fold in chunks to bound the power table
        for chunk in np.array_split(data, max(1, len(data) // 4096)):
            powers = np.empty(len(chunk), dtype=np.uint64)
            powers[0] = np.uint64(1)
            if len(chunk) > 1:
                np.multiply.accumulate(np.full(len(chunk) - 1, B, dtype=np.uint64), out=powers[1:])
            h = h * (B ** np.uint64(len(chunk))) + np.sum(chunk[::-1] * powers, dtype=np.uint64)
        v = int(h)
        return v - (1 << 64) if v >= 1 << 63 else v

    return texts.map(fp)
