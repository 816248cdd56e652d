"""C4-style page cleaning (Raffel et al., JMLR 2020, §2.2).

The C4 ("Colossal Clean Crawled Corpus") heuristics are the classic
first-pass web cleanup every Common-Crawl training pipeline starts
from, and they complement the corpus operators already here: Gopher
repetition signals (operators/repetition.py) catch degenerate text,
line-level boilerplate dedup (operators/lines.py) catches lines shared
ACROSS pages — C4's rules are per-page lexical hygiene:

- keep only lines that end in a terminal punctuation mark;
- keep only lines with at least ``min_words`` words (paper: 3);
- drop lines containing the word "javascript" (case-insensitive);
- drop the whole page if it contains "lorem ipsum", a curly brace
  ``{``, any phrase on a blocklist (the paper uses the public "List of
  Dirty, Naughty…" wordlist — parameterized here, default empty), or
  fewer than ``min_sentences`` sentences after the line cut (paper: 5).

Sentences are counted as terminal-punctuation occurrences in the KEPT
lines — deterministic and engine-portable, where the paper's sentence
splitter is a model artifact.

Spark shape: one narrow map — split, higher-order filter, aggregate
over the kept array — ALL whole-stage codegen, zero Python, zero
shuffle (plan-asserted by tests/test_c4.py). Every predicate is kept
to the regex/string algebra DuckDB evaluates identically, so the
``c4_filter`` oracle value-checks the rewrite (kept text bytes) and
every flag end-to-end.

Reference parity: dedupe-algo filters files by predicate lists
(SURVEY §2.2, filters F1-F11); C4 cleaning is the webtext
generalization of those per-record keep/drop verdicts mandated by
BASELINE.json's north_star (training-data pipeline beyond the
reference's own surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# after trim: period / exclamation / question mark / closing quote
TERMINAL_PUNCT_RE = r'[.!?"]$'


def _keep_line(line: Column, min_words: int) -> Column:
    """The C4 per-line verdict. ``\\s+`` word splitting matches the
    DuckDB twin's ``regexp_split_to_array``; a trimmed-empty line is
    never kept (size(split('', ...)) is 1, so the emptiness guard is
    load-bearing)."""
    t = F.trim(line)
    return (
        (t != "")
        & t.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(t, r"\s+")) >= min_words)
        & (F.instr(F.lower(line), "javascript") == 0)
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    blocklist: tuple[str, ...] = (),
    passthrough: bool = False,
) -> DataFrame:
    """→ (``id_col``, n_lines, n_kept, n_sentences, has_lorem,
    has_brace, has_blocked, keep_doc, kept_text).

    ``kept_text`` is the page rewritten to its surviving lines (original
    order, ``\\n``-joined); ``keep_doc`` is the page-level verdict —
    training-data selection is then ``WHERE keep_doc`` over
    ``kept_text``. The flags stay separate columns so lineage reports
    can attribute drops per rule.

    ``passthrough=True`` carries every input column through alongside
    the verdicts (still one narrow map) — the pipeline-stage form, so a
    caller can rewrite text in place without a self-join back to the
    source: ``.where("keep_doc").withColumn("text", F.col("kept_text"))``.

    CRLF normalization: each line's trailing ``\\r`` is stripped before
    any rule runs (and from ``kept_text``). Without it the engines
    diverge — Java's ``$`` matches before a final line terminator while
    RE2's is end-of-text — and stray ``\\r`` bytes would leak into the
    hash/signature stages downstream.
    """
    lines = F.transform(
        F.split(F.col(text_col), "\n"),
        lambda ln: F.regexp_replace(ln, "\r$", ""),
    )
    kept = F.filter(lines, lambda ln: _keep_line(ln, min_words))
    n_sentences = F.aggregate(
        kept, F.lit(0), lambda acc, x: acc + F.regexp_count(x, F.lit("[.!?]"))
    )
    low = F.lower(F.col(text_col))
    has_lorem = F.instr(low, "lorem ipsum") > 0
    has_brace = F.instr(F.col(text_col), "{") > 0
    has_blocked = F.lit(False)
    for w in blocklist:
        has_blocked = has_blocked | (F.instr(low, w.lower()) > 0)
    keep_doc = (
        ~has_lorem & ~has_brace & ~has_blocked & (n_sentences >= min_sentences)
    )
    lead = (
        [F.col(c) for c in docs.columns] if passthrough else [F.col(id_col)]
    )
    return docs.select(
        *lead,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_blocked.alias("has_blocked"),
        keep_doc.alias("keep_doc"),
        F.concat_ws("\n", kept).alias("kept_text"),
    )
