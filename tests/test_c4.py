"""C4 page cleaning (operators/c4.py): rule-by-rule semantics and the
zero-shuffle / whole-stage-codegen plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_algo_spark.operators.c4 import c4_clean
from dedupe_algo_spark.plans import (
    formatted_plan,
    has_whole_stage_codegen,
)


def _clean_one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df, **kw).collect()[0]


def test_terminal_punctuation_rule(spark):
    r = _clean_one(
        spark,
        "A good first sentence here.\nHome | About | Contact\n"
        'He said "stop right there."\nEnds with a comma,',
        min_sentences=1,
    )
    assert r["n_lines"] == 4 and r["n_kept"] == 2
    assert r["kept_text"] == (
        'A good first sentence here.\nHe said "stop right there."'
    )


def test_min_words_rule(spark):
    r = _clean_one(spark, "Too short.\nThis one is long enough.", min_sentences=1)
    assert r["n_kept"] == 1 and r["kept_text"] == "This one is long enough."


def test_javascript_line_rule(spark):
    r = _clean_one(
        spark,
        "Please enable JavaScript to continue reading.\nReal content stays here.",
        min_sentences=1,
    )
    assert r["n_kept"] == 1 and "JavaScript" not in r["kept_text"]


def test_page_level_drops(spark):
    lorem = _clean_one(spark, "Filler lorem ipsum dolor sit amet.", min_sentences=1)
    assert lorem["has_lorem"] and not lorem["keep_doc"]
    brace = _clean_one(
        spark, "Good sentence here.\nvar x = { a: 1 };", min_sentences=1
    )
    assert brace["has_brace"] and not brace["keep_doc"]
    blocked = _clean_one(
        spark,
        "Totally ordinary sentence with badphrase inside.",
        min_sentences=1,
        blocklist=("BadPhrase",),
    )
    assert blocked["has_blocked"] and not blocked["keep_doc"]


def test_min_sentences_rule(spark):
    four = "One fine line. And another one here. A third good one. Fourth one now."
    r = _clean_one(spark, four, min_sentences=5)
    assert r["n_sentences"] == 4 and not r["keep_doc"]
    r5 = _clean_one(spark, four + " Fifth sentence closes it.", min_sentences=5)
    assert r5["n_sentences"] == 5 and r5["keep_doc"]


def test_sentences_counted_on_kept_lines_only(spark):
    # the dropped javascript line's punctuation must not count
    r = _clean_one(
        spark,
        "Enable javascript now. Really. Please. Do. It.\nOnly kept sentence here.",
        min_sentences=2,
    )
    assert r["n_sentences"] == 1 and not r["keep_doc"]


def _random_corpus(n=300, seed=11):
    """Seeded random multi-line docs mixing every rule trigger: words,
    digits, punctuation-terminated and bare lines, javascript/lorem/brace
    injections, unicode, empty lines."""
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "Gamma", "δelta", "x9", "the", "of", "JavaScript",
             "lorem", "ipsum", "{brace}", "plain", "word", "née", "ok"]
    tails = [".", "!", "?", '"', "", ",", ";", " ", "..."]
    docs = []
    for i in range(n):
        lines = []
        for _ in range(rng.randint(0, 8)):
            ln = " ".join(rng.choice(words) for _ in range(rng.randint(0, 7)))
            lines.append((" " * rng.randint(0, 2)) + ln + rng.choice(tails))
        docs.append((i, "\n".join(lines)))
    return docs


def test_property_line_cut_is_idempotent(spark):
    """Re-cleaning a cleaned page is a no-op: every kept line still
    passes every line rule, so kept_text, n_kept and n_sentences are
    fixed points. (Page flags can differ — a kept line may itself
    contain 'lorem ipsum' — the property is about the LINE verdicts.)"""
    docs = spark.createDataFrame(_random_corpus(), "doc_id long, text string")
    once = c4_clean(docs).where("n_kept > 0").select(
        "doc_id",
        F.col("kept_text").alias("text"),
        F.col("n_kept").alias("k1"),
        F.col("n_sentences").alias("s1"),
    )
    twice = c4_clean(once, min_sentences=1)
    joined = once.join(twice, "doc_id")
    bad = joined.where(
        (F.col("n_kept") != F.col("k1"))
        | (F.col("n_sentences") != F.col("s1"))
        | (F.col("kept_text") != F.col("text"))
    )
    assert once.count() > 0
    assert bad.count() == 0, bad.limit(5).collect()


def test_property_junk_lines_never_change_output(spark):
    """Appending a line that fails the line rules never changes
    kept_text (monotone irrelevance of junk)."""
    docs = spark.createDataFrame(_random_corpus(seed=23), "doc_id long, text string")
    noisy = docs.withColumn(
        "text",
        F.concat(F.col("text"), F.lit("\nclick here now\n   \nmenu footer nav")),
    )
    a = c4_clean(docs).select("doc_id", "kept_text")
    b = c4_clean(noisy).select(
        "doc_id", F.col("kept_text").alias("kept_noisy")
    )
    diff = a.join(b, "doc_id").where(F.col("kept_text") != F.col("kept_noisy"))
    assert diff.count() == 0, diff.limit(5).collect()


def test_plan_is_one_codegen_map(spark):
    """The whole operator is a narrow per-row rewrite: no Exchange of
    any kind, and the expressions run inside whole-stage codegen."""
    df = spark.createDataFrame(
        [(i, f"Sentence number {i} ends well.") for i in range(10)],
        "doc_id long, text string",
    )
    out = c4_clean(df)
    plan = formatted_plan(out)
    assert "Exchange" not in plan, plan
    assert has_whole_stage_codegen(out)


def test_crlf_lines_normalized(spark):
    """Windows line endings: the trailing \r is stripped before every
    rule (Java's $ matches before a final line terminator, RE2's does
    not — without stripping, Spark and the DuckDB twin diverge) and
    never leaks into kept_text."""
    r = _clean_one(
        spark,
        "First fine sentence lands.\r\nSecond fine sentence follows.\r\n"
        "no terminal punct here\r",
        min_sentences=2,
    )
    assert r["n_kept"] == 2 and r["keep_doc"]
    assert "\r" not in r["kept_text"]
    assert r["kept_text"].endswith("Second fine sentence follows.")
