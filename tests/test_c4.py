"""C4 page cleaning (operators/c4.py): rule-by-rule semantics and the
zero-shuffle / whole-stage-codegen plan contract."""

from __future__ import annotations

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
