"""Text analysis columns: token counts, quality, lang-ID, fingerprint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.functions.text import (
    fingerprint_udf,
    lang_id_heuristic,
    punct_ratio,
    quality_score,
    token_count,
    word_tokens,
)


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col(F.col("text")).alias("v"))
        .collect()[0]["v"]
    )


@pytest.mark.parametrize(
    "text,n",
    [("a b c", 3), ("", 0), ("   ", 0), ("one", 1), ("x\t y \n z", 3)],
)
def test_token_count(spark, text, n):
    assert _one(spark, text, token_count) == n


def test_word_tokens_bpe_ish(spark):
    got = _one(spark, "hello, world42! x", word_tokens)
    assert list(got) == ["hello", ",", "world", "42", "!", "x"]


def test_punct_ratio(spark):
    assert _one(spark, "abcd", punct_ratio) == 0.0
    assert _one(spark, "a!b!", punct_ratio) == 0.5
    assert _one(spark, "", punct_ratio) == 0.0


@pytest.mark.parametrize(
    "text,lang",
    [
        ("the cat sat of the mat and it was fine", "en"),
        ("der hund und die katze ist nicht da", "de"),
        ("le chat et les chiens est pour la vie", "fr"),
        ("el perro es un animal que vive por la casa", "es"),
        ("zzz qqq www", "und"),
    ],
)
def test_lang_id(spark, text, lang):
    assert _one(spark, text, lang_id_heuristic) == lang


def test_quality_monotone_in_length(spark):
    short = _one(spark, "the word " * 5, quality_score)
    longer = _one(spark, "the word " * 200, quality_score)
    assert longer > short


def test_fingerprint_deterministic_and_distinct(spark):
    df = spark.createDataFrame(
        [("hello world",), ("hello world",), ("hello worle",)], "text string"
    )
    vals = [r["v"] for r in df.select(fingerprint_udf("text").alias("v")).collect()]
    assert vals[0] == vals[1]
    assert vals[0] != vals[2]
