"""Mojibake detection/repair (functions/encoding.py): table round-trip,
clean-text byte identity, detector semantics, plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_algo_spark.functions.encoding import (
    MOJIBAKE_TABLE,
    _damage,
    fix_mojibake,
    mojibake_count,
)
from dedupe_algo_spark.plans import formatted_plan, has_whole_stage_codegen


def _apply(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    out = df.select(
        "i",
        fix_mojibake(F.col("text")).alias("fixed"),
        mojibake_count(F.col("text")).alias("n"),
        mojibake_count(fix_mojibake(F.col("text"))).alias("n_after"),
    ).collect()
    return sorted(out, key=lambda r: r["i"])


def test_every_table_entry_round_trips(spark):
    rows = _apply(spark, [broken for broken, _ in MOJIBAKE_TABLE])
    for r, (broken, fixed) in zip(rows, MOJIBAKE_TABLE):
        assert r["fixed"] == fixed, (broken, r["fixed"])
        assert r["n"] == 1 and r["n_after"] == 0


def test_damage_then_fix_restores_text(spark):
    """Property over the operator's own domain: any text built from
    clean table glyphs + ASCII, damaged by the historical bug, repairs
    byte-identically. (Glyphs whose damage crosses a cp1252 hole — the
    right double quote — are the documented exception.)"""
    import random

    rng = random.Random(3)
    glyphs = [g for _, g in MOJIBAKE_TABLE if g != "”"]
    texts = []
    for _ in range(60):
        n = rng.randint(1, 40)
        texts.append(
            "".join(
                rng.choice(glyphs)
                if rng.random() < 0.3
                else chr(rng.randint(32, 126))
                for _ in range(n)
            )
        )
    rows = _apply(spark, [_damage(t) for t in texts])
    for r, clean in zip(rows, texts):
        assert r["fixed"] == clean
        assert r["n_after"] == 0


def test_clean_ascii_is_byte_identical_and_uncounted(spark):
    rows = _apply(spark, ["plain ascii text, no damage at all."])
    assert rows[0]["fixed"] == "plain ascii text, no damage at all."
    assert rows[0]["n"] == 0


def test_prefix_signature_does_not_eat_longer_forms(spark):
    # right single quote damaged is 'â€™'; the bare 'â€' entry must not
    # fire first and strand the tail
    s = _damage("it’s")
    rows = _apply(spark, [s])
    assert rows[0]["fixed"] == "it’s" and rows[0]["n"] == 1


def test_plan_is_codegen_no_shuffle(spark):
    df = spark.range(10).select(F.concat(F.lit("x"), F.col("id")).alias("text"))
    out = df.select(fix_mojibake(F.col("text")), mojibake_count(F.col("text")))
    plan = formatted_plan(out)
    assert "Exchange" not in plan
    assert has_whole_stage_codegen(out)
