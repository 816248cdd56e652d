"""Physical-plan properties of the mixing-tier operators.

Scale claims asserted structurally: the text column never rides a
shuffle in the line/gram inverted indexes, the decontamination eval
side broadcasts, and sampling/splitting produce shuffle-free
scan→filter plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_algo_spark.plans import (
    exchange_columns,
    formatted_plan,
    has_broadcast_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_line_dedup_text_never_shuffles(spark):
    from dedupe_algo_spark.operators.lines import remove_duplicate_lines

    df = remove_duplicate_lines(_docs(spark))
    moved = exchange_columns(df)
    assert not any("text" == c or c.startswith("text") for c in moved), moved
    assert not any("kept_text" in c for c in moved), moved


def test_span_index_text_never_shuffles(spark):
    from dedupe_algo_spark.operators.spans import duplicate_ngram_spans

    df = duplicate_ngram_spans(_docs(spark), n=5)
    moved = exchange_columns(df)
    assert not any(c == "text" or c.startswith("text#") for c in moved), moved


def test_decontam_eval_side_broadcasts(spark):
    from dedupe_algo_spark.operators.decontam import contamination_report

    train = _docs(spark)
    ev = _docs(spark).where(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    df = contamination_report(train, ev, n=5)
    assert has_broadcast_join(df)
    # training text reaches the gram explode map-side only; the sole
    # exchange is the per-doc hit aggregate (id, counts)
    moved = exchange_columns(df)
    assert not any(c == "text" or c.startswith("text#") for c in moved), moved


def test_sampling_and_split_are_shuffle_free(spark):
    from dedupe_algo_spark.operators.sampling import (
        deterministic_split,
        stratified_sample,
    )

    docs = _docs(spark).select("doc_id", "lang")
    samp = stratified_sample(docs, {"en": 0.5}, seed=1)
    assert exchange_columns(samp) == set(), formatted_plan(samp)
    spl = deterministic_split(docs, {"train": 0.9, "valid": 0.1}, seed=2)
    assert exchange_columns(spl) == set(), formatted_plan(spl)


def test_pii_redaction_is_narrow_codegen(spark):
    from dedupe_algo_spark.operators.pii import redact_pii

    df = redact_pii(_docs(spark))
    plan = formatted_plan(df)
    assert exchange_columns(df) == set(), plan
    assert "codegen id" in plan  # regex algebra stays in WSCG
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
