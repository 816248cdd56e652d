"""Exact-dup cascade: reference-semantics tests (SURVEY.md §5.1)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.operators.dedup import exact_dup_assignments, exact_dup_groups
from dedupe_algo_spark.schemas import PAGES_SCHEMA


def _mk(spark, texts, urls=None):
    n = len(texts)
    urls = urls or [f"https://x.com/{i}" for i in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "url": urls,
                "warc_ts": [datetime.datetime(2026, 1, 1)] * n,
                "html": [b"<html>"] * n,
                "text": texts,
                "lang": ["en"] * n,
            }
        ),
        schema=PAGES_SCHEMA,
    )


def test_identical_texts_cluster(spark):
    df = _mk(spark, ["hello world " * 5] * 3 + ["something else " * 5])
    out = exact_dup_assignments(df).toPandas()
    assert len(out) == 3
    assert out["cluster_id"].nunique() == 1
    assert (out["cluster_size"] == 3).all()


def test_cluster_id_is_min_url(spark):
    df = _mk(
        spark,
        ["same text here " * 4] * 2,
        urls=["https://x.com/zzz", "https://x.com/aaa"],
    )
    out = exact_dup_assignments(df).toPandas()
    assert (out["cluster_id"] == "https://x.com/aaa").all()


def test_min_len_filter(spark):
    # reference F5 (scanner.rs:186-189): short rows never enter the scan
    df = _mk(spark, ["tiny", "tiny"])
    assert exact_dup_assignments(df, min_len=10).count() == 0
    assert exact_dup_assignments(df, min_len=2).count() == 2


def test_singletons_excluded_by_default(spark):
    df = _mk(spark, ["unique text one " * 3, "unique text two " * 3])
    assert exact_dup_assignments(df).count() == 0
    assert exact_dup_assignments(df, keep_singletons=True).count() == 2


def test_same_length_different_text_not_clustered(spark):
    # two texts, same length, same partial-hash block candidate set
    df = _mk(spark, ["a" * 100, "b" * 100])
    assert exact_dup_assignments(df).count() == 0


def test_partial_window_boundary(spark):
    # same 16KB head+tail, different middle → partial collides, full differs
    head, tail = "h" * 20_000, "t" * 20_000
    a, b = head + "MIDDLE_A" + tail, head + "MIDDLE_B" + tail
    df = _mk(spark, [a, b])
    assert exact_dup_assignments(df).count() == 0  # full hash separates
    out = exact_dup_assignments(df, keep_singletons=True).toPandas()
    assert out["content_sha256"].nunique() == 2


def test_grouped_view_shape(spark, pages_1k):
    g = exact_dup_groups(pages_1k)
    pdf = g.orderBy(F.desc("n_members")).limit(1).toPandas()
    assert pdf.iloc[0]["n_members"] == 42  # skew-block cluster
    assert len(pdf.iloc[0]["urls"]) == 42
    assert list(pdf.iloc[0]["urls"]) == sorted(pdf.iloc[0]["urls"])


def test_udf_and_builtin_hash_agree(spark, pages_1k):
    a = (
        exact_dup_assignments(pages_1k, use_pandas_udf=False)
        .orderBy("url")
        .toPandas()
    )
    b = (
        exact_dup_assignments(pages_1k, use_pandas_udf=True)
        .orderBy("url")
        .toPandas()
    )
    assert a.equals(b)


def test_normalized_key_collapses_cheap_mutations(spark):
    """The normalization tier merges casing / punctuation / whitespace /
    counter mutations and nothing else; the key equals the pure-Python
    reference and is idempotent."""
    import hashlib
    import re

    from dedupe_algo_spark.functions.hashing import (
        normalized_for_dedup,
        normalized_sha256_col,
    )

    base = "Breaking News: storm hits Page 3 of 10 — details inside."
    variants = [
        base,
        base.upper(),
        "breaking   news!!! storm hits page 7 of 99 ... details inside",
        base.replace(" ", "\t  "),  # tab+space whitespace runs
    ]
    different = "Breaking News: calm weather on page 3 of 10 — details inside."
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(variants + [different])], "id int, text string"
    ).select("id", normalized_for_dedup(F.col("text")).alias("norm"),
             normalized_sha256_col(F.col("text")).alias("key"))
    out = df.toPandas().sort_values("id")
    assert out["key"].iloc[0] == out["key"].iloc[1] == out["key"].iloc[2] == out["key"].iloc[3]
    assert out["key"].iloc[4] != out["key"].iloc[0]

    def ref_norm(t):
        t = t.lower()
        t = re.sub(r"[0-9]", "0", t)
        t = re.sub(r"[^\w]+|_", " ", t, flags=re.UNICODE).strip()
        return re.sub(r"\s+", " ", t)

    assert out["norm"].iloc[0] == ref_norm(base)
    assert out["key"].iloc[0] == hashlib.sha256(ref_norm(base).encode()).hexdigest()
    # idempotence: normalizing a normalized string is a no-op
    twice = spark.createDataFrame([(out["norm"].iloc[0],)], "text string").select(
        normalized_for_dedup(F.col("text")).alias("n")
    ).collect()[0]["n"]
    assert twice == out["norm"].iloc[0]
