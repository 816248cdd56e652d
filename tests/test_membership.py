"""Bloom membership gate (operators/membership.py): exactness of the
bloom-reduced anti-join, the no-false-negative invariant, gate
selectivity near the design fpp, deterministic bits, and the plan
property — the probe is ONE Arrow-batched pandas UDF (no per-row
Python) over JVM-computed positions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.operators.membership import (
    KeyBloom,
    bloom_plan,
    build_key_bloom,
    incremental_unseen_bloom,
)
from dedupe_algo_spark.sources.bucketed import incremental_unseen


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(
        F.sha2(F.col("id").cast("string"), 256).alias(name)
    )


def test_bloom_plan_sizing():
    m, k = bloom_plan(1000, 0.01)
    # textbook optimum: ~9.585 bits/key, k ~ 7 at 1% fpp
    assert 9_000 < m < 10_000 and k == 7
    # degenerate inputs stay well-formed
    m0, k0 = bloom_plan(0, 0.5)
    assert m0 >= 64 and k0 >= 1
    with pytest.raises(ValueError):
        bloom_plan(10, 0.0)


def test_no_false_negatives(spark):
    batch = _keys(spark, 0, 500)
    bloom = build_key_bloom(batch, "k", fpp=0.01)
    hits = batch.where(bloom.might_contain(F.col("k"))).count()
    assert hits == 500  # every inserted key must probe positive


def test_gate_selectivity_and_fpp_estimate(spark):
    batch = _keys(spark, 0, 500)
    bloom = build_key_bloom(batch, "k", fpp=0.001)
    # 10k disjoint keys: false-positive rate should be near design fpp
    foreign = _keys(spark, 10_000, 20_000)
    fp = bloom.gate(foreign, "k").count()
    assert fp <= 10_000 * 0.001 * 20 + 5  # generous bound, catches misbuilds
    assert bloom.fpp_estimate < 0.01


def test_unseen_bloom_matches_exact(spark):
    corpus = spark.range(0, 1000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        F.concat(F.lit("https://c/"), F.col("id").cast("string")).alias("url"),
    )
    batch = spark.range(980, 1050).select(
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        F.col("id").alias("batch_id"),
    )
    got = incremental_unseen_bloom(batch, corpus)
    want = incremental_unseen(batch, corpus)
    assert sorted(r.batch_id for r in got.collect()) == sorted(
        r.batch_id for r in want.collect()
    ) == list(range(1000, 1050))


def test_bits_deterministic(spark):
    batch = _keys(spark, 0, 300)
    b1 = build_key_bloom(batch, "k", expected_items=300)
    b2 = build_key_bloom(batch.repartition(7), "k", expected_items=300)
    assert b1.m == b2.m and b1.k == b2.k
    assert np.array_equal(b1.bits, b2.bits)


def test_probe_is_single_arrow_udf(spark):
    batch = _keys(spark, 0, 100)
    bloom = build_key_bloom(batch, "k", expected_items=100)
    plan = (
        bloom.gate(_keys(spark, 0, 1000), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # pandas UDF, Arrow transport
    assert "BatchEvalPython" not in plan  # never a per-row Python UDF
    assert plan.count("ArrowEvalPython") == 1


def test_empty_batch_gate(spark):
    batch = _keys(spark, 0, 0)
    bloom = build_key_bloom(batch, "k")
    assert isinstance(bloom, KeyBloom)
    # nothing was inserted: the gate should pass ~nothing through
    assert bloom.gate(_keys(spark, 0, 1000), "k").count() <= 1
