"""Bucketed corpus tables (sources/bucketed.py): correctness of the
incremental joins AND the load-bearing plan property — the bucketed
corpus side joins with ZERO Exchange (only the new batch shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.plans import formatted_plan
from dedupe_algo_spark.sources.bucketed import (
    incremental_seen_lookup,
    incremental_unseen,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = spark.range(0, 1000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        F.concat(F.lit("https://c/"), F.col("id").cast("string")).alias("url"),
    )
    path = str(tmp_path_factory.mktemp("bucketed") / "seen_corpus")
    write_bucketed(df, "seen_corpus_test", key="content_sha256", buckets=8, path=path)
    yield read_bucketed(spark, "seen_corpus_test")
    spark.sql("DROP TABLE IF EXISTS seen_corpus_test")


def _batch(spark, lo, hi):
    # ids lo..hi, half overlapping the corpus (corpus holds 0..999)
    return spark.range(lo, hi).select(
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        F.col("id").alias("batch_id"),
    )


def test_unseen_semantics(spark, corpus):
    batch = _batch(spark, 990, 1010)  # 990-999 seen, 1000-1009 unseen
    got = sorted(r["batch_id"] for r in incremental_unseen(batch, corpus).collect())
    assert got == list(range(1000, 1010))


def test_seen_lookup_semantics(spark, corpus):
    batch = _batch(spark, 995, 1005)
    out = incremental_seen_lookup(batch, corpus).collect()
    assert sorted(r["batch_id"] for r in out) == list(range(995, 1000))
    assert all(r["corpus_url"] == f"https://c/{r['batch_id']}" for r in out)


@pytest.mark.parametrize(
    "join_fn", [incremental_unseen, incremental_seen_lookup], ids=["anti", "inner"]
)
def test_corpus_side_never_shuffles(spark, corpus, join_fn):
    """The point of the layout: the (huge) corpus scan feeds the join
    directly — no Exchange above it. The batch side shuffles into the
    corpus's bucket scheme (exactly one Exchange in the whole plan)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import re

        batch = _batch(spark, 0, 100)
        plan = formatted_plan(join_fn(batch, corpus))
        n_exchange = sum(
            1
            for line in plan.splitlines()
            if re.match(r"\(\d+\) Exchange", line.strip())
        )
        assert "SortMergeJoin" in plan
        assert n_exchange == 1, plan
        # and that single exchange hashes the BATCH side's scan, not the
        # bucketed corpus scan: the corpus scan reports its buckets
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_roundtrip_preserves_rows(spark, corpus):
    assert corpus.count() == 1000
    assert corpus.select("content_sha256").distinct().count() == 1000
