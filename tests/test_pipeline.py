"""End-to-end golden test: planted ground truth → pairwise F1 ≥ 0.99
(BASELINE.json north_rule) + determinism and resume invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.pipeline import dedup_pipeline, pairwise_f1


@pytest.fixture(scope="module")
def result(pages_1k):
    res = dedup_pipeline(pages_1k)
    res.clusters.cache().count()
    return res


def test_pairwise_f1_gate(result, labels_1k):
    m = pairwise_f1(result.clusters, labels_1k)
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m


def test_exact_only_pipeline_matches_exact_labels(pages_1k, labels_1k):
    res = dedup_pipeline(pages_1k, include_near=False)
    m = pairwise_f1(res.clusters, labels_1k.where(F.col("kind") != "near"))
    assert m["f1"] >= 0.99, m


def test_row_order_permutation_invariance(spark, pages_1k, result):
    shuffled = pages_1k.orderBy(F.rand(seed=123))
    res2 = dedup_pipeline(shuffled)
    a = result.clusters.orderBy("url").toPandas()
    b = res2.clusters.orderBy("url").toPandas()
    assert a.equals(b)


def test_every_clustered_url_is_input_url(pages_1k, result):
    extra = result.clusters.join(pages_1k.select("url"), "url", "left_anti")
    assert extra.count() == 0


def test_adding_nondup_rows_never_splits_clusters(spark, pages_1k, result):
    from dedupe_algo_spark.synth import synth_pages

    # append pages from a disjoint index range (deterministic, non-dup
    # against the first 1k by construction of per-index randomness)
    more = synth_pages(spark, 1300).where(
        F.col("url").substr(-10, 10).cast("long") >= 1200
    )
    res2 = dedup_pipeline(pages_1k.unionByName(more))
    base = result.clusters.select("url", "cluster_id")
    new = res2.clusters.select("url", F.col("cluster_id").alias("cid2"))
    j = base.join(new, "url", "inner").toPandas()
    # same-cluster relations among original urls must be preserved
    import pandas as pd

    g1 = j.groupby("cluster_id")["url"].apply(frozenset)
    g2 = j.groupby("cid2")["url"].apply(frozenset)
    assert set(g1) == set(g2)


def test_checkpoint_resume_equals_cold_run(spark, pages_1k, tmp_path):
    from dedupe_algo_spark.runner import run_dedup_checkpointed

    wd = str(tmp_path / "run1")
    cold, run1 = run_dedup_checkpointed(spark, pages_1k, wd)
    cold_pdf = cold.orderBy("url").toPandas()
    assert run1.computed and not run1.resumed

    warm, run2 = run_dedup_checkpointed(spark, pages_1k, wd)
    warm_pdf = warm.orderBy("url").toPandas()
    assert cold_pdf.equals(warm_pdf)
    assert "clusters" in run2.resumed and not run2.computed

    # audit rows exist for every computed stage with non-negative counts
    audit = run1.audit.read().toPandas()
    assert set(run1.computed) <= set(audit["stage"])
    assert (audit["row_count"] >= 0).all()
