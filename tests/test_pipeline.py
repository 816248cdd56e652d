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


def test_default_run_writes_audit_lineage(spark, pages_1k, tmp_path, monkeypatch):
    """north_rule: lineage is NOT opt-in — a plain dedup_pipeline run
    (no checkpoint dir, no explicit hook) must leave per-stage audit
    rows."""
    from dedupe_algo_spark.sources.audit import AuditLog

    audit_dir = str(tmp_path / "audit")
    monkeypatch.setenv("DEDUPE_AUDIT_DIR", audit_dir)
    res = dedup_pipeline(pages_1k)
    res.clusters.count()
    audit = AuditLog(spark, audit_dir).read().toPandas()
    assert {"page_meta", "near_edges", "components"} <= set(audit["stage"])
    assert (audit["row_count"] >= 0).all()
    assert audit["run_id"].nunique() == 1
    res.unpersist()


def test_unpersist_releases_all_pipeline_blocks(spark, pages_1k):
    """VERDICT round-2 item 5: after consuming the result and calling
    unpersist(), no pipeline-created persisted RDDs (caches OR CC
    localCheckpoint blocks) may remain in the block manager."""
    from dedupe_algo_spark.tracking import persistent_rdd_ids

    pages_1k.count()  # fixture cache materialized before the snapshot
    before = persistent_rdd_ids(spark)
    res = dedup_pipeline(pages_1k)
    assert res.clusters.count() > 0
    assert res.edges.count() >= 0
    assert persistent_rdd_ids(spark) - before  # pipeline did persist things
    res.unpersist()
    assert persistent_rdd_ids(spark) - before == set()


def test_normalized_exact_key_merges_cheap_mutations(spark, pages_1k):
    """exact_key="normalized" pulls casing/punctuation/counter mutations
    into the EXACT tier (match_kind='exact' without any near tier),
    while raw mode leaves them unclustered at include_near=False; and on
    mutation-free input the two modes produce identical clusters (raw
    clusters never split under normalization)."""
    from pyspark.sql import Row

    base = "the quick brown fox jumped over the lazy dog " * 6
    mut = [
        ("https://m.example.com/a", base),
        ("https://m.example.com/b", base.upper()),
        ("https://m.example.com/c", base.replace(" ", " ... ") + "!!!"),
    ]
    extra = spark.createDataFrame(
        [
            Row(
                url=u,
                warc_ts=__import__("datetime").datetime(2026, 1, 1),
                html=b"",
                text=t,
                lang="en",
            )
            for u, t in mut
        ],
        pages_1k.schema,
    )
    pages = pages_1k.unionByName(extra)
    raw = dedup_pipeline(pages, include_near=False).clusters
    norm = dedup_pipeline(pages, include_near=False, exact_key="normalized").clusters
    muts = {u for u, _ in mut}
    assert raw.where(F.col("url").isin(*muts)).count() == 0
    got = norm.where(F.col("url").isin(*muts)).toPandas()
    assert set(got["url"]) == muts
    assert got["cluster_id"].nunique() == 1
    assert (got["match_kind"] == "exact").all()
    # coarsening-only: on the mutation-free corpus both modes agree
    a = dedup_pipeline(pages_1k, include_near=False).clusters.orderBy("url").toPandas()
    b = (
        dedup_pipeline(pages_1k, include_near=False, exact_key="normalized")
        .clusters.orderBy("url")
        .toPandas()
    )
    assert a[["url", "cluster_id"]].equals(b[["url", "cluster_id"]])


def test_pandas_hash_path_identical_clusters(spark, pages_1k):
    """use_pandas_udf_hash=True swaps the JVM sha2() meta scan for the
    Arrow-batched pandas hash UDF (the north_star's "SHA-256 content
    hashes computed in pandas UDF batches"); published hash values are
    identical either way, so the full near-dup pipeline must emit
    byte-identical clusters."""
    base = dedup_pipeline(pages_1k).clusters.orderBy("url").toPandas()
    pdh = (
        dedup_pipeline(pages_1k, use_pandas_udf_hash=True)
        .clusters.orderBy("url")
        .toPandas()
    )
    assert base.equals(pdh)


def test_estimate_only_tier2_matches_confirmed_on_synth(spark, pages_1k):
    """exact_confirm=False gates tier 2 on the 128-perm MinHash-Jaccard
    estimate instead of the exact token-set confirm. The synth corpus
    separates dups (J >> threshold) from distractors (J << threshold),
    so both tiers land the same clusters — the estimate path's softness
    only shows within ~1/sqrt(128) of the threshold."""
    base = dedup_pipeline(pages_1k).clusters.orderBy("url").toPandas()
    est = (
        dedup_pipeline(pages_1k, exact_confirm=False)
        .clusters.orderBy("url")
        .toPandas()
    )
    assert base[["url", "cluster_id"]].equals(est[["url", "cluster_id"]])
