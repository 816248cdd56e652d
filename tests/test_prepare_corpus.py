"""End-to-end corpus-preparation job (jobs/prepare_corpus_job.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.prepare_corpus_job import prepare


def test_prepare_end_to_end(spark):
    """The six-stage chain runs on 400 synthetic pages: lineage is
    monotone through the cutting stages, the output carries the mixing
    columns, the planted eval doc is decontaminated away, and the kept
    urls are unique. (Per-stage determinism is pinned by the dedicated
    operator tests; this is the composition test.)"""
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 400).cache()
    # eval corpus: a 10-token slice of one page → that page (and its
    # exact duplicates) must be dropped by decontamination
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ev = (
        pages.orderBy("url")
        .limit(1)
        .select(F.concat_ws(" ", F.slice(toks, 5, 14)).alias("text"))
    )
    contaminated_url = pages.orderBy("url").limit(1).collect()[0]["url"]

    mixed, lineage, release = prepare(
        spark,
        pages,
        eval_docs=ev,
        contam_ngram=10,
        rates={},
        default_rate=1.0,
        fractions={"train": 0.8, "valid": 0.1, "test": 0.1},
        seed=5,
    )
    out = mixed.toPandas()
    release()
    pages.unpersist()

    assert lineage["input"] == 400
    assert lineage["url_dedup"] <= lineage["input"]
    assert lineage["quality_gate"] <= lineage["url_dedup"]
    assert lineage["content_dedup"] < lineage["quality_gate"]  # planted dups
    assert lineage["decontam"] < lineage["content_dedup"]  # planted eval hit
    assert len(out) == lineage["decontam"]  # default rate 1.0 keeps all

    assert {"url", "text", "lang", "sample_weight", "split"} <= set(out.columns)
    assert set(out["split"]) <= {"train", "valid", "test"}
    assert (out["sample_weight"] == 1.0).all()
    assert contaminated_url not in set(out["url"])
    # every surviving url is unique (dedup + keeper selection)
    assert out["url"].is_unique
