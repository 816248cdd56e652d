"""Structured Streaming analogs: progress windows + incremental ingest."""

from __future__ import annotations

import json

import pytest

from dedupe_algo_spark.streaming import (
    ingest_pages_stream,
    progress_stream,
    run_to_memory,
)


def test_progress_stream_windows(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01 00:00:01", "run_id": "r1", "stage": "hash", "n": 5},
        {"ts": "2026-01-01 00:00:03", "run_id": "r1", "stage": "hash", "n": 7},
        {"ts": "2026-01-01 00:00:15", "run_id": "r1", "stage": "score", "n": 2},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    out = progress_stream(spark, str(src))
    run_to_memory(out, "progress_t", output_mode="complete")
    pdf = spark.sql("select * from progress_t").toPandas()
    got = {(r["stage"]): r["rows_done"] for _, r in pdf.iterrows()}
    assert got == {"hash": 12, "score": 2}


def test_ingest_pages_stream_hashes(spark, tmp_path):
    from dedupe_algo_spark.synth import synth_pages

    src = tmp_path / "pages"
    synth_pages(spark, 100).write.parquet(str(src))
    out = ingest_pages_stream(spark, str(src))
    run_to_memory(out, "ingest_t")
    pdf = spark.sql("select * from ingest_t").toPandas()
    assert len(pdf) == 100
    assert pdf["content_sha256"].notna().all()
    # streaming hash identical to batch hash for the same rows
    from pyspark.sql import functions as F

    from dedupe_algo_spark.functions.hashing import sha256_col

    batch = (
        spark.read.parquet(str(src))
        .select("url", sha256_col(F.col("text")).alias("h"))
        .toPandas()
        .set_index("url")["h"]
    )
    for _, r in pdf.iterrows():
        assert batch[r["url"]] == r["content_sha256"]
