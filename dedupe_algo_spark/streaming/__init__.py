"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9); its only stream-shaped
artifacts are the throttled progress events (lib.rs:86-94) and the 30s
drive poll (useDrives.ts:19). This module provides the web-scale
analogs as real Structured Streaming jobs:

* ``progress_stream`` — watermarked tumbling-window counts per stage
  over an append-only event stream: the durable, queryable version of
  ProgressPayload (current/total/file → stage/count/window).
* ``ingest_pages_stream`` — incremental page ingestion: a file-source
  stream over a pages directory with the same min-length filter and
  map-side hash projection the batch pipeline uses, so new data can be
  hashed as it lands and merged into the memo (the streaming face of
  the reference's incremental cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import partial_sha256_col, sha256_col
from ..schemas import PAGES_SCHEMA

PROGRESS_EVENT_SCHEMA = "ts timestamp, run_id string, stage string, n long"


def progress_stream(
    spark: SparkSession,
    source_dir: str,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Windowed per-stage progress counts with late-data watermarking —
    the durable analog of the reference's throttled progress emitter."""
    raw = (
        spark.readStream.schema(PROGRESS_EVENT_SCHEMA)
        .json(source_dir)
    )
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "run_id", "stage")
        .agg(F.sum("n").alias("rows_done"))
        .select(
            F.col("window.start").alias("window_start"),
            "run_id",
            "stage",
            "rows_done",
        )
    )


def ingest_pages_stream(
    spark: SparkSession, source_dir: str, min_len: int = 10
) -> DataFrame:
    """Streaming page ingestion with the batch pipeline's projection:
    filter + map-side partial/full hash (F5 + C1/C2 as a stream)."""
    raw = spark.readStream.schema(PAGES_SCHEMA).parquet(source_dir)
    return (
        raw.where(F.length("text") >= min_len)
        .select(
            "url",
            "warc_ts",
            F.length("text").cast("long").alias("text_len"),
            partial_sha256_col(F.col("text")).alias("partial_hash"),
            sha256_col(F.col("text")).alias("content_sha256"),
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    timeout_sec: float = 60.0,
    output_mode: str = "append",
):
    """Drive a stream into an in-memory sink until idle (test helper).
    Aggregated streams need ``output_mode='complete'`` (append would wait
    for the watermark to close each window)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
