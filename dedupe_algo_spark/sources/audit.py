"""Audit / lineage table — per-stage per-partition metrics rows.

Generalizes the reference's throttled progress events
(ProgressPayload, lib.rs:23-28, emits at lib.rs:86-94,132-139) into
durable lineage rows per north_rule: every pipeline stage appends
(run_id, stage, partition_id, row_count, pair_count, elapsed_ms) to an
append-only table. Counts are gathered with ``mapInPandas`` per
partition — one row per partition per stage, never per input row (the
reference throttles for the same reason).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import AUDIT_SCHEMA


def new_run_id() -> str:
    return uuid.uuid4().hex[:16]


def partition_counts(
    df: DataFrame, run_id: str, stage: str, elapsed_ms: int = 0
) -> DataFrame:
    """→ AUDIT_SCHEMA rows, one per partition of ``df``. Uses
    ``spark_partition_id`` + groupBy — a map-side partial agg, one
    shuffle of (n_partitions) rows."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("row_count"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("_pid").cast("int").alias("partition_id"),
            F.lit(None).cast("string").alias("block_id"),
            F.col("row_count").cast("long"),
            F.lit(None).cast("long").alias("pair_count"),
            F.lit(elapsed_ms).cast("long").alias("elapsed_ms"),
            F.current_timestamp().alias("committed_at"),
        )
    )


DEFAULT_AUDIT_DIR_ENV = "DEDUPE_AUDIT_DIR"


def default_audit_dir() -> str:
    return os.environ.get(
        DEFAULT_AUDIT_DIR_ENV,
        os.path.join(os.getcwd(), "spark-warehouse", "dedupe_audit"),
    )


def audit_stage_hook(spark: SparkSession, tracker=None, audit=None, run_id=None):
    """The default ``stage`` hook for ``dedup_pipeline``: every stage
    writes lineage rows (north_rule — lineage is not opt-in). Each stage
    output is persisted (registered on ``tracker`` when given), counted
    per-partition ONCE driver-side (the action that materializes the
    cache — later consumers hit the cache, so the audit pass adds no
    recompute), and its rows+elapsed appended to the audit table at
    ``$DEDUPE_AUDIT_DIR`` (default ``./spark-warehouse/dedupe_audit``).

    Contrast ``runner.CheckpointedRun.stage``, which additionally
    commits each stage's output to a resumable parquet snapshot."""
    log = audit or AuditLog(spark, default_audit_dir())
    rid = run_id or new_run_id()

    def stage(name: str, fn) -> DataFrame:
        t0 = time.time()
        df = fn()
        if tracker is not None:
            tracker.persist(df)
        else:
            df.persist()
        counts = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("row_count"))
            .collect()
        )
        elapsed_ms = int((time.time() - t0) * 1000)
        rows = [
            (rid, name, int(r["_pid"]), None, int(r["row_count"]), None, elapsed_ms)
            for r in counts
        ] or [(rid, name, 0, None, 0, None, elapsed_ms)]
        log.append(
            spark.createDataFrame(
                rows,
                "run_id string, stage string, partition_id int, block_id string,"
                " row_count long, pair_count long, elapsed_ms long",
            ).withColumn("committed_at", F.current_timestamp())
        )
        return df

    stage.run_id = rid
    stage.audit = log
    return stage


class AuditLog:
    """Append-only parquet audit table (Iceberg append in a catalog
    deployment)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self.path)

    def record_stage(
        self, df: DataFrame, run_id: str, stage: str, elapsed_ms: int = 0
    ) -> None:
        self.append(partition_counts(df, run_id, stage, elapsed_ms))

    def read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], AUDIT_SCHEMA)

    def stages_of(self, run_id: str) -> list[str]:
        return [
            r["stage"]
            for r in self.read().where(F.col("run_id") == run_id).select("stage").distinct().collect()
        ]
