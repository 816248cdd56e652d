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
    writes lineage rows (north_rule — lineage is not opt-in).

    Deferred design, so lineage costs no extra pass over the data: at
    stage time the output is only persisted (registered on ``tracker``
    when given) and queued; ``stage.flush()`` — called by the pipeline
    once its own actions have materialized every stage cache — unions
    all queued per-partition count frames into ONE job over the caches
    and ONE append to the audit table at ``$DEDUPE_AUDIT_DIR`` (default
    ``./spark-warehouse/dedupe_audit``). An eager per-stage count here
    measured ~3.4s extra per 200k-page run; the deferred batch is one
    cache-speed job. ``elapsed_ms`` is the wall clock from a stage's
    invocation to the next stage's (or the flush) — in a lazily built
    pipeline stage compute interleaves with its consumer's action, so
    per-stage attribution is inherently approximate.

    Contrast ``runner.CheckpointedRun.stage``, which instead commits
    each stage's output to a resumable parquet snapshot (its write is
    the materialization, so it records exact per-stage timings)."""
    log = audit or AuditLog(spark, default_audit_dir())
    rid = run_id or new_run_id()
    pending: list[list] = []  # [name, df, t_called, known_rows]

    def stage(name: str, fn) -> DataFrame:
        df = fn()
        # Driver-built results (e.g. the union-find's parallelize-backed
        # component map) carry their row count; counting them with a
        # Spark job would re-ship every row from the driver (measured
        # 19s at 4M pages) for a number we already hold. They are also
        # not persisted: their one consumer reads them once.
        known = getattr(df, "_dedupe_known_rows", None)
        if known is None:
            if tracker is not None:
                tracker.persist(df)
            else:
                df.persist()
        pending.append([name, df, time.time(), known])
        return df

    def flush() -> None:
        if not pending:
            return
        t_end = time.time()
        out = None
        for i, (name, df, t0, known) in enumerate(pending):
            t1 = pending[i + 1][2] if i + 1 < len(pending) else t_end
            ms = int((t1 - t0) * 1000)
            if known is not None:
                pc = spark.range(1).select(
                    F.lit(rid).alias("run_id"),
                    F.lit(name).alias("stage"),
                    F.lit(-1).cast("int").alias("partition_id"),
                    F.lit(None).cast("string").alias("block_id"),
                    F.lit(int(known)).cast("long").alias("row_count"),
                    F.lit(None).cast("long").alias("pair_count"),
                    F.lit(ms).cast("long").alias("elapsed_ms"),
                    F.current_timestamp().alias("committed_at"),
                )
            else:
                pc = partition_counts(df, rid, name, elapsed_ms=ms)
            out = pc if out is None else out.unionByName(pc)
        pending.clear()
        log.append(out)

    stage.run_id = rid
    stage.audit = log
    stage.flush = flush
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
