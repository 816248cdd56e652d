"""Hash memo — the incremental-computation ledger.

Reference: SQLite ``scan_cache`` keyed by path, validated by
(size, modified), with COALESCE keep-old-hash upsert semantics
(cache.rs:19-77); prefetched once before the parallel region
(lib.rs:70-74).

Ours: a parquet-backed table (Iceberg ``MERGE INTO`` in a catalog-enabled
deployment — the runtime here has no Iceberg jar, so the same MERGE
semantics are implemented as join + coalesce + atomic directory swap;
the interface is storage-agnostic). The validity join (J1) reuses a
memoized hash only when BOTH text_len and warc_ts match
(lib.rs:97-105,142-147); the upsert never overwrites a non-null hash
with null (cache.rs:69-70).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MEMO_SCHEMA

MEMO_KEY = "url"
VALIDITY = ["text_len", "warc_ts"]
HASHES = ["partial_hash", "content_sha256"]


class HashMemo:
    """Parquet-backed memo with MERGE-upsert semantics, sharded by
    ``hash(url) % n_shards`` so an upsert rewrites only the shards its
    keys fall in — O(updates)-sized I/O, not O(memo). On Iceberg the
    same statement is a ``MERGE INTO`` against a table partitioned the
    same way (partition-level commit = our per-shard directory swap)."""

    def __init__(self, spark: SparkSession, path: str, n_shards: int = 16):
        self.spark = spark
        self.path = path
        self.n_shards = n_shards

    def _sharded(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "shard",
            F.pmod(F.xxhash64(MEMO_KEY), F.lit(self.n_shards)).cast("int"),
        )

    def read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path).select(
                *MEMO_SCHEMA.fieldNames()
            )
        return self.spark.createDataFrame([], MEMO_SCHEMA)

    def upsert(self, updates: DataFrame) -> None:
        """S4 — ``INSERT ... ON CONFLICT(url) DO UPDATE`` with COALESCE
        keep-old semantics (cache.rs:60-77): new row wins on (len, ts);
        a null incoming hash never clobbers a stored one. Only the
        touched shards are read (partition pruning on the shard column)
        and rewritten; untouched shards are never opened."""
        u = self._sharded(updates.select(*MEMO_SCHEMA.fieldNames()))
        if not os.path.exists(self.path):
            u.write.partitionBy("shard").parquet(self.path)
            return
        touched = sorted(
            r["shard"] for r in u.select("shard").distinct().collect()
        )
        cur = (
            self.spark.read.parquet(self.path)
            .where(F.col("shard").isin(touched))
            .select(*MEMO_SCHEMA.fieldNames())
        )
        merged = (
            u.drop("shard")
            .alias("n")
            .join(cur.alias("o"), MEMO_KEY, "full_outer")
            .select(
                F.col(MEMO_KEY),
                F.coalesce(F.col("n.text_len"), F.col("o.text_len")).alias("text_len"),
                F.coalesce(F.col("n.warc_ts"), F.col("o.warc_ts")).alias("warc_ts"),
                F.coalesce(F.col("n.partial_hash"), F.col("o.partial_hash")).alias(
                    "partial_hash"
                ),
                F.coalesce(
                    F.col("n.content_sha256"), F.col("o.content_sha256")
                ).alias("content_sha256"),
            )
        )
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        self._sharded(merged).write.partitionBy("shard").mode("overwrite").parquet(tmp)
        for k in touched:
            src = os.path.join(tmp, f"shard={k}")
            dst = os.path.join(self.path, f"shard={k}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
        shutil.rmtree(tmp)

    def clear(self) -> None:
        """S5 — DELETE FROM scan_cache (cache.rs:79-84)."""
        if os.path.exists(self.path):
            shutil.rmtree(self.path)


def validity_join(pages_meta: DataFrame, memo: DataFrame) -> DataFrame:
    """J1 — left join pages↔memo on url; a memoized hash is ``reused_*``
    only when text_len AND warc_ts both match (stale ⇒ null ⇒ caller
    recomputes). Mirrors lib.rs:97-105. ``pages_meta`` needs
    (url, text_len, warc_ts)."""
    m = memo.select(
        F.col("url"),
        F.col("text_len").alias("m_len"),
        F.col("warc_ts").alias("m_ts"),
        F.col("partial_hash").alias("m_partial"),
        F.col("content_sha256").alias("m_sha"),
    )
    valid = (F.col("text_len") == F.col("m_len")) & (
        F.col("warc_ts") == F.col("m_ts")
    )
    return (
        pages_meta.join(m, "url", "left")
        .withColumn("reused_partial", F.when(valid, F.col("m_partial")))
        .withColumn("reused_sha256", F.when(valid, F.col("m_sha")))
        .drop("m_len", "m_ts", "m_partial", "m_sha")
    )
