"""Exact-duplicate cascade — the reference's flagship ``start_scan`` query.

Reference 3-pass design (lib.rs:30-182):
  pass 1  group by size, drop singletons          (lib.rs:54-64)
  pass 2  partial hash (16KB head+tail), regroup  (lib.rs:83-121)
  pass 3  full hash, final groups of ≥2           (lib.rs:130-181)

Spark re-design, NOT a translation:

* The reference's pass 1 (size-only grouping) exists to avoid disk reads;
  it pays off because u64 byte sizes are high-cardinality. At 10^12 text
  rows, char-length cardinality (~10^4) would put ~10^8 rows behind each
  window key — a guaranteed hot shuffle. We therefore *fuse* pass 1 into
  pass 2: the partial hash is computed map-side (zero shuffle, 16KB
  window) and the first shuffle is on the well-distributed
  ``(text_len, partial_hash)`` key. Same pruning semantics, one less
  shuffle, no hot keys.
* Hashes are built-in ``sha2`` (JVM, whole-stage codegen) by default;
  the pandas-UDF variants (north_star mandate) are switchable and
  digest-identical.
* Singleton pruning is a window count over the grouping key — the window
  reuses the shuffle partitioning the key already needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    partial_sha256_col,
    partial_sha256_udf,
    sha256_col,
    sha256_udf,
)
from .blocking import prune_singleton_blocks


def exact_dup_assignments(
    pages: DataFrame,
    min_len: int = 10,
    use_pandas_udf: bool = False,
    keep_singletons: bool = False,
) -> DataFrame:
    """→ (url, text_len, content_sha256, cluster_id, cluster_size).

    ``cluster_id`` = min(url) within the (text_len, sha256) group —
    deterministic under any row order. With ``keep_singletons`` the
    output covers every input row (used by the near-dup path to collapse
    exact groups to one representative before pair generation).
    """
    partial = partial_sha256_udf(F.col("text")) if use_pandas_udf else partial_sha256_col(F.col("text"))
    full = sha256_udf(F.col("text")) if use_pandas_udf else sha256_col(F.col("text"))

    df = (
        pages.where(F.length("text") >= min_len)
        .select(
            "url",
            F.length("text").cast("long").alias("text_len"),
            F.col("text"),
        )
        .withColumn("partial_hash", partial)  # map-side, no shuffle
    )
    # fused pass 1+2: prune blocks that cannot contain an exact pair.
    # (Skipped when singletons are requested — the prune is purely a
    # compute gate for the dup-only output, not a semantic filter.)
    survivors = (
        df
        if keep_singletons
        else prune_singleton_blocks(df, key=["text_len", "partial_hash"])
    )
    # pass 3: full hash on survivors only (the expensive compute is gated
    # behind the cheap prune, like the reference's full-read gating)
    hashed = survivors.withColumn("content_sha256", full).drop("partial_hash")
    w = Window.partitionBy("text_len", "content_sha256")
    out = (
        hashed.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("cluster_id", F.min("url").over(w))
        .drop("text")
    )
    if not keep_singletons:
        out = out.where(F.col("cluster_size") >= 2)
    return out


def exact_dup_groups(pages: DataFrame, min_len: int = 10) -> DataFrame:
    """Nested ScanResult-shaped view (reference lib.rs:18-21):
    one row per cluster with the member list collected. Only for
    human-scale result sets — at 10^12 rows keep the flat assignment."""
    flat = exact_dup_assignments(pages, min_len=min_len)
    return (
        flat.groupBy("cluster_id", "text_len", "content_sha256")
        .agg(
            F.sort_array(F.collect_list("url")).alias("urls"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
