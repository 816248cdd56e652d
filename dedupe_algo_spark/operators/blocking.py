"""Pass-1 blocking — the cheap-key candidate pruning stage.

Reference: pass 1 buckets by file size and discards singleton buckets
before any I/O (lib.rs:54-64). Ours blocks by
``(length_bucket, registered_domain)`` (north_star pass 1), prunes
singleton blocks the same way, and salts hot keys so head domains don't
produce straggler partitions at 10^12 rows.

All shuffles here are on the block key; the singleton prune uses a
window count over the same partitioning Catalyst already created for the
key — one shuffle total, reused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import length_bucket
from ..functions.urls import registered_domain

MAX_BLOCK_ROWS = 20_000  # pair cap guard: 20k rows → ≤2·10^8 pairs per block


def block_key(text: Column, url: Column) -> Column:
    """Composite cheap key: length bucket + registered domain."""
    return F.concat_ws(
        "|", length_bucket(text).cast("string"), registered_domain(url)
    )


def with_block_key(pages: DataFrame, min_len: int = 10) -> DataFrame:
    """Project pages to dedup working set: min-length filter (reference
    F5, scanner.rs:186-189; default slider 50KB → ours a character floor)
    + block key column. Filters are plain predicates → pushed to scan."""
    return (
        pages.where(F.length("text") >= min_len)
        .withColumn("block_key", block_key(F.col("text"), F.col("url")))
    )


def prune_singleton_blocks(df: DataFrame, key: str | list[str] = "block_key") -> DataFrame:
    """Reference F7 (lib.rs:61-64,118-121,177-181): a block with one
    member can contain no duplicate pair. Window count over the block
    key — reuses the key's hash partitioning, no extra shuffle vs the
    groupBy+semi-join formulation, and no driver round-trip."""
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") >= 2)
        .drop("_n")
    )


def salted(df: DataFrame, key: str = "block_key", buckets: int = 16) -> DataFrame:
    """Append a salt to hot keys for shuffle-balance-sensitive stages
    (hash confirm, scoring). Exact-dup grouping is salt-safe because the
    content hash refines the block key; for pair generation use
    ``candidates.candidate_pairs`` which handles hot blocks explicitly."""
    return df.withColumn(
        "salted_key",
        F.concat_ws("#", F.col(key), (F.crc32(F.col("url")) % buckets).cast("string")),
    )
