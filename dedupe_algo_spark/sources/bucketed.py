"""Bucketed corpus tables — exchange-free incremental dedup joins.

The 100 TB operating mode for incremental ingest is: a huge, mostly
static *seen-corpus* table (url / content_sha256 of everything already
accepted) joined against each small new batch.  A plain join shuffles
BOTH sides on every run — at 10^12 rows that re-shuffles the corpus
daily for no reason.  Writing the corpus ONCE as a Hive-bucketed table
(`bucketBy(n, key).sortBy(key)`) pins its physical layout to the join
key; Catalyst then plans corpus-side joins with **zero Exchange on the
bucketed side** — only the new batch (the small side) shuffles, into
the corpus's existing bucket scheme.

This is the storage-layout counterpart of sources/memo.py (which owns
snapshot/upsert semantics): memo answers "what have we seen", bucketed
answers "join against it without moving it".  Reference parity: the
reference's cache table (cache.rs) is keyed by path for exactly this
reuse-without-rescan purpose; bucketing is the Spark-native expression
of that contract at cluster scale.

Bucket count: at 10^12 rows target ~128 MB per bucket-file per
partition — thousands of buckets; the default 64 here is sized for the
test/bench corpora (the writer takes it as a parameter; changing it
requires a rewrite, as with any bucketed store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed+sorted on ``key``.

    ``path`` makes it an external table (tests point this at a tmp dir;
    a real deployment points it at the corpus location). Sorting within
    buckets makes corpus-side merge joins sort-free too.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """The bucketed corpus as a DataFrame (bucket metadata rides along
    from the catalog — a plain ``spark.read.parquet`` of the same files
    would NOT carry it, and every join would shuffle again)."""
    return spark.table(name)


def incremental_unseen(
    batch: DataFrame, corpus: DataFrame, key: str = "content_sha256"
) -> DataFrame:
    """Rows of ``batch`` whose ``key`` is absent from the seen-corpus —
    a left-anti join that, when ``corpus`` is a bucketed table on
    ``key``, shuffles ONLY the batch (asserted by test_bucketed)."""
    return batch.join(corpus.select(key), on=key, how="left_anti")


def incremental_seen_lookup(
    batch: DataFrame, corpus: DataFrame, key: str = "content_sha256"
) -> DataFrame:
    """Inner lookup variant: batch rows annotated with their existing
    corpus assignment (columns of ``corpus`` prefixed ``corpus_``)."""
    right = corpus.select(
        *[
            (  # keep the join key un-prefixed; prefix the payload
                corpus[c] if c == key else corpus[c].alias(f"corpus_{c}")
            )
            for c in corpus.columns
        ]
    )
    return batch.join(right, on=key, how="inner")
