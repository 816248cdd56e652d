"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dedup pipeline over pages derived from the
sf0.001 ``documents`` table unioned with the deterministic synthetic
pages (which carry planted duplicate structure). ``queries()`` /
``oracle_sql()`` — operator registry per SURVEY.md §2, implemented in
``dedupe_algo_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full exact+near dedup
    (blocking → hash cascade → pair scoring → connected components)."""
    from pyspark.sql import functions as F

    from dedupe_algo_spark.pipeline import dedup_pipeline
    from dedupe_algo_spark.synth import synth_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.col("text").cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    pages = doc_pages.unionByName(synth_pages(spark, 1000))
    return dedup_pipeline(pages).clusters


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedupe_algo_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedupe_algo_spark.queries import oracles

    return oracles()
