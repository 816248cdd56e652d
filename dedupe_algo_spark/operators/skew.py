"""Skew-taming helpers — explicit salting for hot keys (north_rule).

AQE's skew-join splitting (enabled in session.py) handles most runtime
imbalance; these helpers cover the two places where *explicit* salting
is the right structure at 10^12 rows:

* ``salted_agg`` — two-phase aggregation: partial agg on (key, salt),
  final agg on key. Identical results to a direct groupBy for any
  associative-commutative aggregate; the hot key's rows spread over
  ``buckets`` reducers in phase 1. (Spark's hash aggregate already does
  map-side partial agg; explicit salting additionally splits the
  *reduce* side, which matters when one key exceeds a single reducer.)
* ``salted_key`` — appends a deterministic salt for co-partitioning
  stages that follow a hot blocking key (the candidate self-join itself
  uses the hot-bucket cap + AQE, candidates.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_key(df: DataFrame, key: str, id_col: str, buckets: int = 16) -> DataFrame:
    """(key, salt) composite: deterministic per row (crc32 of the row id
    — NOT random, so retries/resumes see identical partitioning)."""
    return df.withColumn(
        "salt", (F.crc32(F.col(id_col).cast("string")) % buckets).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    id_col: str,
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation. ``aggs`` maps output column →
    ("sum"|"count"|"min"|"max", input column). Results are exactly equal
    to ``df.groupBy(key).agg(...)``."""
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn}")
    salted = salted_key(df, key, id_col, buckets)
    partial = salted.groupBy(key, "salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnostic: the heaviest keys with share-of-total — feeds the
    audit table so hot-domain drift is visible across runs."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return (
        counts.orderBy(F.desc("n"), key)
        .limit(top)
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
    )
