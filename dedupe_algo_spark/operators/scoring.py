"""Pair scoring — confirm stage for near-duplicate candidates.

Reference analog: pass 3's byte-compare-via-full-hash confirm
(lib.rs:130-160). For near-dups the confirm is a similarity score over
the candidate-pair DataFrame (north_star: batched Jaro-Winkler /
Levenshtein + MinHash-Jaccard).

Scale shape: pairs join texts twice (url_a, url_b) — two shuffles
against the (much smaller) representative table; scores are one
Arrow-batched UDF pass over the joined pairs. Exact dup pairs never
reach here (collapsed to representatives upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import pair_jaccard_udf

DEFAULT_THRESHOLD = 0.85


def score_pairs(
    pairs: DataFrame,
    texts: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """→ (url_a, url_b, score) for pairs with token-Jaccard ≥ threshold.

    ``texts`` must be (url, text) with one row per url (representatives).
    """
    ta = texts.select(F.col("url").alias("url_a"), F.col("text").alias("text_a"))
    tb = texts.select(F.col("url").alias("url_b"), F.col("text").alias("text_b"))
    joined = pairs.join(ta, "url_a").join(tb, "url_b")
    scored = joined.withColumn(
        "score", pair_jaccard_udf(F.col("text_a"), F.col("text_b"))
    )
    return scored.where(F.col("score") >= threshold).select("url_a", "url_b", "score")
