"""Candidate-pair generation — the quadratic stage, kept sub-quadratic.

The reference never materializes pairs (its groups ARE the duplicates);
near-dup generalization needs a within-block self-join (SURVEY.md §2.4:
"ours adds one at scale"). Design rules for 10^12 rows:

1. **Collapse exact duplicates first.** Pair generation runs on one
   representative per distinct text (the exact-dup assignment provides
   the mapping), so a 10^6-copy boilerplate page contributes one node,
   not 10^12 pairs. This is the single biggest scale lever.
2. **Multi-path bucketing, one unioned bucket table.** A page emits one
   bucket row per blocking path: the cheap key (length bucket ×
   registered domain) and each MinHash LSH band. Equal bucket key ⇒
   candidate. Paths union into one (bucket_key, url) table so the
   self-join happens once.
3. **Hot-bucket cap.** Buckets larger than ``max_bucket`` are dropped
   (logged via the returned stats, audit-visible) — a 50k-row bucket
   means the key carries no discriminating power (e.g. an empty-ish
   boilerplate band) and would emit 10^9 junk pairs. AQE skew-join
   handles residual imbalance.
4. **Pair dedup by (url_a, url_b)** with ``url_a < url_b`` so each
   unordered pair is scored once no matter how many buckets it fell in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import minhash_band_keys_udf, minhash_bands_col
from ..functions.simhash import simhash64_udf, simhash_bands
from .blocking import block_key

DEFAULT_MAX_BUCKET = 2_000


def bucket_table_from_sigs(sigs: DataFrame) -> DataFrame:
    """→ (bucket_key:long, url) from a precomputed (url, sig) table.
    Band keys are JVM-side xxhash64 over signature slices — the whole
    bucketing is codegen, no Python, and the exploded rows carry only
    (long, url): the narrowest possible self-join input."""
    return sigs.select(
        F.explode(minhash_bands_col(F.col("sig"))).alias("bucket_key"), "url"
    )


def bucket_table_from_bands(bands: DataFrame) -> DataFrame:
    """→ (bucket_key:long, url) from a precomputed (url, bands) table —
    the band keys were already folded in the signature UDF
    (minhash_band_keys_udf), so bucketing is a bare explode."""
    return bands.select(F.explode("bands").alias("bucket_key"), "url")


def bucket_table(
    working: DataFrame,
    use_minhash: bool = True,
    use_simhash: bool = False,
    use_cheap_key: bool = True,
) -> DataFrame:
    """→ (bucket_key, url). ``working`` needs (url, text) columns.

    Every path projects its (bucket_key, url) rows map-side directly on
    the scan partitions — signature UDFs first, banding JVM-side via
    ``bucket_table_from_sigs`` — so no Exchange below the self-join ever
    carries the text column (the text-never-shuffles invariant, asserted
    by test_plans via plans.exchange_columns). A single-path call keeps
    its native key type (minhash band keys stay slim longs); multi-path
    calls cast to string for the union.
    """
    paths = []
    if use_minhash:
        bands = working.select(
            "url", minhash_band_keys_udf(F.col("text")).alias("bands")
        )
        paths.append(bucket_table_from_bands(bands))
    if use_cheap_key:
        paths.append(
            working.select(
                block_key(F.col("text"), F.col("url")).alias("bucket_key"), "url"
            )
        )
    if use_simhash:
        sh = working.select("url", simhash64_udf(F.col("text")).alias("simhash"))
        paths.append(
            sh.select(
                F.explode(simhash_bands(F.col("simhash"))).alias("bucket_key"), "url"
            )
        )
    if len(paths) == 1:
        return paths[0]
    out = None
    for p in paths:
        p = p.select(F.col("bucket_key").cast("string").alias("bucket_key"), "url")
        out = p if out is None else out.unionByName(p)
    return out


def candidate_pairs(
    buckets: DataFrame,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    with_counts: bool = False,
) -> DataFrame:
    """→ distinct (url_a, url_b), url_a < url_b — plus ``n_shared`` (the
    number of buckets the pair collided in) when ``with_counts``.

    Hot buckets (> ``max_bucket`` members) are excluded — at web scale
    these are non-discriminating keys whose pair blow-up is quadratic
    junk. The bucket-size prune reuses the bucket_key shuffle via a
    window count (same trick as singleton pruning, F7).

    ``n_shared`` is the free similarity estimate: with b bands of r rows,
    a pair of Jaccard J collides per band with probability J^r, so the
    collision count is Binomial(b, J^r) — thresholding it gates on J
    using ONLY the shuffle the bucketing already paid for, no signature
    joins (the standard LSH-at-scale formulation; cf. spark.ml
    MinHashLSH, which gates on ≥1 collision before exact distance).

    Shape note: the naive within-bucket SELF-JOIN shuffles the bucket
    table TWICE (left and right sides each materialize their Exchange;
    AQE + cached parents defeat ReuseExchange — measured 2×2.5GB at 4M
    pages). Instead the bucket table shuffles ONCE into
    ``collect_list`` groups and the i<j pairs expand JVM-side from each
    bucket's member array (bounded at ``max_bucket``, so the per-group
    expansion is bounded and the hot-key blow-up the cap exists for
    cannot materialize)."""
    g = (
        buckets.groupBy("bucket_key")
        .agg(F.collect_list("url").alias("_us"))
        .where((F.size("_us") >= 2) & (F.size("_us") <= max_bucket))
    )
    # all i<j member pairs, normalized to url_a < url_b — pure codegen
    pair_array = F.expr(
        "flatten(transform(_us, (a, i) ->"
        " transform(slice(_us, i + 2, size(_us) - i - 1), b ->"
        " struct(least(a, b) AS url_a, greatest(a, b) AS url_b))))"
    )
    pairs = (
        g.select(F.explode(pair_array).alias("_p"))
        .select("_p.url_a", "_p.url_b")
        .where(F.col("url_a") != F.col("url_b"))
    )
    if with_counts:
        return pairs.groupBy("url_a", "url_b").agg(
            F.count(F.lit(1)).alias("n_shared")
        )
    return pairs.distinct()


def dropped_buckets(buckets: DataFrame, max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Audit view of capped buckets (no silent truncation)."""
    return (
        buckets.groupBy("bucket_key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > max_bucket)
    )
