"""Pair scoring — confirm stage for near-duplicate candidates.

Two-tier design (north_star: "batched Jaro-Winkler/Levenshtein +
MinHash-Jaccard"):

1. **Estimate** — MinHash-Jaccard from the signatures already carried by
   the bucket rows. Signature joins are pair-side-small (AQE broadcasts
   the pair list), so the 1KB sigs stream map-side and nothing wide
   shuffles. Pairs far below threshold (the vast majority) die here.
2. **Confirm** — exact token-set Jaccard over the texts, but only for
   estimate-survivors: the text column is re-read from the source and
   joined against the (tiny) survivor list — again pair-side-small, so
   text never shuffles. Jaro-Winkler / Levenshtein scorers are available
   for fielded-record linkage via the same join shape.

The reference analog is pass 3's full-hash byte-confirm after the cheap
partial-hash gate (lib.rs:130-160) — same cheap-gate-then-confirm shape,
generalized to similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import minhash_jaccard_udf
from ..functions.similarity import pair_jaccard_udf

DEFAULT_THRESHOLD = 0.80
DEFAULT_ESTIMATE_GATE = 0.55  # pre-filter margin below the confirm threshold

# ≥2 band collisions out of 32 bands × 4 rows: P(pass | J=0.7) ≈ 0.998,
# P(pass | J=0.3) ≈ 0.03 — same recall as the signature-join estimate at
# the 0.55 gate, zero additional shuffle (the count rides the bucket
# self-join's own exchange).
DEFAULT_MIN_BAND_MATCHES = 2

# Broadcasting the candidate url set (≈60B/url) stays executor-safe well
# into the millions; above this, fall back to the shuffled semi-join.
BROADCAST_URL_LIMIT = 4_000_000

# Java regex whose split boundaries equal Python str.split()'s on every
# input: (?U)\s is the Unicode White_Space property; Python isspace()
# additionally counts the U+001C-001F file/group/record/unit separators.
TOKEN_SPLIT_RE = r"(?U)[\s\x1c-\x1f]+"


def token_hash_array(text):
    """THE tier-2 token identity: distinct 32-bit Murmur3 token hashes
    (see the collision-probability budget in ``confirm_pairs``). Shared
    by the in-pipeline confirm tier and the cross-table incremental
    probe (sources/bucketed.py) so their verdicts can never
    desynchronize — change the tokenizer or hash width HERE only."""
    return F.transform(
        F.array_distinct(F.array_remove(F.split(text, TOKEN_SPLIT_RE), "")),
        lambda t: F.hash(t),
    )


def token_jaccard_score(ta, tb):
    """Jaccard over two token-hash arrays; two empty docs score 1.0
    (identical). The other half of the shared tier-2 identity."""
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(ta) + F.size(tb) - inter
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union.cast("double"))


def token_containment_score(ta, tb):
    """Containment over two token-hash arrays: |A∩B| / min(|A|,|B|) —
    the doc-in-doc dial. A page embedded verbatim in a longer page
    (syndicated article + surrounding boilerplate, quoted post inside a
    thread) scores 1.0 here while its Jaccard sinks toward
    |A|/|B|. Symmetric min-denominator form (Broder's containment is
    one-sided; min makes the pair score order-independent, matching the
    url_a<url_b canonical pair orientation). Two empty docs score 1.0;
    ONE empty side scores 0.0 (the repo-wide degenerate-side rule —
    'empty is contained in everything' would weld a whitespace-only
    page into every cluster it was ever paired with)."""
    inter = F.size(F.array_intersect(ta, tb))
    mn = F.least(F.size(ta), F.size(tb))
    return (
        F.when((F.size(ta) == 0) & (F.size(tb) == 0), F.lit(1.0))
        .when(mn == 0, F.lit(0.0))
        .otherwise(inter / mn.cast("double"))
    )


def pair_value_join(cand: DataFrame, slice_: DataFrame, val: str) -> DataFrame:
    """One-pass pair/value join: melt each pair into (url_a, url_b,
    side, url), join the per-url value slice ONCE, and pivot the two
    sides back into ``_ta``/``_tb`` per pair.

    This replaces the classic double join (slice as ``ta`` on url_a,
    slice as ``tb`` on url_b), and exists for a scale reason: the
    double join references the slice twice, so its two exchange
    children are independent query stages that AQE submits
    CONCURRENTLY — with a cold cache each re-runs the full
    scan+semi-join+tokenize while racing to fill it (measured ~300
    cpu-s per side at 4M pages), and the fix was a driver-blocking
    ``slice_.count()`` barrier before the join. Here the slice appears
    exactly once, so there is no race, no persist, and no barrier job
    — and the big array payload moves fewer times: the melt side is
    slim (two urls + a one-char side tag), the slice side crosses one
    join exchange, and the pivot's groupBy exchange carries each
    pair's two values once (vs the double join's ta exchange + tb
    exchange + ``_ta`` carried through the second join's url_b
    exchange).

    Semantics match the inner double join: a pair whose url is absent
    from the slice (or whose value is null) pivots to a null side,
    scores null, and dies at the threshold filter — exactly where the
    double join dropped it. Input pairs are distinct by construction
    (candidate_pairs/band_gate both dedup); the pivot would collapse
    duplicate pairs, which is the correct behavior for a pair list
    anyway."""
    melt = cand.select(
        "url_a",
        "url_b",
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("s"), F.col("url_a").alias("url")),
                F.struct(F.lit("b").alias("s"), F.col("url_b").alias("url")),
            )
        ).alias("_m"),
    ).select(
        "url_a",
        "url_b",
        F.col("_m.s").alias("_s"),
        F.col("_m.url").alias("url"),
    )
    side = lambda tag: F.first(  # noqa: E731 — one non-null row per side
        F.when(F.col("_s") == tag, F.col(val)), ignorenulls=True
    )
    return (
        melt.join(slice_, "url")
        .groupBy("url_a", "url_b")
        .agg(side("a").alias("_ta"), side("b").alias("_tb"))
    )


def band_gate(
    pairs_with_counts: DataFrame, min_matches: int = DEFAULT_MIN_BAND_MATCHES
) -> DataFrame:
    """Estimate tier via LSH band-collision counts: keep pairs that
    collided in ≥ ``min_matches`` bands (``candidate_pairs(...,
    with_counts=True)`` output). The binomial collision count IS the
    Jaccard estimate — no signature join, no Python, no extra shuffle."""
    return pairs_with_counts.where(F.col("n_shared") >= min_matches)


def estimate_pairs(pairs: DataFrame, sigs: DataFrame, gate: float) -> DataFrame:
    """→ pairs with ``est_score`` ≥ gate. ``sigs`` is (url, sig).

    Signature-join estimate (exact MinHash-Jaccard over the full
    signatures). The flagship pipeline gates on band-collision counts
    instead (``band_gate``); this path remains for direct use where the
    caller wants the numeric estimate. It rides the same one-pass
    melt/pivot join as the confirm tier (``pair_value_join``) — the
    classic double sig join shuffled the |reps|×1KB signature table
    TWICE (the job's second-largest exchange at 10^12 rows) and raced
    two AQE query stages to fill a cold cache; here the signatures
    cross one join exchange and the pivot carries each pair's two
    sigs once.

    Contract (sharpened vs the old double join): ``pairs`` is projected
    to bare ``(url_a, url_b)`` — pass-through columns are NOT preserved
    (join the result back on the pair key if you need them), and
    ``sigs`` must carry ONE row per url (true of every signature table
    this engine builds; a duplicate url would collapse to an arbitrary
    ``first`` in the pivot rather than fan out per combination). The
    explicit not-null filter keeps the inner-join drop semantics — a
    pair with a side absent from ``sigs`` is dropped, not scored — as
    structural defense-in-depth: it does not depend on the estimate
    UDF's own guarantee of returning NULL (never NaN, which Spark
    orders above every number) on a null side, minhash.py:293-297."""
    joined = pair_value_join(
        pairs.select("url_a", "url_b"),
        sigs.select("url", F.col("sig").alias("_v")),
        "_v",
    ).where(F.col("_ta").isNotNull() & F.col("_tb").isNotNull())
    est = joined.withColumn(
        "est_score", minhash_jaccard_udf(F.col("_ta"), F.col("_tb"))
    ).drop("_ta", "_tb")
    return est.where(F.col("est_score") >= gate)


def confirm_pairs(
    candidates: DataFrame,
    pages: DataFrame,
    threshold: float,
    jvm_tokens: bool = True,
    tracker=None,
    scorer: str = "jaccard",
) -> DataFrame:
    """Exact token-Jaccard confirm on estimate survivors.
    → (url_a, url_b, score).

    ``scorer`` selects the pass-3 similarity (north_star names the
    first three): ``"jaccard"`` (default — exact token-set Jaccard, the
    right scorer for whole web pages), ``"jaro_winkler"`` (batched
    pandas UDF on 512-char prefixes), ``"levenshtein"`` (JVM built-in
    1−dist/max on 512-char prefixes), or ``"ngram_jaccard"`` (JVM
    character-5-gram set Jaccard on the same prefixes — order-robust
    like token Jaccard but sub-word-granular, the dial for boilerplate
    with small edits). The prefix scorers exist for fielded-record
    linkage (names, titles); they reuse the exact same carve-out/join
    shape, so text still never shuffles. ``"containment"`` swaps the
    token-set denominator for min(|A|,|B|) — the doc-in-doc dial
    (syndicated article embedded in a longer page scores 1.0 where its
    Jaccard sinks); identical plan to "jaccard" on both the jvm_tokens
    and pandas paths. ``"tfidf"`` scores pairs by
    corpus-IDF-weighted cosine (operators/corpus_stats.py) — the dial
    when candidate pages share heavy boilerplate that unweighted token
    Jaccard over-credits; it adds ONE corpus-wide slim aggregate (the
    (token-hash, df) model — the same cost class as the signature
    stage) and its pair joins are pair-side-small like the branches
    below. ``"weighted_jaccard"`` scores exact multiset Jaccard over
    token COUNTS (Σmin/Σmax via the Σmax = |A|+|B|−Σmin identity — one
    inner join on shared token hashes), the dial when repetition-spam
    pages inflate a set-Jaccard score. Text never shuffles on any
    path.

    The text column is read from the source exactly ONCE: a semi-join
    against the candidate url set carves out the text slice (≤2×|pairs|
    rows), which then meets the pair list in ONE melt/pivot join
    (``pair_value_join``) instead of the classic double join — the
    slice is referenced once, so it needs no persist and no
    driver-blocking ``count()`` barrier to serialize racing exchange
    children (two such barriers existed through round 4). The url set
    is **explicitly broadcast** when small enough: Catalyst's size
    estimate for a derived distinct-union is unknowable at plan time,
    so without the hint AQE plants a sort-merge semi-join that
    shuffles the whole pages table — text and all (measured: 13.6GB of
    a 31GB input at 4M pages). The count that decides the hint is over
    the (persisted, tiny) pair list, not the pages table; it is the
    ONE remaining driver barrier and is irreducible by the Observation
    fold that deleted CC's convergence collects — an Observation can
    only report metrics of a job that already ran, and this count
    gates a plan-time decision (the broadcast hint) for the very next
    job, so no earlier action exists to ride.

    ``jvm_tokens`` (default): each slice row is tokenized ONCE into a
    distinct-token array during the carve-out, and the per-pair Jaccard
    is ``array_intersect``/``size`` — whole-stage codegen, zero Python
    in the confirm stage. The pandas-UDF path remains switchable; both
    produce identical scores up to token-hash collisions (each path
    hashes tokens — 32-bit Murmur3 here, 64-bit ``pd.util.hash_array``
    there — so agreement is exact except with probability ≈ n²/2³³ per
    doc, the JVM side's collision rate)
    on ANY input: the JVM tokenizer is ``TOKEN_SPLIT_RE`` below, whose
    character class exactly reproduces Python ``str.split()`` (Unicode
    White_Space via ``(?U)\\s`` plus the U+001C–001F separators Python's
    ``isspace`` adds) — web text is full of U+00A0/U+2009 etc., so an
    ASCII-only ``\\s+`` would flip threshold decisions between the two
    paths and against the MinHash shingler (Python split).

    ``tracker`` (a :class:`~dedupe_algo_spark.tracking.PersistTracker`)
    registers the persisted pair list for release once the caller has
    consumed the scores — without it a long-lived session accumulates
    block-manager memory per call. (The text slice is no longer
    persisted: the one-pass ``pair_value_join`` references it exactly
    once, so there is nothing to cache or race.)

    Contract: ``pages`` must carry ONE row per url (true of every
    table this engine feeds it — the pipeline scores rep urls, which
    are exact-dedup keepers). The melt/pivot's ``first`` would
    collapse duplicate-url rows to an arbitrary one rather than fan
    the pair out per version as the old double join did; pre-dedup
    un-deduped input before direct calls.
    """
    _persist = tracker.persist if tracker is not None else (lambda df: df.persist())
    cand = _persist(candidates.select("url_a", "url_b"))
    n_pairs = cand.count()
    urls = (
        cand.select(F.col("url_a").alias("url"))
        .union(cand.select(F.col("url_b").alias("url")))
        .distinct()
    )
    if 2 * n_pairs <= BROADCAST_URL_LIMIT:
        urls = F.broadcast(urls)
    sliced = pages.join(urls, "url", "left_semi")
    if scorer in ("tfidf", "weighted_jaccard"):
        from .corpus_stats import tfidf_cosine_pairs, weighted_jaccard_pairs

        if scorer == "tfidf":
            scored = tfidf_cosine_pairs(
                pages, cand, id_col="url", id_a="url_a", id_b="url_b"
            ).withColumnRenamed("cosine", "score")
        else:
            scored = weighted_jaccard_pairs(
                pages, cand, id_col="url", id_a="url_a", id_b="url_b"
            ).withColumnRenamed("wjaccard", "score")
    elif scorer not in ("jaccard", "containment"):
        from ..functions.similarity import (
            LEV_CAP,
            levenshtein_sim_col,
            ngram_jaccard_col,
            pair_damerau_sim_udf,
            pair_jaro_winkler_udf,
        )

        slice_ = sliced.select(
            "url", F.substring("text", 1, LEV_CAP).alias("_t")
        )
        if scorer == "jaro_winkler":
            score = pair_jaro_winkler_udf(F.col("_ta"), F.col("_tb"))
        elif scorer == "levenshtein":
            score = levenshtein_sim_col(F.col("_ta"), F.col("_tb"))
        elif scorer == "damerau":
            score = pair_damerau_sim_udf(F.col("_ta"), F.col("_tb"))
        elif scorer == "ngram_jaccard":
            score = ngram_jaccard_col(F.col("_ta"), F.col("_tb"))
        else:
            raise ValueError(f"unknown scorer {scorer!r}")
        scored = pair_value_join(cand, slice_, "_t").withColumn("score", score)
    elif jvm_tokens:
        # Token identity is a 32-bit Murmur3 hash (F.hash → native INT),
        # not the string: the pair join's array_intersect then compares
        # ints instead of hashing and equality-checking strings per
        # element — the confirm join stage was the largest post-scan
        # CPU item at 4M pages (~560 cpu-s at N). INT (not the earlier
        # xxhash64 LONG) because the token arrays are the biggest
        # post-scan shuffle payload (the slice's join exchange plus
        # both pivoted arrays through the groupBy exchange); hash
        # entropy is incompressible, so 4-byte ids halve those bytes
        # outright. Jaccard over distinct token hashes equals Jaccard
        # over distinct tokens up to 32-bit collisions (P ≈ n²/2³³ per
        # doc ≈ 4e-7 at ~60 tokens/page: a collision merges two tokens
        # and shifts one side's set size by 1 — a ≲2% score nudge on a
        # handful of docs per 10⁷, immaterial next to the MinHash tiers
        # feeding this stage and far from the τ=0.8 decision boundary).
        # The slice is referenced ONCE (pair_value_join), so it needs
        # no persist and no barrier count — the round-4 slice_.count()
        # existed only to serialize the double join's racing exchange
        # children, a shape this path no longer has.
        slice_ = sliced.select(
            "url", token_hash_array(F.col("text")).alias("_toks")
        )
        score = (
            token_containment_score(F.col("_ta"), F.col("_tb"))
            if scorer == "containment"
            else token_jaccard_score(F.col("_ta"), F.col("_tb"))
        )
        scored = pair_value_join(cand, slice_, "_toks").withColumn(
            "score", score
        )
    else:
        from ..functions.similarity import pair_containment_udf

        slice_ = sliced.select("url", F.col("text").alias("_t"))
        pair_udf = (
            pair_containment_udf if scorer == "containment" else pair_jaccard_udf
        )
        scored = pair_value_join(cand, slice_, "_t").withColumn(
            "score", pair_udf(F.col("_ta"), F.col("_tb"))
        )
    return scored.where(F.col("score") >= threshold).select("url_a", "url_b", "score")


def score_pairs(
    pairs: DataFrame,
    texts: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    tracker=None,
) -> DataFrame:
    """Single-tier exact scoring (kept for direct use/tests):
    → (url_a, url_b, score) with token-Jaccard ≥ threshold. Pass a
    ``PersistTracker`` to own the intermediates' cache lifetime."""
    return confirm_pairs(pairs, texts, threshold, tracker=tracker)
