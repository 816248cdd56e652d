"""Deterministic hash-based sampling and splitting for data mixing.

A training-data pipeline ends with MIXING: per-source / per-language
rates (e.g. upsample books, downsample Common Crawl) and a
train/validation holdout. At 10^12 documents both must be (a) exactly
reproducible across reruns and engines — ``df.sample()`` is seeded
per-partition, so ANY change in partitioning silently reshuffles the
sample — and (b) pure narrow filters: no shuffle, no state, no RNG.

The public construction (used by CCNet's hash-sharding and by every
reservoir-free web pipeline) keys the decision on a content hash of a
stable per-row key: a row is kept iff ``h(key) / H < rate``. Here the
hash is the first 12 hex chars of ``md5(key || ':' || seed)`` —
md5 because Spark and DuckDB (and essentially every engine) produce
the identical lowercase hex digest, so the comparison can stay
LEXICOGRAPHIC on the hex prefix against a precomputed threshold
string: no integer conversion, no floats in the filter, bit-identical
across engines. 48 hash bits bound the rate resolution at 2^-48.

Plan shape: a ``CASE`` over the stratum column picking the threshold
literal, one md5 over a short key string, one string compare — all
whole-stage codegen; the physical plan is Scan → Filter with the
predicate eligible for parquet row-group pruning on the stratum
column. Nothing shuffles; scaling is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12  # 48 bits: exact in float64, far beyond rate precision


def _threshold_hex(rate: float) -> str:
    """Inclusive-exclusive upper bound for ``rate`` on the first 12 hex
    chars of an md5 digest: keep iff ``digest[:12] < threshold``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    bound = int(rate * (16**_HEX_DIGITS))
    if bound >= 16**_HEX_DIGITS:
        # 'g' sorts above every hex digit: keep-all without leaving the
        # fixed 12-char lexicographic domain
        return "g"
    return format(bound, f"0{_HEX_DIGITS}x")


def _bucket(key: Column, seed: int) -> Column:
    return F.substring(
        F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed)))),
        1,
        _HEX_DIGITS,
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by a deterministic
    content hash of ``key_col`` — rerun-stable under any partitioning,
    any cluster size, any row order. Appends ``sample_weight`` =
    1/rate (the Horvitz–Thompson inverse-probability weight, so
    downstream token counts stay unbiased estimates of the full
    corpus). Rows whose stratum is not in ``rates`` use
    ``default_rate``; rate 0 drops the stratum entirely.

    Nested sampling property: because the keep test is
    ``hash < threshold(rate)``, the rate-0.25 sample is an exact
    SUBSET of the rate-0.5 sample for the same seed — re-mixing at a
    new rate never churns previously selected documents (the property
    data-mixing ablations rely on).
    """
    thr = F.lit(_threshold_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_threshold_hex(rate))
        ).otherwise(thr)
    wt = F.lit(float(1.0 / default_rate if default_rate else 0.0))
    for stratum, rate in sorted(rates.items()):
        wt = F.when(
            F.col(stratum_col) == stratum,
            F.lit(float(1.0 / rate if rate else 0.0)),
        ).otherwise(wt)
    return df.where(_bucket(F.col(key_col), seed) < thr).withColumn(
        "sample_weight", wt
    )


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Assign every row to exactly one split ("train"/"valid"/...) by
    consecutive hash ranges over the same 48-bit md5 prefix — a
    partition of the corpus (disjoint, exhaustive when fractions sum
    to 1; any remainder mass lands in the LAST split by insertion
    order, which absorbs the <2^-48 rounding slack). Appends
    ``split``; no rows are dropped.

    The split is a function of the KEY alone: adding, removing, or
    re-sharding other rows never moves a document between train and
    valid — the invariant that keeps a holdout honest across corpus
    versions.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = list(fractions)
    bucket = _bucket(F.col(key_col), seed)
    # ascending CASE over cumulative thresholds: first matching range wins
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += fractions[name]
        cases.append((name, _threshold_hex(cum)))
    expr: Column = F.lit(names[-1])
    for name, upper in reversed(cases):
        expr = F.when(bucket < F.lit(upper), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_weights(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
    ndigits: int = 10,
) -> DataFrame:
    """Multinomial data-mixing weights — the α-sampling of XLM-R
    (Conneau et al. 2020 §3.1) / mT5 (Xue et al. 2021): a training
    sampler draws stratum ``s`` with probability p_s^α / Σ_t p_t^α,
    where p_s is the stratum's share of corpus TOKENS; α<1 upweights
    low-resource strata. → (``stratum_col``, n_docs, n_tokens, p_raw,
    p_alpha, boost), boost = p_alpha/p_raw being the per-document
    oversampling factor to hand :func:`stratified_sample` as its rate.

    Scale shape: ONE aggregate over slim (stratum, token_count) rows —
    the token counting is map-side codegen, text never shuffles — then
    normalization over the stratum table itself. Strata are languages /
    sources (10s-1000s), so the single-partition normalization window
    is a deliberate, bounded choice, not a bottleneck. Doubles are
    rounded to ``ndigits`` so the DuckDB oracle twin hashes identically
    (libm pow may differ in the last ulp across engines).

    Degenerate strata are defined, not crashes (Spark 4 runs ANSI, so a
    bare division would throw DIVIDE_BY_ZERO): a stratum whose surviving
    docs carry zero tokens gets p_raw = p_alpha = boost = 0.0 — it can
    contribute nothing to training, so it samples at rate 0. An
    all-empty corpus yields all-zero rows for the same reason.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count

    per = docs.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    everything = Window.partitionBy()
    total = F.sum("n_tokens").over(everything)
    p_raw = F.when(
        total > 0, F.col("n_tokens") / total
    ).otherwise(F.lit(0.0))
    alpha_total = F.sum(F.pow(p_raw, F.lit(alpha))).over(everything)
    p_alpha = F.when(
        (F.col("n_tokens") > 0) & (alpha_total > 0),
        F.pow(p_raw, F.lit(alpha)) / alpha_total,
    ).otherwise(F.lit(0.0))
    boost = F.when(F.col("n_tokens") > 0, p_alpha / p_raw).otherwise(F.lit(0.0))
    return per.select(
        stratum_col,
        "n_docs",
        "n_tokens",
        F.round(p_raw, ndigits).alias("p_raw"),
        F.round(p_alpha, ndigits).alias("p_alpha"),
        F.round(boost, ndigits).alias("boost"),
    )


def corpus_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 13,
    num_shards: int = 64,
) -> DataFrame:
    """Deterministic global training-order shuffle for corpus export:
    appends ``shard`` and ``pos`` such that reading rows in
    ``(shard, pos)`` order visits the corpus in a fixed pseudo-random
    permutation. Every LLM training pipeline ends with exactly this
    step — ``df.orderBy(rand())`` is neither reproducible (rand() is
    seeded per-partition, so any repartition reshuffles the epoch
    order) nor restartable; here the position is a function of the
    KEY alone, so re-running the export after adding or dropping
    documents leaves every surviving document's relative order intact.

    Construction: ``h = md5(key:seed)[:12]``;
    ``shard = int(h[:6], 16) mod num_shards`` (narrow, whole-stage
    codegen); ``pos = row_number() over (partition by shard
    order by h, key)``. md5 is uniform, so shards are balanced to
    ~±(rows/shard)^-1/2 and the within-shard hash order is a uniform
    random permutation of the shard's rows.

    Scale shape: ONE hash-partitioned exchange on ``shard`` plus a
    per-shard external sort over slim (h, key) pairs — no global
    single-reducer sort. Size ``num_shards`` so one shard's rows fit
    an executor's spill budget (10^12 docs want ~10^5 shards of 10^7
    rows); the writer then emits one file group per shard
    (``partitionBy("shard")``) and a trainer streams shards in index
    order, or round-robins across shard readers for extra inter-shard
    mixing. Apply to the slim meta (key + payload pointer), not the
    page text, and the text bytes never enter the exchange.
    """
    from pyspark.sql import Window

    h = _bucket(F.col(key_col), seed)
    out = df.withColumn("_h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("_h", 1, 6), 16, 10).cast("int"),
            F.lit(num_shards),
        ),
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return out.withColumn("pos", F.row_number().over(w)).drop("_h")


def domain_cap(
    df: DataFrame,
    k: int,
    domain_col: str = "domain",
    key_col: str = "url",
    seed: int = 99,
    salt_buckets: int = 64,
) -> DataFrame:
    """Keep at most ``k`` rows per domain, chosen as the k smallest by
    ``md5(key:seed)`` — the per-domain cap of RefinedWeb/FineWeb-style
    curation (a handful of template-heavy megadomains otherwise
    dominate the token budget). Hash order makes the kept subset an
    unbiased within-domain sample that is rerun-stable: re-crawling a
    domain never swaps previously kept pages for equally ranked ones.

    Exact two-phase top-k so no single task ever sees a whole
    megadomain: phase 1 ranks within ``(domain, salt)`` where ``salt =
    pmod(xxhash64(key), salt_buckets)`` and keeps rank ≤ k — the union
    of per-salt top-k necessarily contains the global per-domain top-k,
    and bounds any window partition to ~count(domain)/salt_buckets
    rows; phase 2 re-ranks the ≤ k·salt_buckets survivors per domain.
    Both windows run over a slim (domain, salt, h, key) projection;
    the kept keys then filter ``df`` with a left-semi join. Feed the
    slim meta (url, domain, stats) — the pipeline's normal curation
    shape — and page text never shuffles; the final semi-join is the
    one exchange proportional to ``df``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    slim = df.select(
        F.col(domain_col).alias("_d"),
        F.col(key_col).alias("_k"),
        _bucket(F.col(key_col), seed).alias("_h"),
        F.pmod(F.xxhash64(key_col), F.lit(salt_buckets)).alias("_s"),
    )
    w1 = Window.partitionBy("_d", "_s").orderBy("_h", "_k")
    survivors = (
        slim.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "_s")
    )
    w2 = Window.partitionBy("_d").orderBy("_h", "_k")
    kept = (
        survivors.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= k)
        .select(F.col("_k").alias(key_col))
    )
    return df.join(kept, key_col, "left_semi")


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "url",
    text_col: str = "text",
    seed: int = 7,
    n_col: str | None = None,
    prefix_len: int = 3,
) -> DataFrame:
    """Exact per-stratum TOKEN budgets — "give me a 30B-token English
    slice, 8B German, everything else whole": the operating unit of a
    training mix is tokens, not rows, so rate-based sampling
    (:func:`stratified_sample`) can only approximate a token target.
    This keeps, per budgeted stratum, the documents with the smallest
    ``md5(key:seed)`` until the budget is reached — an unbiased,
    rerun-stable within-stratum sample under the same hash order every
    other sampling stage here uses. The decision rule is exact and
    engine-reproducible: a document is kept iff the token sum of
    hash-earlier documents in its stratum is ``< budget`` (so the
    budget-crossing document is included and overshoot is bounded by
    one document). Strata absent from ``budgets`` pass through whole.

    Megastratum-safe two-phase construction (a 10^11-document language
    must never land in one window partition): phase 1 groups documents
    by an order-PRESERVING hash prefix — the first ``prefix_len`` hex
    chars of ``h``, so prefix order is a coarsening of the global
    (h, key) order — and runs the cumulative token sum over the
    ≤ 16^prefix_len bucket aggregates per stratum (a tiny window).
    Buckets whose cumulative sum stays under the budget keep every
    document; buckets starting at or past it drop every document; the
    (at most one per stratum) boundary bucket — ~16^-prefix_len of the
    stratum — gets the exact per-document window. The union provably
    equals the single-window definition (the DuckDB oracle runs that
    definition; equality is also pinned by test against a driver-side
    reference). All heavy exchanges carry slim (stratum, bucket, key,
    h, n) meta; text never shuffles; the final semi-join on ``df`` is
    the one exchange proportional to the input.
    """
    if not budgets:
        return df
    if not 1 <= prefix_len <= _HEX_DIGITS - 1:
        raise ValueError(f"prefix_len must be in [1, {_HEX_DIGITS - 1}]")
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    from pyspark.sql import Window

    from ..functions.text import token_count

    strata = list(budgets)
    n_expr = (
        token_count(F.coalesce(F.col(text_col), F.lit("")))
        if n_col is None
        else F.coalesce(F.col(n_col), F.lit(0))
    ).cast("long")
    budget_expr = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for s, b in budgets.items()
                for x in (s, int(b))
            ]
        ),
        F.col("_st"),
    ).cast("long")

    slim = df.where(F.col(stratum_col).isin(strata)).select(
        F.col(stratum_col).alias("_st"),
        F.col(key_col).alias("_k"),
        _bucket(F.col(key_col), seed).alias("_h"),
        n_expr.alias("_n"),
    )
    slim = slim.withColumn("_b", F.substring("_h", 1, prefix_len))

    per_bucket = slim.groupBy("_st", "_b").agg(F.sum("_n").alias("_bn"))
    wb = Window.partitionBy("_st").orderBy("_b")
    marked = (
        per_bucket.withColumn("_cum", F.sum("_bn").over(wb))
        .withColumn("_before", F.col("_cum") - F.col("_bn"))
        .withColumn("_budget", budget_expr)
    )
    full_keep = marked.where(F.col("_cum") < F.col("_budget")).select(
        "_st", "_b"
    )
    boundary = marked.where(
        (F.col("_before") < F.col("_budget"))
        & (F.col("_cum") >= F.col("_budget"))
    ).select("_st", "_b", "_before", "_budget")

    kept_full = slim.join(full_keep, ["_st", "_b"], "left_semi").select("_k")
    wd = (
        Window.partitionBy("_st", "_b")
        .orderBy("_h", "_k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_boundary = (
        slim.join(F.broadcast(boundary), ["_st", "_b"])
        .withColumn(
            "_prev",
            F.col("_before")
            + F.coalesce(F.sum("_n").over(wd), F.lit(0).cast("long")),
        )
        .where(F.col("_prev") < F.col("_budget"))
        .select("_k")
    )
    kept = kept_full.unionByName(kept_boundary).withColumnRenamed(
        "_k", key_col
    )
    # NULL-stratum rows must pass through whole (the documented
    # contract): bare `~isin` evaluates NULL for them and the filter
    # silently drops the row — coalesce the three-valued result
    return df.where(
        ~F.coalesce(F.col(stratum_col).isin(list(strata)), F.lit(False))
    ).unionByName(df.join(kept, key_col, "left_semi"))
