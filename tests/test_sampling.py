"""Deterministic hash-based sampling and splitting."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dedupe_algo_spark.operators.sampling import (
    _threshold_hex,
    deterministic_split,
    stratified_sample,
)


def _expected_keep(key, seed, rate):
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:12]
    return h < _threshold_hex(rate)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string").cache()


def test_sample_matches_reference_hash_exactly(spark, corpus):
    """Every keep/drop decision equals the hashlib.md5 reference — the
    sample is a pure function of (key, seed, rate), no RNG."""
    rates = {"en": 0.5, "de": 0.25}
    out = stratified_sample(corpus, rates, default_rate=1.0, seed=42).toPandas()
    kept = set(out["doc_id"])
    for i in range(600):
        lang = ["en", "de", "zh"][i % 3]
        rate = rates.get(lang, 1.0)
        assert (i in kept) == _expected_keep(i, 42, rate), (i, lang)
    # weights are the inverse rates
    w = out.set_index("doc_id")["sample_weight"]
    for i in kept:
        lang = ["en", "de", "zh"][i % 3]
        assert w[i] == 1.0 / rates.get(lang, 1.0)


def test_partitioning_invariance(spark, corpus):
    """The same sample regardless of physical layout — the property
    df.sample() does NOT have."""
    a = stratified_sample(corpus, {"en": 0.5}, seed=1).toPandas()
    b = stratified_sample(
        corpus.repartition(17, "lang"), {"en": 0.5}, seed=1
    ).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_nested_samples(spark, corpus):
    """rate 0.25 ⊂ rate 0.5 at the same seed (threshold monotonicity)."""
    small = set(
        stratified_sample(corpus, {}, default_rate=0.25, seed=9)
        .toPandas()["doc_id"]
    )
    big = set(
        stratified_sample(corpus, {}, default_rate=0.5, seed=9)
        .toPandas()["doc_id"]
    )
    assert small <= big
    assert len(small) < len(big)


def test_rate_zero_and_one(spark, corpus):
    out = stratified_sample(
        corpus, {"en": 0.0}, default_rate=1.0, seed=3
    ).toPandas()
    assert not (out["lang"] == "en").any()
    n_other = corpus.where(F.col("lang") != "en").count()
    assert len(out) == n_other


def test_split_partitions_corpus(spark, corpus):
    """Splits are disjoint, exhaustive, reference-exact, and stable
    under corpus changes (a key's split never depends on other rows)."""
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = deterministic_split(corpus, fr, seed=7).toPandas()
    assert len(out) == 600
    for _, row in out.iterrows():
        h = hashlib.md5(f"{row.doc_id}:7".encode()).hexdigest()[:12]
        if h < _threshold_hex(0.8):
            want = "train"
        elif h < _threshold_hex(0.9):
            want = "valid"
        else:
            want = "test"
        assert row.split == want
    # dropping half the corpus moves nobody
    sub = deterministic_split(
        corpus.where(F.col("doc_id") < 300), fr, seed=7
    ).toPandas()
    merged = out.set_index("doc_id")["split"]
    for _, row in sub.iterrows():
        assert row.split == merged[row.doc_id]


def test_split_validates_fractions(spark, corpus):
    with pytest.raises(ValueError):
        deterministic_split(corpus, {})
    with pytest.raises(ValueError):
        deterministic_split(corpus, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        stratified_sample(corpus, {"en": 1.5})


def test_mixture_weights_alpha_rebalances(spark):
    """α<1 upweights low-token strata: boost > 1 for the small stratum,
    < 1 for the big one; p_alpha sums to 1; α=1 is a no-op (boost=1)."""
    from dedupe_algo_spark.operators.sampling import mixture_weights

    rows = [("big", "w " * 400)] * 90 + [("small", "w " * 10)] * 10
    docs = spark.createDataFrame(
        [(s, t.strip()) for s, t in rows], "source string, text string"
    )
    out = {r["source"]: r for r in mixture_weights(docs).collect()}
    assert out["big"]["n_docs"] == 90 and out["small"]["n_tokens"] == 100
    assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
    assert abs(out["big"]["p_alpha"] + out["small"]["p_alpha"] - 1.0) < 1e-9

    flat = {
        r["source"]: r for r in mixture_weights(docs, alpha=1.0).collect()
    }
    assert flat["big"]["boost"] == 1.0 == flat["small"]["boost"]


def test_mixture_weights_zero_token_stratum_is_defined(spark):
    """A stratum whose surviving docs carry zero tokens must yield
    p_raw = p_alpha = boost = 0.0, not an ANSI DIVIDE_BY_ZERO crash;
    an all-empty corpus yields all-zero rows."""
    from dedupe_algo_spark.operators.sampling import mixture_weights

    docs = spark.createDataFrame(
        [("en", "hello world tokens here"), ("xx", ""), ("xx", "   ")],
        "source string, text string",
    )
    out = {r["source"]: r for r in mixture_weights(docs).collect()}
    assert out["xx"]["n_tokens"] == 0
    assert (out["xx"]["p_raw"], out["xx"]["p_alpha"], out["xx"]["boost"]) == (
        0.0, 0.0, 0.0,
    )
    assert out["en"]["p_raw"] == 1.0 and out["en"]["boost"] == 1.0

    empty = spark.createDataFrame([("xx", "")], "source string, text string")
    row = mixture_weights(empty).collect()[0]
    assert (row["p_raw"], row["p_alpha"], row["boost"]) == (0.0, 0.0, 0.0)


def test_corpus_shuffle_is_deterministic_permutation(spark, corpus):
    """(shard, pos) is a total order: shards partition the corpus, pos
    is 1..count(shard) within each, and the whole assignment replays
    the hashlib.md5 reference exactly — rerun- and layout-stable."""
    from dedupe_algo_spark.operators.sampling import corpus_shuffle

    out = corpus_shuffle(corpus, key_col="doc_id", seed=13, num_shards=8).toPandas()
    assert len(out) == 600
    # expected order from the pure-Python reference
    def ref(i):
        h = hashlib.md5(f"{i}:13".encode()).hexdigest()[:12]
        return int(h[:6], 16) % 8, h
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
        got = list(grp.sort_values("pos")["doc_id"])
        want = [i for _, i in sorted((ref(i)[1], i) for i in range(600) if ref(i)[0] == shard)]
        assert got == want, f"shard {shard} order diverges"
    # layout invariance
    again = corpus_shuffle(
        corpus.repartition(17, "lang"), key_col="doc_id", seed=13, num_shards=8
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert (a[["shard", "pos"]].values == b[["shard", "pos"]].values).all()


def test_domain_cap_keeps_k_smallest_hashes(spark):
    """Cap = the k smallest md5(key:seed) per domain, all original
    columns intact; under-cap domains pass through whole; the two-phase
    salted ranking equals the single-window definition."""
    from dedupe_algo_spark.operators.sampling import domain_cap

    rows = [
        (f"https://d{i % 7}.example.com/p/{i}", f"d{i % 7}", i)
        for i in range(350)
    ]
    df = spark.createDataFrame(rows, "url string, domain string, n int")
    out = domain_cap(df, k=4, domain_col="domain", key_col="url", seed=99).toPandas()
    # single-window reference
    def h(u):
        return hashlib.md5(f"{u}:99".encode()).hexdigest()[:12]
    want = set()
    for d in {f"d{i}" for i in range(7)}:
        urls = [u for (u, dd, _) in rows if dd == d]
        want |= set(sorted(urls, key=lambda u: (h(u), u))[:4])
    assert set(out["url"]) == want
    assert set(out.columns) == {"url", "domain", "n"}
    # under-cap domain passes through whole
    small = spark.createDataFrame(
        [("https://tiny.example.com/1", "tiny", 0),
         ("https://tiny.example.com/2", "tiny", 1)],
        "url string, domain string, n int",
    )
    assert domain_cap(small, k=4, domain_col="domain").count() == 2
    with pytest.raises(ValueError):
        domain_cap(small, k=0, domain_col="domain")


def _budget_reference(rows, budgets, seed=7):
    """Single-window definition: per stratum, docs in md5(key:seed)
    order are kept while the preceding token sum is < budget; other
    strata keep everything."""
    kept = set()
    by_st = {}
    for doc_id, lang, n in rows:
        by_st.setdefault(lang, []).append((doc_id, n))
    for lang, docs in by_st.items():
        if lang not in budgets:
            kept.update(d for d, _ in docs)
            continue
        order = sorted(
            docs,
            key=lambda d: (
                hashlib.md5(f"{d[0]}:{seed}".encode()).hexdigest()[:12],
                d[0],
            ),
        )
        cum = 0
        for doc_id, n in order:
            if cum < budgets[lang]:
                kept.add(doc_id)
            cum += n
    return kept


@pytest.fixture(scope="module")
def token_corpus(spark):
    # deterministic per-doc token counts 1..20; text is that many words
    rows = [
        (i, ["en", "de", "zh"][i % 3], " ".join(["w"] * (i % 20 + 1)))
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).cache()


def test_token_budget_two_phase_equals_single_window(spark, token_corpus):
    """The order-preserving-prefix two-phase construction equals the
    single-window definition exactly, including the budget-crossing
    document — swept across prefix lengths (prefix_len=1 forces the
    boundary logic through just 16 buckets) and budget placements
    (0, tiny, interior, beyond-total)."""
    from dedupe_algo_spark.operators.sampling import token_budget_sample

    rows = [
        (r["doc_id"], r["lang"], len(r["text"].split()))
        for r in token_corpus.collect()
    ]
    totals = {}
    for _, lang, n in rows:
        totals[lang] = totals.get(lang, 0) + n
    for budgets in [
        {"en": 0},
        {"en": 1},
        {"en": 400, "de": 37},
        {"en": totals["en"]},  # exactly the stratum total
        {"en": totals["en"] + 10_000, "zh": 5},  # beyond-total keeps all
    ]:
        want = _budget_reference(rows, budgets)
        for prefix_len in (1, 2, 3):
            got = set(
                r["doc_id"]
                for r in token_budget_sample(
                    token_corpus,
                    budgets,
                    key_col="doc_id",
                    prefix_len=prefix_len,
                ).collect()
            )
            assert got == want, (budgets, prefix_len)


def test_token_budget_adherence_and_passthrough(spark, token_corpus):
    """Kept token mass reaches the budget (stratum has enough), the
    overshoot is bounded by one document, and unbudgeted strata pass
    through whole."""
    from dedupe_algo_spark.operators.sampling import token_budget_sample

    out = token_budget_sample(
        token_corpus, {"en": 300}, key_col="doc_id"
    ).toPandas()
    en = out[out["lang"] == "en"]
    ns = en["text"].str.split().str.len()
    assert ns.sum() >= 300  # crossing doc included
    assert ns.sum() - ns.max() < 300  # minus any one doc → under budget
    # de/zh untouched
    src = token_corpus.toPandas()
    for lang in ("de", "zh"):
        assert set(out[out["lang"] == lang]["doc_id"]) == set(
            src[src["lang"] == lang]["doc_id"]
        )


def test_token_budget_validation(spark, token_corpus):
    from dedupe_algo_spark.operators.sampling import token_budget_sample

    with pytest.raises(ValueError):
        token_budget_sample(token_corpus, {"en": -1}, key_col="doc_id")
    with pytest.raises(ValueError):
        token_budget_sample(
            token_corpus, {"en": 10}, key_col="doc_id", prefix_len=0
        )
    # empty budgets: identity
    assert (
        token_budget_sample(token_corpus, {}, key_col="doc_id").count()
        == token_corpus.count()
    )
