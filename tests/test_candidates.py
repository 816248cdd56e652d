"""Candidate generation + scoring gates: bucket-size pruning, band
collision counts, the band gate, and the confirm stage's
text-never-shuffles property."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dedupe_algo_spark.operators.candidates import candidate_pairs
from dedupe_algo_spark.operators.scoring import band_gate, confirm_pairs


def _buckets(spark, rows):
    return spark.createDataFrame(rows, "bucket_key long, url string")


def test_candidate_pairs_with_counts_and_caps(spark):
    rows = (
        [(1, u) for u in ("a", "b", "c")]  # bucket 1: 3 members
        + [(2, u) for u in ("a", "b")]  # bucket 2: a,b collide again
        + [(3, "x")]  # singleton bucket: no pairs
        + [(4, f"h{i}") for i in range(10)]  # hot bucket, capped below
    )
    pairs = {
        (r["url_a"], r["url_b"]): r["n_shared"]
        for r in candidate_pairs(
            _buckets(spark, rows), max_bucket=5, with_counts=True
        ).collect()
    }
    # hot bucket (10 > 5) contributes nothing; singleton contributes nothing
    assert pairs == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_band_gate_thresholds_collision_count(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    counted = candidate_pairs(_buckets(spark, rows), with_counts=True)
    gated = {
        (r["url_a"], r["url_b"]) for r in band_gate(counted, min_matches=2).collect()
    }
    assert gated == {("a", "b")}  # (a,c) collided in only one bucket


def test_distinct_mode_unchanged(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = candidate_pairs(_buckets(spark, rows)).collect()
    assert [(r["url_a"], r["url_b"]) for r in out] == [("a", "b")]


def test_confirm_jvm_and_pandas_paths_identical(spark, pages_1k):
    """The codegen confirm (array_intersect over pre-tokenized slices)
    and the pandas-UDF confirm must produce the same pairs with the
    same exact scores."""
    from dedupe_algo_spark.operators.candidates import (
        bucket_table_from_bands,
        candidate_pairs,
    )
    from dedupe_algo_spark.operators.dedup import assign_exact, page_meta

    assigned = assign_exact(page_meta(pages_1k))
    rep = assigned.where(F.col("url") == F.col("rep_url")).select("url", "bands")
    cands = band_gate(
        candidate_pairs(bucket_table_from_bands(rep), with_counts=True)
    ).select("url_a", "url_b")
    jvm = {
        (r["url_a"], r["url_b"]): round(r["score"], 9)
        for r in confirm_pairs(cands, pages_1k, 0.5, jvm_tokens=True).collect()
    }
    pd_ = {
        (r["url_a"], r["url_b"]): round(r["score"], 9)
        for r in confirm_pairs(cands, pages_1k, 0.5, jvm_tokens=False).collect()
    }
    assert jvm and jvm == pd_


def test_confirm_tokenizer_unicode_parity(spark):
    """JVM and pandas confirm paths must agree on non-ASCII whitespace:
    Java's bare \\s+ is ASCII-only while Python str.split() is Unicode,
    so HTML-derived text (U+00A0 nbsp, U+2009 thin space, U+3000
    ideographic space, U+0085 NEL, U+001C file separator) would flip
    threshold decisions between the switchable paths."""
    texts = [
        ("u1", "foo bar baz"),
        ("u2", "foo bar baz"),
        ("u3", "foo　barbaz qux"),
        ("u4", "foo\x1cbar\x1dbaz\x1equx\x1fzap"),
        ("u5", " foo bar baz  "),
    ]
    pages = spark.createDataFrame(texts, "url string, text string")
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u2", "u5"), ("u3", "u4"), ("u1", "u5")],
        "url_a string, url_b string",
    )
    jvm = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, jvm_tokens=True).collect()
    }
    pd_ = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, jvm_tokens=False).collect()
    }
    assert jvm == pd_
    # ground truth: u1/u2/u5 all tokenize to {foo, bar, baz}
    assert jvm[("u1", "u2")] == 1.0 and jvm[("u2", "u5")] == 1.0


def test_confirm_pairs_scorer_options(spark):
    """``scorer=`` selects the pass-3 similarity (north_star: Jaccard |
    Jaro-Winkler | Levenshtein). Scores must equal the driver-side
    reference implementations on the same 512-char prefixes."""
    from dedupe_algo_spark.functions.similarity import (
        LEV_CAP,
        _jaro_winkler,
        _levenshtein,
    )

    texts = {
        "u1": "the quick brown fox jumps over the lazy dog",
        "u2": "the quick brown fox jumps over the lazy cat",
        "u3": "completely unrelated text with different words",
        "u4": "x" * 600 + " tail one",  # exceeds the 512-char cap
        "u5": "x" * 600 + " tail two",
    }
    pages = spark.createDataFrame(list(texts.items()), "url string, text string")
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u4", "u5")], "url_a string, url_b string"
    )

    def ref(fn):
        out = {}
        for a, b in [("u1", "u2"), ("u1", "u3"), ("u4", "u5")]:
            out[(a, b)] = fn(texts[a][:LEV_CAP], texts[b][:LEV_CAP])
        return out

    jw = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="jaro_winkler").collect()
    }
    assert jw == ref(_jaro_winkler)
    lev = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="levenshtein").collect()
    }
    assert lev == ref(
        lambda a, b: 1.0 - _levenshtein(a, b) / max(len(a), len(b))
    )
    from dedupe_algo_spark.functions.similarity import _damerau_levenshtein

    dam = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="damerau").collect()
    }
    assert dam == ref(
        lambda a, b: 1.0 - _damerau_levenshtein(a, b) / max(len(a), len(b))
    )

    def py_ngram_jac(a, b, n=5):
        ga = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
        gb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
        return len(ga & gb) / len(ga | gb)

    ng = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="ngram_jaccard").collect()
    }
    assert ng == ref(py_ngram_jac)
    with pytest.raises(ValueError):
        confirm_pairs(pairs, pages, 0.0, scorer="nope").collect()


def test_pipeline_scorer_passthrough(spark, pages_1k):
    """dedup_pipeline(scorer=...) routes the confirm stage through the
    selected scorer; exact tiers are scorer-independent."""
    from dedupe_algo_spark.pipeline import dedup_pipeline

    res = dedup_pipeline(pages_1k, scorer="levenshtein")
    exact = res.clusters.where(F.col("match_kind") == "exact").count()
    assert exact > 0
    res.unpersist()


def test_confirm_pairs_never_shuffles_table_text(spark, pages_1k):
    """The pages table's text column must not ride any Exchange: the
    candidate-url set broadcasts into the semi-join, and only the carved
    slice's renamed _ta/_tb columns move pair-side."""
    from dedupe_algo_spark.plans import exchange_columns

    urls = [r["url"] for r in pages_1k.select("url").limit(2).collect()]
    pairs = spark.createDataFrame([(urls[0], urls[1])], "url_a string, url_b string")
    scored = confirm_pairs(pairs, pages_1k, threshold=0.0)
    moved = exchange_columns(scored)
    assert "text" not in moved, moved
    rows = scored.collect()
    assert len(rows) == 1 and 0.0 <= rows[0]["score"] <= 1.0


def test_confirm_pairs_tfidf_scorer(spark):
    """scorer='tfidf': corpus-IDF-weighted cosine — identical texts
    score 1.0, boilerplate-only overlap scores BELOW its unweighted
    token Jaccard (IDF discounts tokens every doc shares), and no
    Exchange in the plan ever carries the text column."""
    import math

    from dedupe_algo_spark.plans import exchange_columns

    pages = spark.createDataFrame(
        [
            ("u1", "nav home about contact rare1 rare2"),
            ("u2", "nav home about contact rare1 rare2"),
            ("u3", "nav home about contact other3 other4"),
            ("u4", "nav home about contact misc5 misc6"),
        ],
        "url string, text string",
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], "url_a string, url_b string"
    )
    df = confirm_pairs(pairs, pages, 0.0, scorer="tfidf")
    out = {(r["url_a"], r["url_b"]): r["score"] for r in df.collect()}
    assert out[("u1", "u2")] == 1.0
    # unweighted token Jaccard of (u1,u3) is 4/8 = 0.5; the 4 shared
    # tokens appear in ALL 4 docs (df=4 → w=ln(5/5)=0) so cosine = 0
    assert out[("u1", "u3")] == 0.0
    assert "text" not in exchange_columns(df)


def test_confirm_pairs_weighted_jaccard_scorer(spark):
    """scorer='weighted_jaccard': repetition counts. u1/u2 share the
    same token SET but different multiplicities — set Jaccard says
    1.0, the weighted scorer must not."""
    pages = spark.createDataFrame(
        [
            ("u1", "spam spam spam ham"),
            ("u2", "spam ham ham"),
            ("u3", "spam ham"),
        ],
        "url string, text string",
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3")], "url_a string, url_b string"
    )
    out = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="weighted_jaccard").collect()
    }
    assert out[("u1", "u2")] == 2 / 5
    assert out[("u2", "u3")] == 2 / 3
    jac = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0).collect()
    }
    assert jac[("u2", "u3")] == 1.0  # the set scorer can't see counts


def test_confirm_pairs_containment_scorer(spark):
    """scorer='containment': |A∩B|/min(|A|,|B|) — a page embedded
    verbatim in a longer page scores 1.0 while its Jaccard sinks;
    jvm_tokens and pandas paths agree exactly."""
    from dedupe_algo_spark.operators.scoring import confirm_pairs

    inner = "alpha beta gamma delta epsilon"
    texts = {
        "u1": inner,
        "u2": "header menu " + inner + " footer copyright contact",
        "u3": "totally different page about other things entirely",
    }
    pages = spark.createDataFrame(list(texts.items()), "url string, text string")
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], "url_a string, url_b string"
    )
    jvm = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0, scorer="containment").collect()
    }
    pd_ = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(
            pairs, pages, 0.0, jvm_tokens=False, scorer="containment"
        ).collect()
    }
    assert jvm == pd_
    assert jvm[("u1", "u2")] == 1.0  # doc-in-doc
    assert jvm[("u1", "u3")] == 0.0
    # contrast: plain jaccard punishes the embedded pair
    jac = {
        (r["url_a"], r["url_b"]): r["score"]
        for r in confirm_pairs(pairs, pages, 0.0).collect()
    }
    assert jac[("u1", "u2")] == 5 / 10  # inter 5, union 10


def test_null_text_drops_pair_on_both_paths(spark):
    """NULL text must yield a NULL score (dropped by >= threshold) on
    the pandas path exactly like the JVM path — NaN would instead PASS
    any threshold under Spark's NaN ordering."""
    pages = spark.createDataFrame(
        [("u1", "real words here"), ("u2", None)], "url string, text string"
    )
    pairs = spark.createDataFrame([("u1", "u2")], "url_a string, url_b string")
    for kw in (
        {"jvm_tokens": False},  # pandas jaccard
        {"scorer": "jaro_winkler"},
        {"scorer": "damerau"},
        {"scorer": "containment", "jvm_tokens": False},
    ):
        got = confirm_pairs(pairs, pages, 0.0, **kw).collect()
        assert got == [], kw


def test_simhash_blocking_recall_on_synth_corpus(spark, pages_1k, labels_1k):
    """The north_star's pass-1 "SimHash band" blocking path
    (bucket_table(use_simhash=True), 4 bands x 16 bits): identical text
    hashes identically, so EVERY labeled exact-dup pair must share all
    four bands; the 1-5 token substitutions of the synth near copies
    flip few simhash bits, so near-dup recall should stay high while
    the candidate set stays ~pairs-of-dups-sized (no quadratic junk).
    The corpus is a pure function of (seed, index) — counts are pinned."""
    from pyspark.sql import functions as F

    from dedupe_algo_spark.operators.candidates import bucket_table

    bt = bucket_table(
        pages_1k.select("url", "text"),
        use_minhash=False,
        use_cheap_key=False,
        use_simhash=True,
    )
    pairs = candidate_pairs(bt).cache()
    assert pairs.count() == 1216  # ~1.2 candidates/doc, not O(n^2)
    dup = labels_1k.where("is_dup")
    hit = {
        r["kind"]: r["count"]
        for r in dup.join(pairs, ["url_a", "url_b"]).groupBy("kind").count().collect()
    }
    tot = {r["kind"]: r["count"] for r in dup.groupBy("kind").count().collect()}
    assert tot == {"exact": 1014, "near": 150}
    assert hit["exact"] == 1014  # identical text => identical bands, always
    assert hit["near"] == 141  # 94% band recall on 1-5 token mutations
    pairs.unpersist()


def test_dropped_buckets_audits_exactly_the_capped_keys(spark):
    """The no-silent-truncation contract: every bucket candidate_pairs
    excludes for exceeding max_bucket appears in dropped_buckets with
    its true member count — and nothing else does."""
    from dedupe_algo_spark.operators.candidates import dropped_buckets

    rows = (
        [(1, f"h{i}") for i in range(10)]  # hot: 10 members
        + [(2, "a"), (2, "b")]  # kept pair bucket
        + [(3, "x")]  # singleton: pruned but NOT "capped"
    )
    hot = {
        (r["bucket_key"], r["n_members"])
        for r in dropped_buckets(_buckets(spark, rows), max_bucket=5).collect()
    }
    assert hot == {(1, 10)}


def test_estimate_pairs_drops_half_present_pairs(spark):
    """estimate_pairs keeps the inner-join contract on the melt/pivot
    path: a pair with a side absent from sigs is DROPPED before
    scoring (explicit not-null filter — defense-in-depth on top of the
    estimate UDF's own NULL-never-NaN guarantee, minhash.py:293-297;
    a NaN leak would pass any gate under Spark's NaN-above-everything
    ordering)."""
    from dedupe_algo_spark.operators.scoring import estimate_pairs

    sigs = spark.createDataFrame(
        [("u1", [1, 2, 3, 4]), ("u2", [1, 2, 3, 4]), ("u4", [9, 9, 9, 9])],
        "url string, sig array<bigint>",
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u3", "u2"), ("u1", "u4")],
        "url_a string, url_b string",
    )
    got = {
        (r["url_a"], r["url_b"]): r["est_score"]
        for r in estimate_pairs(pairs, sigs, gate=0.5).collect()
    }
    assert got == {("u1", "u2"): 1.0}  # u3 pairs dropped; (u1,u4) est 0.0 < gate
