"""Benchmark decontamination via n-gram overlap."""

from __future__ import annotations

from dedupe_algo_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_quote_flagged(spark):
    """A train doc quoting an eval doc's 4-gram is reported with the
    hit count and earliest position; clean docs are absent."""
    train = _df(
        spark,
        [
            (1, "intro words then the quick brown fox jumps closing words"),
            (2, "completely unrelated training text nothing shared at all"),
        ],
    )
    ev = _df(spark, [(100, "THE QUICK BROWN FOX jumps over")])
    out = contamination_report(train, ev, n=4).toPandas()
    assert list(out["doc_id"]) == [1]
    row = out.iloc[0]
    # grams 'the quick brown fox', 'quick brown fox jumps' both hit
    assert row["n_hits"] == 2
    assert row["first_hit_pos"] == 4
    assert row["n_grams"] == 10 - 3


def test_case_insensitive_and_short_eval(spark):
    """Matching is lowercased on both sides; eval docs shorter than n
    contribute no grams (and cannot spuriously flag)."""
    train = _df(spark, [(1, "alpha beta gamma delta")])
    ev = _df(spark, [(9, "too short"), (10, "ALPHA BETA GAMMA delta")])
    out = contamination_report(train, ev, n=4).toPandas()
    assert list(out["doc_id"]) == [1]
    assert out.iloc[0]["n_hits"] == 1


def test_decontaminate_drops_only_flagged(spark):
    train = _df(
        spark,
        [
            (1, "one two three four five six"),
            (2, "seven eight nine ten eleven"),
            (3, "one two three four different tail"),
        ],
    )
    ev = _df(spark, [(100, "zzz one two three four zzz")])
    kept = decontaminate(train, ev, n=4).toPandas()
    assert sorted(kept["doc_id"]) == [2]
    assert set(kept.columns) == {"doc_id", "text"}


def test_hashed_matches_string_verdicts(spark):
    """hashed=True flags the same documents with the same hit counts
    (collisions at 2^-64 aside) — the production key is semantically
    identical on real inputs."""
    train = _df(
        spark,
        [
            (1, "p q r s t u v"),
            (2, "x y z w q r s t"),
            (3, "none of these words"),
        ],
    )
    ev = _df(spark, [(100, "q r s t")])
    a = contamination_report(train, ev, n=4, hashed=False).toPandas()
    b = contamination_report(train, ev, n=4, hashed=True).toPandas()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df[["doc_id", "n_hits", "first_hit_pos"]].values)
    )
    assert key(a) == key(b) == [(1, 1, 2), (2, 1, 5)]
