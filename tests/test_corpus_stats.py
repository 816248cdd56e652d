"""Corpus-level token statistics: TF-IDF salience + unigram LM."""

from __future__ import annotations

import math

from dedupe_algo_spark.operators.corpus_stats import (
    document_frequency,
    tfidf_topk,
    unigram_lm_quality,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_document_frequency_distinct_docs(spark):
    docs = _df(spark, [(1, "a a b"), (2, "b c"), (3, "C c")])
    out = dict(
        map(tuple, document_frequency(docs).toPandas()[["token", "df"]].values)
    )
    # lowercased; per-DISTINCT-doc: 'a' once despite two occurrences
    assert out == {"a": 1, "b": 2, "c": 2}


def test_tfidf_topk_ordering_and_score(spark):
    docs = _df(
        spark,
        [
            (1, "rare rare common tie1 tie2"),
            (2, "common other words here"),
            (3, "common again more text"),
        ],
    )
    out = tfidf_topk(docs, k=3).toPandas()
    d1 = out[out.doc_id == 1].sort_values("rank")
    # tf desc first: 'rare' (tf=2); then df asc + token asc among tf=1
    # singletons (common has df=3, loses to the df=1 ties)
    assert list(d1["token"]) == ["rare", "tie1", "tie2"]
    r = d1.iloc[0]
    assert (r["tf"], r["df"]) == (2, 1)
    assert r["tfidf"] == round(2 * math.log((3 + 1) / (1 + 1)), 6)


def test_unigram_lm_quality_reference_exact(spark):
    """Cross-entropy equals the closed-form reference on a corpus small
    enough to hand-compute; rare-token docs score strictly higher."""
    docs = _df(
        spark,
        [
            (1, "the the the"),
            (2, "the zzz"),
        ],
    )
    # corpus counts: the=4, zzz=1, T=5
    out = (
        unigram_lm_quality(docs).toPandas().set_index("doc_id").sort_index()
    )
    ce1 = math.log2(5) - math.log2(4)
    ce2 = math.log2(5) - (math.log2(4) + math.log2(1)) / 2
    assert abs(out.loc[1, "cross_entropy"] - ce1) < 1e-9
    assert abs(out.loc[2, "cross_entropy"] - ce2) < 1e-9
    assert out.loc[2, "cross_entropy"] > out.loc[1, "cross_entropy"]
    assert list(out["n_tokens"]) == [3, 2]


def test_empty_docs_excluded(spark):
    docs = _df(spark, [(1, "words here"), (2, ""), (3, "   ")])
    out = unigram_lm_quality(docs).toPandas()
    assert sorted(out["doc_id"]) == [1]
    top = tfidf_topk(docs, k=2).toPandas()
    assert sorted(set(top["doc_id"])) == [1]
