"""Sliding-window document chunking (operators/chunking.py)."""

from __future__ import annotations

import math

import pytest

from dedupe_algo_spark.operators.chunking import chunk_documents


def _ref_chunks(text: str, chunk_tokens: int, overlap: int):
    toks = text.split()
    step = chunk_tokens - overlap
    n_chunks = max(1, math.ceil((len(toks) - overlap) / step))
    return [
        toks[i * step : i * step + chunk_tokens] for i in range(n_chunks)
    ]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(100))),  # many chunks
        (1, " ".join(f"u{i}" for i in range(32))),  # exactly one window
        (2, " ".join(f"v{i}" for i in range(33))),  # one token of spill
        (3, "short doc"),  # shorter than a window
        (4, ""),  # empty
        (5, "   \t  "),  # whitespace-only
        (6, " ".join(f"w{i}" for i in range(24))),  # exactly one step
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_chunks_match_pure_python_reference(spark, docs):
    out = chunk_documents(docs, chunk_tokens=32, overlap=8).toPandas()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in src.items():
        want = _ref_chunks(text, 32, 8)
        got = (
            out[out["doc_id"] == doc_id]
            .sort_values("chunk_idx")
            .reset_index(drop=True)
        )
        assert list(got["chunk_idx"]) == list(range(len(want))), doc_id
        for i, w in enumerate(want):
            assert got.loc[i, "chunk_text"] == " ".join(w), (doc_id, i)
            assert got.loc[i, "n_tokens"] == len(w), (doc_id, i)


def test_coverage_and_overlap_invariants(spark, docs):
    """Every token appears in some chunk; consecutive chunks share
    exactly `overlap` tokens (except possibly with a short final
    chunk); empty docs still emit one empty chunk."""
    out = chunk_documents(docs, chunk_tokens=32, overlap=8).toPandas()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        chunks = [c.split() if c else [] for c in grp["chunk_text"]]
        toks = src[doc_id].split()
        # consecutive chunks share exactly the 8 overlap tokens (the
        # last chunk may be shorter than the overlap itself)
        for a, b in zip(chunks, chunks[1:]):
            k = min(8, len(b))
            assert b[:k] == a[24 : 24 + k], doc_id
        # coverage: concatenating de-overlapped chunks rebuilds the doc
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            rebuilt.extend(c[8:])
        assert rebuilt == toks, doc_id
    # empty and whitespace-only docs each yield exactly one empty chunk
    for eid in (4, 5):
        grp = out[out["doc_id"] == eid]
        assert len(grp) == 1
        assert grp.iloc[0]["chunk_idx"] == 0
        assert grp.iloc[0]["chunk_text"] == ""
        assert grp.iloc[0]["n_tokens"] == 0


def test_overlap_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=32, overlap=32)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=32, overlap=-1)
