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
        (7, None),  # NULL text — must behave exactly like empty
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_chunks_match_pure_python_reference(spark, docs):
    out = chunk_documents(docs, chunk_tokens=32, overlap=8).toPandas()
    src = {r["doc_id"]: r["text"] or "" for r in docs.collect()}
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
    src = {r["doc_id"]: r["text"] or "" for r in docs.collect()}
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
    # empty, whitespace-only, and NULL docs each yield one empty chunk
    for eid in (4, 5, 7):
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


def _ref_pack(rows, seq_len, sep):
    """Driver-side reference: concat per shard in pos order with `sep`
    separator slots per doc, cut into seq_len blocks, emit segments."""
    out = []
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs_ in by_shard.items():
        off = 0
        for r in sorted(docs_, key=lambda r: r["pos"]):
            n = len((r["text"] or "").split())
            lo, hi = off, off + n
            b = lo // seq_len
            while n and b * seq_len < hi:
                gs, ge = max(lo, b * seq_len), min(hi, (b + 1) * seq_len)
                out.append(
                    dict(
                        doc_id=r["doc_id"],
                        shard=shard,
                        block=b,
                        doc_start=gs - lo,
                        block_off=gs - b * seq_len,
                        n_toks=ge - gs,
                    )
                )
                b += 1
            off = hi + sep
    return out


@pytest.fixture(scope="module")
def sharded(spark):
    # two shards; pos order is the training order. Doc 4 is empty (its
    # separator slot still shifts later offsets); doc 0 spans blocks.
    rows = [
        (0, 0, 1, " ".join(f"a{i}" for i in range(23))),  # spans 3 blocks of 10
        (1, 0, 2, "one two three"),
        (4, 0, 3, ""),  # empty: sep slot only
        (2, 0, 4, " ".join(f"b{i}" for i in range(10))),  # exactly one block long
        (3, 1, 1, " ".join(f"c{i}" for i in range(7))),
        (6, 1, 2, None),  # NULL text: separator slot only, like empty
        (5, 1, 3, "x"),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, shard int, pos int, text string"
    ).cache()


def test_pack_sequences_matches_reference(spark, sharded):
    from dedupe_algo_spark.operators.chunking import pack_sequences

    got = (
        pack_sequences(sharded, seq_len=10, sep_tokens=1)
        .toPandas()
        .sort_values(["shard", "block", "block_off"])
        .reset_index(drop=True)
    )
    want = sorted(
        _ref_pack([r.asDict() for r in sharded.collect()], 10, 1),
        key=lambda d: (d["shard"], d["block"], d["block_off"]),
    )
    assert len(got) == len(want)
    for i, w in enumerate(want):
        for k, v in w.items():
            assert got.loc[i, k] == v, (i, k, dict(got.loc[i]))


def test_pack_sequences_invariants(spark, sharded):
    from dedupe_algo_spark.operators.chunking import pack_sequences

    seq_len, sep = 10, 1
    out = pack_sequences(sharded, seq_len=seq_len, sep_tokens=sep).toPandas()
    src = {r["doc_id"]: (r["text"] or "").split() for r in sharded.collect()}
    # segment bounds and disjointness within each block
    for (_, _), grp in out.groupby(["shard", "block"]):
        assert (grp["block_off"] >= 0).all()
        assert ((grp["block_off"] + grp["n_toks"]) <= seq_len).all()
        assert (grp["n_toks"] >= 1).all()
        ivs = sorted(zip(grp["block_off"], grp["block_off"] + grp["n_toks"]))
        assert all(a_end <= b_start for (_, a_end), (b_start, _) in zip(ivs, ivs[1:]))
    # per-document token conservation, in order, gap-free
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values(["block", "block_off"])
        assert grp["n_toks"].sum() == len(src[doc_id])
        starts = list(grp["doc_start"])
        ends = list(grp["doc_start"] + grp["n_toks"])
        assert starts[0] == 0 and ends[-1] == len(src[doc_id])
        assert all(e == s for e, s in zip(ends, starts[1:]))
    # empty docs emit no segment but DO shift the stream: doc 2 starts
    # after doc 0 (23+1) + doc 1 (3+1) + empty doc 4 (0+1) = 29 slots
    d2 = out[out["doc_id"] == 2].sort_values("block")
    assert list(d2["block"]) == [2, 3]
    assert list(d2["block_off"]) == [9, 0]
    # empty (4) and NULL-text (6) docs emit no segments — but doc 6's
    # separator slot shifted doc 5 (shard 1: 7+1 c-tokens + 0+1 = 9)
    assert {4, 6}.isdisjoint(set(out["doc_id"]))
    d5 = out[out["doc_id"] == 5]
    assert list(d5["block"]) == [0] and list(d5["block_off"]) == [9]


def test_pack_sequences_validation(spark, sharded):
    from dedupe_algo_spark.operators.chunking import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(sharded, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(sharded, seq_len=10, sep_tokens=-1)


def test_chunk_and_pack_parameter_grid(spark, docs, sharded):
    """Sweep the parameter space against the pure-python references:
    the window/packing arithmetic must hold for every (chunk, overlap)
    and (seq_len, sep) combination, not just the defaults."""
    from dedupe_algo_spark.operators.chunking import pack_sequences

    src = {r["doc_id"]: r["text"] or "" for r in docs.collect()}
    for chunk_tokens, overlap in [(2, 0), (2, 1), (5, 2), (10, 9), (50, 10)]:
        out = chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=overlap
        ).toPandas()
        for doc_id, text in src.items():
            want = _ref_chunks(text, chunk_tokens, overlap)
            got = (
                out[out["doc_id"] == doc_id]
                .sort_values("chunk_idx")
                .reset_index(drop=True)
            )
            assert len(got) == len(want), (chunk_tokens, overlap, doc_id)
            for i, w in enumerate(want):
                assert got.loc[i, "chunk_text"] == " ".join(w), (
                    chunk_tokens,
                    overlap,
                    doc_id,
                    i,
                )

    rows = [r.asDict() for r in sharded.collect()]
    for seq_len, sep in [(1, 0), (3, 2), (7, 1), (10, 0), (64, 1)]:
        got = (
            pack_sequences(sharded, seq_len=seq_len, sep_tokens=sep)
            .toPandas()
            .sort_values(["shard", "block", "block_off"])
            .reset_index(drop=True)
        )
        want = sorted(
            _ref_pack(rows, seq_len, sep),
            key=lambda d: (d["shard"], d["block"], d["block_off"]),
        )
        assert len(got) == len(want), (seq_len, sep)
        for i, w in enumerate(want):
            for k, v in w.items():
                assert got.loc[i, k] == v, (seq_len, sep, i, k)
