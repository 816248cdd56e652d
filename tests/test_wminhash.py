"""ICWS weighted MinHash: collision rate ≈ exact weighted Jaccard."""

from __future__ import annotations

import numpy as np

from dedupe_algo_spark.functions.wminhash import (
    band_keys,
    estimate_wjaccard,
    icws_signature,
    wminhash_signature,
)


def _exact_wj(ca: dict, cb: dict) -> float:
    keys = set(ca) | set(cb)
    mn = sum(min(ca.get(t, 0), cb.get(t, 0)) for t in keys)
    mx = sum(max(ca.get(t, 0), cb.get(t, 0)) for t in keys)
    return mn / mx


def _sig_from_counts(counts: dict, k: int) -> np.ndarray:
    toks = np.asarray(sorted(counts), dtype=np.uint64)
    w = np.asarray([counts[t] for t in sorted(counts)], dtype=np.int64)
    return icws_signature(toks, w, k)


def test_collision_rate_tracks_weighted_jaccard():
    """E[collision] = wJ (Ioffe 2010 Thm 1). At k=2048 the standard
    error is sqrt(p(1-p)/k) ≲ 0.011 — assert within 4σ."""
    rng = np.random.default_rng(7)
    for _ in range(4):
        toks = rng.integers(1, 1 << 62, size=40, dtype=np.uint64)
        ca = {int(t): int(rng.integers(1, 6)) for t in toks}
        cb = dict(ca)
        # perturb: drop some tokens, change some counts
        for t in list(cb)[:15]:
            del cb[t]
        for t in list(cb)[:10]:
            cb[t] += int(rng.integers(1, 4))
        wj = _exact_wj(ca, cb)
        sa = _sig_from_counts(ca, 2048)
        sb = _sig_from_counts(cb, 2048)
        est = estimate_wjaccard(sa, sb)
        assert abs(est - wj) < 0.045, (est, wj)


def test_repetition_separates_sets_weighted_minhash_sees():
    """Same token SET, different counts: unweighted MinHash collides
    100%, ICWS must collide at the weighted rate."""
    ca = {1: 10, 2: 1}
    cb = {1: 1, 2: 1}
    wj = _exact_wj(ca, cb)  # (1+1)/(10+1) = 2/11
    est = estimate_wjaccard(
        _sig_from_counts(ca, 2048), _sig_from_counts(cb, 2048)
    )
    assert abs(est - wj) < 0.045
    assert est < 0.35  # far from the set-Jaccard 1.0


def test_signature_deterministic_and_text_path():
    s1 = wminhash_signature("a b b c")
    s2 = wminhash_signature("a b b c")
    assert np.array_equal(s1, s2)
    assert wminhash_signature("") .tolist() == [0] * len(s1)
    assert wminhash_signature(None) is None
    # identical multisets in different orders hash identically
    s3 = wminhash_signature("b a c b")
    assert np.array_equal(s1, s3)


def test_band_keys_shape_and_sensitivity():
    s1 = wminhash_signature("x y z w " * 10)
    s2 = wminhash_signature("x y z w " * 10 + "extra " * 30)
    b1, b2 = band_keys(s1), band_keys(s2)
    assert len(b1) == 16
    assert np.array_equal(band_keys(s1), b1)  # deterministic
    shared = int((b1 == b2).sum())
    assert 0 < shared  # near-dup multisets share bands...
    s3 = wminhash_signature("completely different tokens here")
    assert int((band_keys(s3) == b1).sum()) == 0  # ...unrelated don't


def test_wminhash_candidate_pairs_recall_on_twins(spark):
    """Spark-side: planted near-twins (one token changed out of 40)
    must surface as candidates; unrelated docs must not pair."""
    from dedupe_algo_spark.operators.candidates import (
        wminhash_candidate_pairs,
    )
    from dedupe_algo_spark.operators.corpus_stats import (
        weighted_jaccard_pairs,
    )

    rows = []
    for i in range(30):
        base = " ".join(f"w{i}_{j}" for j in range(40))
        rows.append((i, base))
        rows.append((1000 + i, base.replace(f"w{i}_0 ", f"CHANGED{i} ", 1)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cand = wminhash_candidate_pairs(docs)
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    expected = {(i, 1000 + i) for i in range(30)}
    assert expected <= got  # every planted twin pair surfaced
    # no cross-document junk: disjoint vocabularies never bucket
    assert got == expected
    # confirm tier agrees: twins score 39/41, nothing else survives
    scored = weighted_jaccard_pairs(docs, cand.select("id_a", "id_b"))
    vals = {v.wjaccard for v in scored.collect()}
    assert vals == {39 / 41}
