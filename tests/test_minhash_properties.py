"""Property-based coverage of the MinHash/OPH kernel
(functions/minhash.py) — pure driver-side numpy, no SparkSession.

These pin the sketch's CONTRACT, not specific values: determinism,
identical-text ⇒ identical signature (the property LSH bucketing and
the band gate rely on for recall of exact/near copies), the Jaccard
estimator's bounds/identity, and monotone-ish behavior under token
overlap (statistical, tested with wide margins only)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_algo_spark.functions.minhash import (
    NUM_PERM,
    estimate_jaccard,
    minhash_band_keys,
    minhash_signature,
)

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_text = st.lists(_word, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=80, deadline=None)
@given(_text)
def test_signature_deterministic_and_shaped(t):
    s1, s2 = minhash_signature(t), minhash_signature(t)
    if len(t.split()) == 0:
        assert s1 is None or len(s1) == NUM_PERM  # empty-doc contract
        return
    assert (s1 == s2).all()
    assert len(s1) == NUM_PERM
    assert minhash_signature(None) is None


@settings(max_examples=80, deadline=None)
@given(_text)
def test_band_keys_deterministic(t):
    b1, b2 = minhash_band_keys(t), minhash_band_keys(t)
    if b1 is None:
        assert b2 is None
        return
    assert (b1 == b2).all()


@settings(max_examples=60, deadline=None)
@given(_text, _text)
def test_estimator_bounds_and_identity(a, b):
    sa, sb = minhash_signature(a), minhash_signature(b)
    if sa is None or sb is None:
        return
    est = estimate_jaccard(sa, sb)
    assert 0.0 <= est <= 1.0
    assert estimate_jaccard(sa, sa) == 1.0
    assert est == estimate_jaccard(sb, sa)


def test_identical_docs_share_every_band():
    t = "the quick brown fox jumps over the lazy dog " * 4
    assert (minhash_band_keys(t) == minhash_band_keys(t)).all()


def test_estimator_tracks_overlap_with_margin():
    """Statistical sanity with wide margins: ~90% token overlap must
    estimate far above ~10% overlap (this is the property the band
    gate's binomial argument needs; exact values are sketch noise)."""
    random.seed(5)
    base = [f"w{i}" for i in range(100)]
    near = base[:90] + [f"x{i}" for i in range(10)]
    far = base[:10] + [f"y{i}" for i in range(90)]
    s = minhash_signature(" ".join(base))
    e_near = estimate_jaccard(s, minhash_signature(" ".join(near)))
    e_far = estimate_jaccard(s, minhash_signature(" ".join(far)))
    assert e_near > 0.5 > e_far
    assert e_near > e_far + 0.3


# --- SimHash kernel (functions/simhash.py), same driver-side style ---


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@settings(max_examples=80, deadline=None)
@given(_text)
def test_simhash_deterministic_64bit(t):
    from dedupe_algo_spark.functions.simhash import simhash64

    s1, s2 = simhash64(t), simhash64(t)
    assert s1 == s2
    if s1 is not None:
        assert -(1 << 63) <= s1 < (1 << 63)  # stored as Spark LONG
    assert simhash64(None) is None


def test_simhash_near_text_small_hamming():
    from dedupe_algo_spark.functions.simhash import simhash64

    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" for i in range(198)) + " q1 q2"
    far = " ".join(f"z{i}" for i in range(200))
    d_near = _ham(simhash64(base), simhash64(near))
    d_far = _ham(simhash64(base), simhash64(far))
    assert d_near < 8 < d_far  # Charikar: cosine-close ⇒ few flipped bits
