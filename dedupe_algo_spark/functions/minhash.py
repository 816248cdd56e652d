"""MinHash signatures + LSH banding, vectorized via Arrow batches.

The scale path for near-duplicate candidate generation: shingle → minhash
→ band → bucket-join (per the task spec's dedup requirements and
BASELINE.json's "MinHash-Jaccard" scoring). Signature math is pure numpy
(universal hashing ``a*h+b mod 2^64`` over SipHash token/shingle hashes);
banding is a cheap reduction over the signature matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType, StringType

NUM_PERM = 128
LSH_BANDS = 32  # 32 bands × 4 rows → catches Jaccard ≳ 0.7 w.h.p.
_SEED = 0x5EED_ABCD


def _perm_params(num_perm: int = NUM_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_SEED)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of k-word shingles (k=3); falls back to unigrams for short
    texts. SipHash via pandas.util.hash_array — vectorized, deterministic."""
    toks = text.split()
    if len(toks) < k:
        items = toks if toks else [""]
    else:
        items = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(pd.util.hash_array(np.asarray(items, dtype=object)))


def minhash_signature(text: str | None, k: int = 3) -> np.ndarray | None:
    if text is None:
        return None
    h = _shingle_hashes(text, k)
    # (n_shingles, num_perm) universal hashes, min over shingles
    vals = h[:, None] * _A[None, :] + _B[None, :]  # uint64 wraparound == mod 2^64
    return vals.min(axis=0).astype(np.int64)  # two's-complement view for Spark long


@pandas_udf(ArrayType(LongType()))
def minhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(minhash_signature)


@pandas_udf(ArrayType(StringType()))
def minhash_bands(signatures: pd.Series) -> pd.Series:
    """Band keys ``'m{band}:{hash-of-rows}'`` — one per LSH band. Explode
    JVM-side to get bucket rows; equal band key ⇒ candidate pair."""
    rows = NUM_PERM // LSH_BANDS

    def bands(sig: list[int] | None) -> list[str] | None:
        if sig is None:
            return None
        arr = np.asarray(sig, dtype=np.int64).reshape(LSH_BANDS, rows)
        keys = pd.util.hash_array(arr.view(np.uint64).sum(axis=1) ^ np.arange(LSH_BANDS, dtype=np.uint64))
        return [f"m{i}:{int(v):x}" for i, v in enumerate(keys)]

    return signatures.map(bands)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))


@pandas_udf(DoubleType())
def minhash_jaccard_udf(sig_a: pd.Series, sig_b: pd.Series) -> pd.Series:
    """Estimated Jaccard from two signature columns on a candidate-pair
    DataFrame — one vectorized comparison per pair."""
    out = np.empty(len(sig_a), dtype=np.float64)
    for i, (a, b) in enumerate(zip(sig_a.values, sig_b.values)):
        if a is None or b is None:
            out[i] = np.nan
        else:
            out[i] = float(np.mean(np.asarray(a) == np.asarray(b)))
    return pd.Series(out)
