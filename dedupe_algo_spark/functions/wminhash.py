"""Weighted MinHash via Improved Consistent Weighted Sampling (ICWS,
Ioffe, ICDM 2010 — public): a sketch whose per-slot collision
probability EQUALS the weighted (multiset) Jaccard
``Σ_t min(wA,wB) / Σ_t max(wA,wB)``, the same measure
``operators/corpus_stats.weighted_jaccard_pairs`` computes exactly.
Unweighted MinHash treats a token repeated 100× like a token used
once; ICWS is the candidate-generation counterpart of the weighted
confirm scorer — bucket with this, confirm with the exact operator.

All randomness is COUNTER-BASED (splitmix64 finalizers over the
token's SipHash, the slot index k, and a stream constant), so every
executor derives identical samples with zero broadcast state and the
sketch is deterministic across runs, partitionings, and retries —
the same property the OPH MinHash path relies on. Gamma(2,1) samples
come from −ln(u1)−ln(u2) (sum of two exponentials), Uniform(0,1)
from the 53-bit mantissa trick.

Per (token t, slot k), following Ioffe's Algorithm 1:

    r ~ Gamma(2,1), c ~ Gamma(2,1), beta ~ Uniform(0,1)
    t_k   = floor(ln w_t / r + beta)
    ln y  = r * (t_k − beta)
    ln a  = ln c − ln y − r
    slot k emits argmin_t ln a, hashed together with its t_k

Vectorized numpy over a (tokens × slots) grid inside an Arrow-batched
pandas UDF — no per-row Python in the Spark plan, no shuffle of text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

NUM_SLOTS = 64
WLSH_BANDS = 16  # 16 bands × 4 rows: catches wJ ≳ 0.7 w.h.p.

_PHI = np.uint64(0x9E3779B97F4A7C15)  # 2^64/φ — Weyl increment
# independent stream constants for the five uniforms per (t, k)
_STREAMS = [np.uint64(x) for x in (
    0xD6E8FEB86659FD93,
    0xA5A5A5A5A5A5A5A5,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)]


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 (wraparound intended)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    """uint64 → Uniform(0,1), never 0 or 1 (53-bit mantissa + ½ulp)."""
    return ((x >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)


def _grid_uniform(th: np.ndarray, stream: np.uint64, k: int) -> np.ndarray:
    """(T × K) deterministic uniforms for one stream: counter =
    token-hash + PHI·(slot+1) + stream, splitmix-finalized."""
    ks = _PHI * (np.arange(1, k + 1, dtype=np.uint64))
    return _uniform(_splitmix(th[:, None] + ks[None, :] + stream))


def icws_signature(
    tokens: np.ndarray, weights: np.ndarray, k: int = NUM_SLOTS
) -> np.ndarray:
    """ICWS sketch of one weighted set → int64[k]. ``tokens`` are
    uint64 token hashes (deduplicated), ``weights`` their positive
    counts. Empty input → all-zero signature (two empty docs compare
    identical, matching the exact operator's convention)."""
    if len(tokens) == 0:
        return np.zeros(k, dtype=np.int64)
    th = tokens.astype(np.uint64)
    u1, u2, u3, u4, u5 = (_grid_uniform(th, s, k) for s in _STREAMS)
    r = -np.log(u1) - np.log(u2)          # Gamma(2,1)
    ln_c = np.log(-np.log(u3) - np.log(u4))
    beta = u5
    ln_w = np.log(weights.astype(np.float64))[:, None]
    t_k = np.floor(ln_w / r + beta)
    ln_y = r * (t_k - beta)
    ln_a = ln_c - ln_y - r
    best = np.argmin(ln_a, axis=0)        # winning token per slot
    cols = np.arange(k)
    mixed = _splitmix(
        th[best] + _PHI * t_k[best, cols].astype(np.int64).astype(np.uint64)
    )
    return mixed.astype(np.int64)


def _token_counts(text: str) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens (Python str.split — the shared tokenizer
    contract) → (uint64 SipHash ids, counts). Token identity is
    pd.util.hash_array, the same hash the MinHash shingler uses."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(toks, dtype=object))
    uniq, counts = np.unique(h, return_counts=True)
    return uniq, counts


def wminhash_signature(text: str | None, k: int = NUM_SLOTS):
    if text is None:
        return None
    tokens, counts = _token_counts(text)
    return icws_signature(tokens, counts, k)


@pandas_udf(ArrayType(LongType()))
def wminhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [wminhash_signature(t) for t in texts.values], index=texts.index
    )


_BAND_FOLD = np.uint64(0x9E3779B97F4A7C15)


def band_keys(sig: np.ndarray, bands: int = WLSH_BANDS) -> np.ndarray:
    """Fold the signature into ``bands`` int64 band keys (rows/band =
    len(sig)//bands), same multiplier-fold as the unweighted LSH."""
    rows = len(sig) // bands
    m = sig.astype(np.uint64).reshape(bands, rows)
    out = np.zeros(bands, dtype=np.uint64)
    for j in range(rows):
        out = out * _BAND_FOLD + m[:, j]
    # mix the band index in so identical folds in different bands
    # never bucket together
    return _splitmix(out + _PHI * np.arange(bands, dtype=np.uint64)).astype(
        np.int64
    )


@pandas_udf(ArrayType(LongType()))
def wband_udf(sigs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if s is None else band_keys(np.asarray(s, dtype=np.int64))
            for s in sigs.values
        ],
        index=sigs.index,
    )


def estimate_wjaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """Collision-fraction estimator — E[estimate] = weighted Jaccard
    (Ioffe 2010, Thm 1). Driver-side helper for tests/diagnostics."""
    return float(np.mean(np.asarray(sa) == np.asarray(sb)))
