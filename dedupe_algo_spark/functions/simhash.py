"""SimHash — near-duplicate signature, vectorized via Arrow batches.

Generalizes the reference's cheap pass-1 key (group-by-size, lib.rs:54-58)
to content-aware blocking per BASELINE.json north_star ("SimHash band via
vectorized Arrow UDFs"). Token hashing uses ``pandas.util.hash_array``
(SipHash in Cython — deterministic, vectorized); the 64 bit-majorities are
computed with ``np.unpackbits`` matrix ops, so there is no per-token
Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

SIMHASH_BITS = 64
DEFAULT_BANDS = 4  # 4 bands × 16 bits


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object))


def simhash64(text: str | None) -> int | None:
    if text is None:
        return None
    h = _token_hashes(text)
    if len(h) == 0:
        return 0
    bits = np.unpackbits(h.view(np.uint8).reshape(len(h), 8), axis=1, bitorder="little")
    maj = (bits.sum(axis=0) * 2 >= len(h)).astype(np.uint8)
    val = int(np.packbits(maj, bitorder="little").view(np.uint64)[0])
    return val - (1 << 64) if val >= 1 << 63 else val  # two's-complement into int64


@pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    return texts.map(simhash64)


def simhash_bands(simhash: Column, n_bands: int = DEFAULT_BANDS) -> Column:
    """Split a 64-bit simhash into band keys (``'s{k}:{hex}'``) using
    built-in bit ops — JVM-side, codegen-friendly. ``explode`` the result
    to get one LSH bucket row per band."""
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = [
        F.concat(
            F.lit(f"s{k}:"),
            F.hex(F.shiftrightunsigned(simhash, k * width).bitwiseAND(F.lit(mask))),
        )
        for k in range(n_bands)
    ]
    return F.array(*bands)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes — built-in
    ``bit_count(a XOR b)``."""
    return F.bit_count(a.bitwiseXOR(b))
