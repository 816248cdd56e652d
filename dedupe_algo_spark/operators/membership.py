"""Bloom-filter membership gate — batch-vs-corpus joins at 10^12 rows.

The incremental-ingest joins (sources/bucketed.py) move only the new
batch, but the CORPUS side of an anti/lookup join must still be scanned
and, when the corpus is not laid out as a bucketed table (ad-hoc
snapshots, foreign tables), fully shuffled.  The classic fix — and what
Spark itself injects for equi-joins under
``spark.sql.optimizer.runtime.bloomFilter.enabled`` (Spark 3.3+, JVM
side only) — is a Bloom-filter semi-join reduction: build a bloom over
the SMALL side's join keys, broadcast it, and drop big-side rows that
cannot possibly match *before* they reach the exchange.

This module is the PySpark-native form of that reduction, for the
window where the runtime filter does not apply (Python-visible gate,
non-equi pre-aggregation steps, or a batch too big to broadcast as a
hash relation but fine as a bloom): a bloom costs ~10-14 BITS per key
vs ~10^2-10^3 bits per key for a broadcast hash relation, so a 10^9-key
batch (~2 GB bloom at 1e-3 fpp) still broadcasts where a hash join
cannot.  Corpus-side exchange bytes after the gate scale with
``overlap + fpp * corpus`` instead of ``corpus``.

Correctness is EXACT by construction: blooms have no false negatives,
so gating the corpus by a bloom built over the batch keys can never
drop a corpus row whose key the batch contains; false positives only
let extra non-matching rows into the exact join that follows, where
they fall out.  (Gating the BATCH by a corpus bloom would be the
approximate direction — not offered here.)

Engineering shape (all hashing JVM-side, no per-row Python anywhere):

* positions use Kirsch–Mitzenmacher double hashing — two ``xxhash64``
  evaluations per key, ``pos_i = (h1 + i*h2) mod m`` — reduced mod m
  *before* combining so ANSI-mode long arithmetic cannot overflow;
* the bit array is built DISTRIBUTED: explode the k positions, reduce
  to ``(word, bit_or(mask))`` with map-side partial aggregation — the
  only shuffle is slim (long, long) pairs bounded by m/64 regardless of
  batch size — then the driver scatters ≤ m/64 rows into a numpy array;
* the probe is one Arrow-batched pandas UDF over the k JVM-computed
  positions per row: two vectorized numpy gathers, no Python loop.

Reference parity: the reference keeps a seen-set per scan to skip
already-hashed files (dedupe.rs duplicate cache); this is that seen-set
contract expressed at a scale where the set itself must be sketched.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Salt distinguishing h2 from h1. Any fixed string works; changing it
# changes every bloom's bit pattern (build and probe share it via
# _positions, so they cannot desynchronize).
_H2_SALT = "dedupe-bloom-h2"

# Floor on m: keeps the degenerate empty/tiny-batch blooms well-formed
# (h2 needs m-1 >= 1; a 64-bit array needs >= 1 word).
_MIN_BITS = 64


def bloom_plan(expected_items: int, fpp: float = 1e-3) -> tuple[int, int]:
    """Standard sizing: optimal ``m = -n ln p / (ln 2)^2`` bits and
    ``k = (m/n) ln 2`` hashes for ``expected_items`` keys at ``fpp``."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(_MIN_BITS, m)
    k = max(1, round((m / n) * math.log(2)))
    return m, k


def _positions(col: Column, m: int, k: int) -> list[Column]:
    """The k bit positions of a key — shared by build and probe.

    Kirsch–Mitzenmacher: ``(h1 + i*h2) mod m`` with h1, h2 reduced mod
    m first so ``i*h2`` stays ≤ ~2^45 (ANSI long arithmetic, no
    overflow), and h2 forced into [1, m-1] so the k positions never
    collapse onto one bit.
    """
    h1 = F.pmod(F.xxhash64(col), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.lit(_H2_SALT), col), F.lit(m - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


@dataclass(frozen=True)
class KeyBloom:
    """A built bloom: packed little-endian 64-bit words + its geometry.

    ``bits`` is ``ceil(m/64)`` uint64 words; bit ``p`` of the filter is
    word ``p >> 6``, bit ``p & 63``.
    """

    bits: np.ndarray  # uint64[ceil(m/64)]
    m: int
    k: int
    n_items: int  # number of rows the build saw (not distinct keys)

    @property
    def fpp_estimate(self) -> float:
        """Occupancy-based estimate ``(set_bits/m)^k`` — tighter than
        the design fpp when the batch had fewer distinct keys than
        ``expected_items``."""
        # numpy<2 has no bitwise_count; popcount via unpackbits on bytes
        occ = int(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.m
        return occ**self.k

    def might_contain(self, col: Column) -> Column:
        """Boolean Column: could ``col``'s value have been inserted?
        JVM computes the k positions; one Arrow-batched pandas UDF does
        the two vectorized bit-gathers against the broadcast words."""
        bits = self.bits  # close over the numpy array, not self

        @F.pandas_udf("boolean")
        def _probe(pos: pd.Series) -> pd.Series:
            if len(pos) == 0:
                return pd.Series(np.empty(0, dtype=bool))
            mat = np.vstack(pos.to_numpy())  # (rows, k) int64
            words = bits[mat >> 6]
            hit = (words >> (mat & np.int64(63)).astype(np.uint64)) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        return _probe(F.array(*_positions(col, self.m, self.k)))

    def gate(self, df: DataFrame, key: str) -> DataFrame:
        """``df`` filtered to rows whose ``key`` possibly matches —
        the corpus-side semi-join reduction."""
        return df.where(self.might_contain(F.col(key)))


def build_key_bloom(
    df: DataFrame,
    key: str,
    expected_items: int | None = None,
    fpp: float = 1e-3,
) -> KeyBloom:
    """Build a :class:`KeyBloom` over ``df[key]`` distributed.

    ``expected_items`` sizes the filter (defaults to a count of ``df``
    — pass it when known to save the job).  The build's only shuffle is
    the ``(word, bit_or(mask))`` reduction: slim (long, long) pairs,
    map-side partially aggregated, ≤ m/64 rows reach the driver however
    large the batch is.
    """
    if expected_items is None:
        expected_items = df.count()
    m, k = bloom_plan(expected_items, fpp)
    col = F.col(key)
    packed = (
        df.select(F.explode(F.array(*_positions(col, m, k))).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .toPandas()
    )
    bits = np.zeros((m + 63) >> 6, dtype=np.uint64)
    if len(packed):
        words = packed["word"].to_numpy(dtype=np.int64)
        masks = packed["mask"].to_numpy(dtype=np.int64).view(np.uint64)
        bits[words] = masks
    return KeyBloom(bits=bits, m=m, k=k, n_items=expected_items)


def incremental_unseen_bloom(
    batch: DataFrame,
    corpus: DataFrame,
    key: str = "content_sha256",
    fpp: float = 1e-3,
    expected_items: int | None = None,
) -> DataFrame:
    """EXACT ``incremental_unseen`` (sources/bucketed.py) with a bloom
    semi-join reduction on the corpus side: rows of ``batch`` whose
    ``key`` is absent from ``corpus``.

    Build over the batch keys (small side), gate the corpus scan, then
    the same left-anti join — identical output (no false negatives ⇒
    no corpus match is ever dropped; false positives fall out of the
    exact join), but the corpus contributes ``overlap + fpp*|corpus|``
    rows to the join instead of ``|corpus|``.
    """
    bloom = build_key_bloom(batch, key, expected_items=expected_items, fpp=fpp)
    return batch.join(bloom.gate(corpus, key).select(key), on=key, how="left_anti")
