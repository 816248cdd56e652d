"""Similarity search over embedding columns (`array<float>`).

Two paths per the task spec:

* **Brute-force cosine top-k** — correctness baseline. Cosine is a pure
  built-in reduction (``aggregate``/``zip_with`` over the two arrays —
  JVM-side, no Python), the query side is broadcast, and top-k is a
  ranking window per query. O(N·Q) but fully distributed; right answer
  at any scale, right *choice* only for small Q.
* **LSH-bucketed (random hyperplane / SimHash-for-vectors)** — the scale
  path: each vector hashes to ``n_tables`` signature buckets via random
  hyperplanes (Charikar 2002); neighbors are only scored within shared
  buckets. Recall is tunable with (n_bits, n_tables); candidate scoring
  reuses the same built-in cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_HP_SEED = 0xA11CE


def cosine_sim(a: Column, b: Column) -> Column:
    """Built-in cosine similarity between two float arrays (zip_with dot
    product + aggregate norms) — stays JVM-side. Elements are widened to
    double first so results are reproducible across engines (float32
    accumulation order would diverge from any f64 oracle)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """→ (query_id, vec_id, cosine, rank ≤ k). ``queries`` is broadcast
    (small side); the big side streams — one wide map + a per-query
    top-k window, no all-pairs shuffle."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    crossed = vectors.select(id_col, vec_col).crossJoin(q)
    scored = crossed.select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int) -> np.ndarray:
    rng = np.random.default_rng([_HP_SEED, dim, n_bits, n_tables])
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def hyperplane_buckets(dim: int, n_bits: int = 12, n_tables: int = 4):
    """Returns an Arrow-batched UDF mapping a vector to its ``n_tables``
    LSH bucket keys (sign pattern under random hyperplanes).

    The whole Arrow batch is hashed with ONE stacked matmul —
    ``(N, dim) @ (dim, n_tables*n_bits)`` — then a bit-weight dot per
    table; Python touches each row only to format the key strings.
    (A per-row ``planes[t] @ x`` loop dispatches N×n_tables tiny BLAS
    calls — the per-row-Python anti-pattern at 10^9 embeddings.)"""
    planes = _hyperplanes(dim, n_bits, n_tables)
    # (dim, n_tables*n_bits) — one GEMM per batch covers every table
    flat = planes.reshape(n_tables * n_bits, dim).T.copy()
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf(ArrayType(StringType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mask = vecs.notna().to_numpy()
        out = np.empty(len(vecs), dtype=object)
        if mask.any():
            x = np.vstack(
                [np.asarray(v, dtype=np.float32) for v in vecs[mask]]
            )
            bits = (x @ flat > 0).reshape(len(x), n_tables, n_bits)
            codes = bits.astype(np.int64) @ weights  # (N, n_tables)
            keys = np.empty(len(codes), dtype=object)
            keys[:] = [
                [f"t{t}:{int(c):x}" for t, c in enumerate(row)]
                for row in codes
            ]
            out[mask] = keys
        return pd.Series(out)

    return buckets


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing ≥1 hyperplane bucket
    with the query. Same output shape as ``brute_force_topk`` (a vector
    missed by every table is simply absent — the recall/cost dial)."""
    bucketer = hyperplane_buckets(dim, n_bits, n_tables)
    v = vectors.select(
        id_col, vec_col, F.explode(bucketer(F.col(vec_col))).alias("bucket")
    )
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("_qvec"),
        F.explode(bucketer(F.col(vec_col))).alias("bucket"),
    )
    cands = v.join(F.broadcast(q), "bucket").dropDuplicates([query_id_col, id_col])
    scored = cands.select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dupes(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_bits: int = 10,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, task spec):
    LSH-bucket self-join + built-in cosine ≥ threshold.
    → (id_a, id_b, cosine), id_a < id_b.

    The bucket self-join carries ONLY (bucket, id): the exploded bucket
    rows never duplicate the vector payload ×n_tables through the
    shuffle. Vectors re-join pair-side after pair dedup — the same
    slim-join shape as scoring.confirm_pairs — so the wide column moves
    once per *surviving pair side*, not once per bucket row."""
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    bucketer = hyperplane_buckets(dim, n_bits, n_tables)
    b = vectors.select(
        F.col(id_col), F.explode(bucketer(F.col(vec_col))).alias("bucket")
    )
    left = b.select(F.col("bucket"), F.col(id_col).alias("id_a"))
    right = b.select(F.col("bucket"), F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
