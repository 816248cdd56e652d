"""End-to-end dedup pipeline — the web-scale ``start_scan``.

Reference lifecycle (SURVEY.md §3.1, lib.rs:30-182) re-designed for
Spark:

    pages
      → min-length filter                       (F5)
      → exact-dup assignment (cascade)          (passes 1-3, dedup.py)
      → collapse to one representative/text     (scale lever)
      → multi-path bucketing (cheap key + LSH)  (pass-1 generalization)
      → candidate self-join with hot-bucket cap (the added join, §2.4)
      → Arrow-batched pair scoring ≥ threshold  (pass-3 generalization)
      → exact star-edges ∪ near match-edges
      → large-star/small-star connected components
      → flat (url, cluster_id, match_kind) assignment

Shuffle census (the plan to defend at 100 TB): one shuffle for the
exact grouping key, one for the bucket self-join (AQE-skew-handled),
two small joins for pair texts, and O(log n) CC supersteps over the
match edges (tiny relative to input). Everything else is map-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.candidates import DEFAULT_MAX_BUCKET, bucket_table, candidate_pairs
from .operators.cluster import connected_components
from .operators.dedup import exact_dup_assignments
from .operators.scoring import DEFAULT_THRESHOLD, score_pairs


@dataclass
class DedupResult:
    """Flat cluster assignment + the intermediate tables tests/audit use."""

    clusters: DataFrame  # (url, cluster_id, match_kind)
    exact: DataFrame  # (url, text_len, content_sha256, cluster_id, cluster_size)
    edges: DataFrame  # (url_a, url_b, score)


def dedup_pipeline(
    pages: DataFrame,
    min_len: int = 10,
    threshold: float = DEFAULT_THRESHOLD,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    use_pandas_udf_hash: bool = False,
    include_near: bool = True,
    use_simhash_path: bool = False,
    use_cheap_key_path: bool = False,
    stage=None,
) -> DedupResult:
    """Full dedup: exact + near duplicates → transitive clusters.

    ``stage(name, thunk) -> DataFrame`` is an optional checkpoint hook
    (see runner.CheckpointedRun.stage): when provided, each named stage
    commits its output and a resumed run reads committed snapshots
    instead of recomputing.
    """
    if stage is None:
        stage = lambda name, fn: fn()  # noqa: E731 — identity hook

    # Exact assignment over every surviving row (singletons included —
    # they are the representatives pair generation runs on).
    exact_all = stage(
        "exact_assign",
        lambda: exact_dup_assignments(
            pages,
            min_len=min_len,
            use_pandas_udf=use_pandas_udf_hash,
            keep_singletons=True,
        ).withColumnRenamed("cluster_id", "rep_url"),
    )
    exact_all = exact_all.persist()

    exact_dups = exact_all.where(F.col("cluster_size") >= 2)

    # Star edges url→representative (linear in members, never quadratic).
    exact_edges = exact_dups.where(F.col("url") != F.col("rep_url")).select(
        F.col("url").alias("url_a"),
        F.col("rep_url").alias("url_b"),
        F.lit(1.0).alias("score"),
    )

    if include_near:
        # One representative row per distinct text: rep carries the text.
        reps = (
            pages.where(F.length("text") >= min_len)
            .join(
                exact_all.where(F.col("url") == F.col("rep_url")).select("url"),
                "url",
                "inner",
            )
            .select("url", "text")
        )
        # Candidate generation is MinHash-LSH-primary: profiled on 20k
        # pages, the coarse (log2-len, domain) cheap key emitted 2.76M
        # pairs of which LSH-only contributed zero *new* true pairs —
        # i.e. the cheap key was pure quadratic junk on head domains.
        # LSH band buckets collide for unrelated docs at ~1e-4, so the
        # pair count stays ~linear in the duplicate count at any scale.
        near_edges = stage(
            "near_edges",
            lambda: score_pairs(
                candidate_pairs(
                    bucket_table(
                        reps,
                        use_minhash=True,
                        use_simhash=use_simhash_path,
                        use_cheap_key=use_cheap_key_path,
                    ),
                    max_bucket=max_bucket,
                ),
                reps,
                threshold=threshold,
            ),
        )
        all_edges = exact_edges.unionByName(near_edges)
    else:
        near_edges = None
        all_edges = exact_edges

    components = stage(
        "components",
        lambda: connected_components(
            all_edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        ),
    )

    # match_kind: exact if the member shares content hash with its
    # cluster's majority... simpler and faithful: exact if the url was in
    # an exact-dup group, else near.
    clusters = (
        components.withColumnRenamed("component", "cluster_id")
        .join(exact_dups.select("url", F.lit("exact").alias("k")), "url", "left")
        .withColumn("match_kind", F.coalesce(F.col("k"), F.lit("near")))
        .select("url", "cluster_id", "match_kind")
    )
    return DedupResult(
        clusters=clusters,
        exact=exact_dups.withColumnRenamed("rep_url", "cluster_id"),
        edges=all_edges,
    )


def pairwise_confusion(clusters: DataFrame, labels: DataFrame) -> DataFrame:
    """Join predicted same-cluster against labeled pairs →
    (kind, is_dup, predicted, n). Predicted positive ⇔ both urls present
    with equal cluster_id."""
    ca = clusters.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("ca"))
    cb = clusters.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("cb"))
    j = (
        labels.join(ca, "url_a", "left")
        .join(cb, "url_b", "left")
        .withColumn(
            "predicted",
            F.col("ca").isNotNull() & F.col("cb").isNotNull() & (F.col("ca") == F.col("cb")),
        )
    )
    return j.groupBy("kind", "is_dup", "predicted").agg(F.count(F.lit(1)).alias("n"))


def pairwise_f1(clusters: DataFrame, labels: DataFrame) -> dict[str, float]:
    """Pairwise precision/recall/F1 on the labeled pairs (BASELINE gate)."""
    rows = pairwise_confusion(clusters, labels).collect()
    tp = sum(r["n"] for r in rows if r["is_dup"] and r["predicted"])
    fp = sum(r["n"] for r in rows if not r["is_dup"] and r["predicted"])
    fn = sum(r["n"] for r in rows if r["is_dup"] and not r["predicted"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
