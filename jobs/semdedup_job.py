"""spark-submit entry point for SemDeDup-style semantic deduplication.

Run on any cluster as:

    spark-submit --master <master> \
        --py-files dedupe_algo_spark.zip \
        jobs/semdedup_job.py \
        --input /path/to/embeddings_parquet \
        --output /path/to/assignment_out \
        [--threshold 0.95] [--n-cells 1024] [--n-assign 2] \
        [--policy min_id|farthest_from_centroid] \
        [--id-col vec_id] [--vec-col embedding]

Reads an embeddings table (``id-col``, ``vec-col: array<float>``), runs
IVF-bucketed near-duplicate pair generation → large-star/small-star
connected components → keeper selection, and writes the flat
(``id-col``, sem_cluster, keep) assignment as parquet. Downstream a
training-data pipeline keeps ``WHERE keep`` — the SemDeDup recipe
(Abbas et al. 2023) for pruning semantically redundant documents.

The script only uses the SparkSession given to it by spark-submit (no
master hard-coded). Centroid training is parallelism-invariant, so the
same input yields the same assignment at any cluster size.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="semantic dedup over an embeddings table")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.95)
    p.add_argument("--n-cells", type=int, default=1024)
    p.add_argument("--n-assign", type=int, default=2)
    p.add_argument(
        "--policy", default="min_id", choices=["min_id", "farthest_from_centroid"]
    )
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from dedupe_algo_spark.operators.ann import semantic_dedup
    from dedupe_algo_spark.tracking import PersistTracker

    spark = SparkSession.builder.getOrCreate()
    tracker = PersistTracker()
    vectors = spark.read.parquet(args.input)
    out = semantic_dedup(
        vectors,
        threshold=args.threshold,
        n_cells=args.n_cells,
        n_assign=args.n_assign,
        keep_policy=args.policy,
        id_col=args.id_col,
        vec_col=args.vec_col,
        tracker=tracker,
    )
    out.write.mode("overwrite").parquet(args.output)
    tracker.release()
    spark.stop()


if __name__ == "__main__":
    main()
