"""spark-submit entry point for the dedup pipeline (north_rule contract).

Run on any cluster as:

    spark-submit --master <master> \
        --py-files dedupe_algo_spark.zip \
        jobs/dedup_job.py \
        --input /path/to/pages_parquet \
        --output /path/to/clusters_out \
        [--threshold 0.8] [--min-len 10] [--no-near] [--from-html] \
        [--input-format parquet|warc] [--prior /path/to/prev_pages] \
        [--checkpoint-dir /path/to/ckpt --run-id run1]

With ``--input-format warc`` the input path is a directory of
``.warc[.gz]`` segment files (Common Crawl layout): each file becomes
one ``binaryFile`` row, the distributed parser (sources/warc.py) turns
records into the pages shape — text extracted, language classified —
and the cascade runs on that. One task per segment; no staging table.

The script only uses the SparkSession given to it by spark-submit (no
master hard-coded), reads the pages table (url, warc_ts, html, text,
lang), runs the exact+near dedup cascade, and writes the flat
(url, cluster_id, match_kind) assignment as parquet. With
--checkpoint-dir it runs stage-checkpointed and resumes from the last
committed stage on re-submit (runner.CheckpointedRun).

Locally, package the library with:
    cd /root/repo && zip -r /tmp/dedupe_algo_spark.zip dedupe_algo_spark
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="web-scale dedup over pages parquet")
    p.add_argument("--input", required=True, help="pages parquet path (or WARC dir)")
    p.add_argument(
        "--input-format",
        choices=["parquet", "warc", "wet"],
        default="parquet",
        help="'warc': read --input as a directory of .warc[.gz] segments "
        "and build the pages table with sources/warc.pages_from_warc",
    )
    p.add_argument(
        "--prior",
        default=None,
        help="previous crawl's pages parquet (warc input only): revisit "
        "records resolve against it by payload digest",
    )
    p.add_argument("--output", required=True, help="clusters parquet output path")
    p.add_argument("--threshold", type=float, default=0.80)
    p.add_argument("--min-len", type=int, default=10)
    p.add_argument("--no-near", action="store_true", help="exact duplicates only")
    p.add_argument(
        "--from-html",
        action="store_true",
        help="derive missing text from the raw html column (codegen "
        "extraction, functions/html.py) before deduping",
    )
    p.add_argument(
        "--exact-key",
        choices=["raw", "normalized"],
        default="raw",
        help="key the exact tier on raw bytes or the CCNet-normalized "
        "text view (casing/punct/whitespace/counter mutations become "
        "exact duplicates)",
    )
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--run-id", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedupe-algo-spark").getOrCreate()

    from dedupe_algo_spark.pipeline import dedup_pipeline

    from dedupe_algo_spark.sources.warc import load_pages

    pages = load_pages(spark, args.input, args.input_format, prior_path=args.prior)
    if args.from_html:
        from dedupe_algo_spark.functions.html import ensure_text

        pages = ensure_text(pages)
    if args.checkpoint_dir:
        from dedupe_algo_spark.runner import CheckpointedRun

        ckpt = CheckpointedRun(spark, args.checkpoint_dir, run_id=args.run_id)
        stage = ckpt.stage
    else:
        stage = None
    result = dedup_pipeline(
        pages,
        min_len=args.min_len,
        threshold=args.threshold,
        include_near=not args.no_near,
        exact_key=args.exact_key,
        stage=stage,
    )
    result.clusters.write.mode("overwrite").parquet(args.output)
    result.unpersist()
    n = spark.read.parquet(args.output).count()
    print(f"dedup_job: wrote {n} cluster assignments to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
