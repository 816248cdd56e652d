"""spark-submit entry point for the STREAMING first-seen dedup.

Run on any cluster as:

    spark-submit --master <master> \
        --py-files dedupe_algo_spark.zip \
        jobs/dedup_stream_job.py \
        --input /path/to/pages_dir \
        --output /path/to/keepers_out \
        --checkpoint /path/to/stream_ckpt \
        [--min-len 10] [--max-files-per-trigger 64] [--follow 30]

Watches ``--input`` for new page files and appends each DISTINCT page
(by content sha256) to ``--output`` exactly once, on first arrival —
the streaming face of the batch cascade's exact tier, built on
``applyInPandasWithState`` (see dedupe_algo_spark.streaming).

Resume contract (north_rule: "resumes from the last committed
checkpoint snapshot"): the state store — every content hash ever
emitted — lives under ``--checkpoint``. Re-submitting the job with the
same checkpoint continues where the last run committed: already-seen
hashes stay suppressed, in-flight batches replay idempotently, and only
genuinely new content is appended. Kill it anywhere; re-run it; the
output never gains a duplicate.

By default the job drains the current backlog and exits
(``availableNow`` — cron-friendly incremental runs). ``--follow N``
instead keeps it running continuously with an N-second micro-batch
trigger.

Locally, package the library with:
    cd /root/repo && zip -r /tmp/dedupe_algo_spark.zip dedupe_algo_spark
"""

from __future__ import annotations

import argparse


def run_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_len: int = 10,
    max_files_per_trigger: int | None = None,
    follow_seconds: int | None = None,
    input_format: str = "parquet",
):
    """Start (or resume) the first-seen dedup stream; returns the query.

    Separated from main() so tests can drive it with a local session:
    two invocations against the same checkpoint must never re-emit a
    hash the first run committed. ``input_format='warc'`` watches the
    directory for raw .warc[.gz] segment objects instead of pages
    parquet (a live crawl bucket)."""
    from dedupe_algo_spark.streaming import dedup_pages_stream, dedup_warc_stream

    options = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    if input_format in ("warc", "wet"):
        out = dedup_warc_stream(
            spark,
            input_dir,
            min_len=min_len,
            options=options,
            segment_format=input_format,
        )
    else:
        out = dedup_pages_stream(spark, input_dir, min_len=min_len, options=options)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if follow_seconds:
        writer = writer.trigger(processingTime=f"{follow_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def main() -> None:
    p = argparse.ArgumentParser(description="streaming first-seen page dedup")
    p.add_argument("--input", required=True, help="pages directory to watch")
    p.add_argument("--output", required=True, help="keepers parquet output path")
    p.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    p.add_argument("--min-len", type=int, default=10)
    p.add_argument(
        "--input-format",
        choices=["parquet", "warc", "wet"],
        default="parquet",
        help="'warc': watch --input for raw .warc[.gz] segment objects; "
        "'wet': extracted-text conversion segments (*.wet.gz)",
    )
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument(
        "--follow",
        type=int,
        default=None,
        metavar="SECONDS",
        help="run continuously with this trigger interval (default: drain backlog and exit)",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedupe-algo-spark-stream").getOrCreate()
    q = run_stream(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        min_len=args.min_len,
        max_files_per_trigger=args.max_files_per_trigger,
        follow_seconds=args.follow,
        input_format=args.input_format,
    )
    q.awaitTermination()
    try:
        n = spark.read.parquet(args.output).count()
    except Exception:
        # a drain with no input files commits no batch — the sink never
        # creates the output path; that is a successful (empty) run
        n = 0
    print(f"dedup_stream_job: {n} distinct pages committed to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
