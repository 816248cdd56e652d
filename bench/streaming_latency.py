#!/usr/bin/env python
"""Streaming latency probe — the 100 TB daily-ingest story's numbers.

Measures the two production streaming paths at bench scale:

1. ``dedup_warc_stream``: three crawl "buckets" (20k synthetic pages
   each, packed into 32 ``.warc.gz`` segment objects per bucket) land
   in a watched directory; the stream drains them as three micro-batches
   (``maxFilesPerTrigger`` = files-per-bucket) through the WARC parse +
   map-side sha256 + ``applyInPandasWithState`` first-seen dedup.
   Reported per batch: wall (triggerExecution), input rows, emitted
   rows, and state-store rows (total / updated) — the state size axis
   the daily-ingest story needs (state grows with DISTINCT content,
   not with input).

2. ``near_dup_stream``: a 100k-page seen-corpus near-dup index
   (sources/bucketed), then three 10k-page waves probed against it via
   ``foreachBatch`` — the corpus side never shuffles per batch.
   Reported per batch: wall and hit rows.

Inputs are the deterministic synthetic pages split by ``crc32(url)``,
so cross-bucket duplicates exist by construction and the state /
probe tiers do real work. Writes ONE json artifact (default
``BENCH/streaming_latency_r5.json``) and prints it.

Era note (BENCH/BASELINE.md): absolute walls on this sandbox swing
with hypervisor phases; the artifact embeds the same pure-CPU control
as bench.py so readings are attributable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from dedupe_algo_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_JSON = os.environ.get(
    "STREAM_LATENCY_OUT", os.path.join(ROOT, "BENCH", "streaming_latency_r5.json")
)
WORK = os.path.join(ROOT, ".bench_cache", "stream_latency")

N_BUCKETS = 3
PAGES_PER_BUCKET = int(os.environ.get("STREAM_PAGES_PER_BUCKET", "20000"))
FILES_PER_BUCKET = 32
NEAR_CORPUS = int(os.environ.get("STREAM_NEAR_CORPUS", "100000"))
NEAR_WAVE = int(os.environ.get("STREAM_NEAR_WAVE", "10000"))


def cpu_control() -> float:
    import numpy as np
    import pandas as pd

    arr = np.arange(2_000_000, dtype=np.int64) * 2654435761 % 1_000_003
    t0 = time.time()
    for _ in range(8):
        arr = pd.util.hash_array(arr).astype(np.int64)
    return round(time.time() - t0, 3)


def progress_rows(query) -> list[dict]:
    """recentProgress → slim per-batch rows (non-empty batches only)."""
    rows = []
    for p in query.recentProgress:
        if p is None:
            continue
        n_in = int(p.get("numInputRows", 0) or 0)
        if n_in == 0:
            continue
        state = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": n_in,
                "wall_sec": round(
                    (p.get("durationMs", {}).get("triggerExecution", 0) or 0)
                    / 1000.0,
                    3,
                ),
                "state_rows_total": state.get("numRowsTotal"),
                "state_rows_updated": state.get("numRowsUpdated"),
            }
        )
    return rows


def build_warc_buckets(spark) -> str:
    """Synthetic crawl drop: N_BUCKETS × FILES_PER_BUCKET segment
    objects, bucket membership by crc32(url) so duplicate clusters span
    buckets; per-bucket mtimes order the file-source's batching."""
    from pyspark.sql import functions as F

    from dedupe_algo_spark.sources.warc import warc_blobs_from_pages
    from dedupe_algo_spark.synth import synth_pages

    src = os.path.join(WORK, "warc_in")
    os.makedirs(src, exist_ok=True)
    pages = synth_pages(spark, N_BUCKETS * PAGES_PER_BUCKET).select(
        "url",
        F.col("warc_ts").cast("long").alias("ts_epoch"),
        "html",
        (F.crc32(F.col("url")) % N_BUCKETS).alias("_bucket"),
    )
    per_file = max(1, -(-PAGES_PER_BUCKET // FILES_PER_BUCKET))
    t0 = int(time.time()) - 3600
    for b in range(N_BUCKETS):
        blobs = warc_blobs_from_pages(
            pages.where(F.col("_bucket") == b).drop("_bucket"),
            per_file=per_file,
        ).collect()
        for row in blobs:
            fp = os.path.join(src, f"bucket{b}-{row.warc_file}")
            with open(fp, "wb") as fh:
                fh.write(bytes(row.data))
            os.utime(fp, (t0 + b, t0 + b))
    return src


def run_warc_stream(spark) -> dict:
    from dedupe_algo_spark.streaming import dedup_warc_stream

    src = build_warc_buckets(spark)
    n_files = len(os.listdir(src))
    out = os.path.join(WORK, "warc_out")
    ckpt = os.path.join(WORK, "warc_ckpt")
    deduped = dedup_warc_stream(
        spark,
        src,
        options={"maxFilesPerTrigger": -(-n_files // N_BUCKETS)},
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    batches = progress_rows(q)
    # binaryFile source: numInputRows counts SEGMENT FILES, not pages
    for b in batches:
        b["input_files"] = b.pop("input_rows")
    emitted = spark.read.parquet(out).count()
    total_pages = N_BUCKETS * PAGES_PER_BUCKET
    total_wall = sum(b["wall_sec"] for b in batches)
    return {
        "stream": "dedup_warc_stream",
        "buckets": N_BUCKETS,
        "pages_per_bucket": PAGES_PER_BUCKET,
        "segment_files": n_files,
        "batches": batches,
        "emitted_rows": emitted,
        "input_pages_per_sec": round(total_pages / total_wall, 1)
        if total_wall
        else None,
    }


def run_near_stream(spark) -> dict:
    from pyspark.sql import functions as F

    from dedupe_algo_spark.sources.bucketed import write_near_index
    from dedupe_algo_spark.streaming import near_dup_stream
    from dedupe_algo_spark.synth import synth_pages

    total = NEAR_CORPUS + N_BUCKETS * NEAR_WAVE
    all_pages = synth_pages(spark, total).select("url", "text")
    # deterministic split: ~corpus_frac of urls form the seen corpus,
    # the rest arrive in N_BUCKETS waves — duplicate clusters span the
    # cut, so waves really hit the index
    mod = 1000
    cut = int(mod * NEAR_CORPUS / total)
    key = F.crc32(F.col("url")) % mod
    corpus = all_pages.where(key < cut)
    idx_path = os.path.join(WORK, "near_idx")
    t0 = time.time()
    write_near_index(corpus, "stream_latency_idx", path=idx_path)
    index_build_sec = round(time.time() - t0, 3)
    n_corpus = spark.table("stream_latency_idx_text").count()

    src = os.path.join(WORK, "near_in")
    out = os.path.join(WORK, "near_out")
    ckpt = os.path.join(WORK, "near_ckpt")
    waves = all_pages.where(key >= cut).withColumn(
        "_w", F.crc32(F.col("url")) % N_BUCKETS
    )
    tbase = int(time.time()) - 3600
    files_per_wave = 32
    for wv in range(N_BUCKETS):
        wdir = os.path.join(src, f"w{wv}")
        (
            waves.where(F.col("_w") == wv)
            .select(
                "url",
                F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
                F.lit(b"").alias("html"),
                "text",
                F.lit("en").alias("lang"),
            )
            .repartition(files_per_wave)
            .write.mode("overwrite")
            .parquet(wdir)
        )
        for f in os.listdir(wdir):
            os.utime(os.path.join(wdir, f), (tbase + wv, tbase + wv))
    q = near_dup_stream(
        spark,
        os.path.join(src, "w*"),
        out,
        ckpt,
        "stream_latency_idx",
        options={"maxFilesPerTrigger": files_per_wave},
    )
    q.awaitTermination(1800)
    batches = progress_rows(q)
    # numInputRows counts source SCANS; the probe's candidate and text
    # joins each read the batch once, so it double-counts pages
    for b in batches:
        b["source_rows_scanned"] = b.pop("input_rows")
        b.pop("state_rows_total", None)  # foreachBatch: no state operator
        b.pop("state_rows_updated", None)
    hits = spark.read.parquet(out).count()
    n_wave_pages = waves.count()
    total_wall = sum(b["wall_sec"] for b in batches)
    return {
        "stream": "near_dup_stream",
        "corpus_pages": n_corpus,
        "index_build_sec": index_build_sec,
        "waves": N_BUCKETS,
        "wave_pages_total": n_wave_pages,
        "batches": batches,
        "hit_rows": hits,
        "probe_pages_per_sec": round(n_wave_pages / total_wall, 1)
        if total_wall
        else None,
    }


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="stream_latency", master=f"local[{CPUS}]")
    ctl0 = cpu_control()
    try:
        warc = run_warc_stream(spark)
        near = run_near_stream(spark)
        out = {
            "kind": "streaming_latency",
            "cpus": CPUS,
            "ctl_sec": [ctl0, cpu_control()],
            "warc": warc,
            "near": near,
        }
        with open(OUT_JSON, "w") as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out))
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_latency_idx_bands")
        spark.sql("DROP TABLE IF EXISTS stream_latency_idx_text")
        spark.stop()
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
