"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus dedup throughput / F1 extras}.

Era-robust protocol (same rationale as bench/scaling.py, documented in
BENCH/BASELINE.md): this sandbox VM's CPU budget varies up to ~3.5×
over minutes with hypervisor bursting, so a single pass per query is
not attributable across rounds. Every query therefore runs K=3
INTERLEAVED rounds (round-robin over the whole suite, so an era shift
hits all queries, not one), the headline number is the per-query MIN,
and the raw per-round walls are emitted under "runs" alongside a
pure-numpy CPU control ("ctl_sec" per round) that exposes era drift
directly — if ctl varies, wall differences are the era, not the code.

The dedup pipeline input is the deterministic synthetic pages table,
materialized once to a parquet cache (.bench_cache/) so the benchmark
times the *pipeline scan→cluster path*, not generation. Pages count
scales with sf: sf0.1 → 200k pages (FIXTURES.md). The BASELINE.json F1
gate (pairwise F1 ≥ 0.99 on labeled pairs) is evaluated at THIS bench
scale on the first round's clusters and emitted as "f1", so the
headline throughput is provably not bought with recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dedupe_algo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "window_rank_orders",
    "events_hourly",
    "category_rollup",
    "keeper_ranking",
    "token_count",
    "quality",
    "lang_id",
    "embedding_topk",
    "cache_validity_join",
    # round-4 operator families (regressions here were invisible to
    # the r4 suite): crawl-policy gate, link-graph power iteration,
    # CCNet normalized-exact tier, WARC container parse (fixture-scale
    # correctness tier; warc_parse below is the scaled throughput tier)
    "robots_verdicts",
    "host_pagerank3",
    "normalized_exact",
    "warc_ingest",
]


def sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def pages_parquet(spark, n_pages: int) -> str:
    """Materialize the synthetic pages table once per size."""
    path = os.path.join(CACHE_ROOT, f"pages_{n_pages}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from dedupe_algo_spark.synth import synth_pages

        synth_pages(spark, n_pages).write.mode("overwrite").parquet(path)
    return path


def warc_parquet(spark, n_pages: int) -> tuple[str, int]:
    """Materialize scaled WARC blobs once per size: n_pages/10
    synthetic pages packed 200-records-per-.warc.gz (Common Crawl
    layout). The cached blobs make ``warc_parse`` time the distributed
    gzip-member walk + record parse itself, not the fixture build."""
    n = max(1_000, n_pages // 10)
    path = os.path.join(CACHE_ROOT, f"warc_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        from dedupe_algo_spark.sources.warc import warc_blobs_from_pages
        from dedupe_algo_spark.synth import synth_pages

        pages = synth_pages(spark, n).select(
            "url", F.col("warc_ts").cast("long").alias("ts_epoch"), "html"
        )
        warc_blobs_from_pages(pages, per_file=200).write.mode(
            "overwrite"
        ).parquet(path)
    return path, n


def cpu_control() -> float:
    """Fixed driver-side numpy workload (~0.3s on an unloaded core):
    its wall time is a pure-CPU era probe, independent of Spark."""
    arr = np.arange(2_000_000, dtype=np.int64) * 2654435761 % 1_000_003
    t0 = time.time()
    for _ in range(8):
        arr = pd.util.hash_array(arr).astype(np.int64)
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    sf = sf_of(SF_DIR)
    n_pages = max(2_000, int(200_000 * sf / 0.1))

    from dedupe_algo_spark.operators.dedup import exact_dup_assignments
    from dedupe_algo_spark.pipeline import dedup_pipeline, pairwise_f1
    from dedupe_algo_spark.queries import QUERIES

    ppath = pages_parquet(spark, n_pages)
    wpath, n_warc_pages = warc_parquet(spark, n_pages)
    runs: dict[str, list[float]] = {}
    ctl: list[float] = []
    f1: dict[str, float] | None = None
    n_clustered = 0

    for k in range(ROUNDS):
        ctl.append(cpu_control())

        # --- flagship: full dedup pipeline over n_pages synthetic pages
        t0 = time.time()
        res = dedup_pipeline(spark.read.parquet(ppath))
        n_clustered = res.clusters.count()
        runs.setdefault("dedup_pipeline", []).append(round(time.time() - t0, 3))
        if k == 0:
            # F1 gate at bench scale (outside the timed window): the
            # planted labels are pure functions of the row index, so
            # this is exact ground truth, not a sample
            from dedupe_algo_spark.synth import synth_labels

            f1 = pairwise_f1(res.clusters, synth_labels(spark, n_pages))
        # release pipeline caches: Spark's CacheManager matches
        # canonicalized plans, so without this the next round would
        # silently reuse this round's cached meta/assigned and time a
        # warm no-op instead of the pipeline
        res.unpersist()

        # --- exact-only cascade (the reference's start_scan analog) ---
        t0 = time.time()
        exact_dup_assignments(spark.read.parquet(ppath)).count()
        runs.setdefault("exact_cascade", []).append(round(time.time() - t0, 3))

        # --- scaled WARC container parse (throughput tier) ---
        t0 = time.time()
        from dedupe_algo_spark.sources.warc import read_warc_records

        read_warc_records(
            spark.read.parquet(wpath), only_responses=True
        ).write.format("noop").mode("overwrite").save()
        runs.setdefault("warc_parse", []).append(round(time.time() - t0, 3))

        # --- representative relational/text/vector queries on testdata
        for name in HEADLINE:
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.setdefault(name, []).append(round(time.time() - t0, 3))

    timings = {name: min(rs) for name, rs in runs.items()}
    total = round(sum(timings.values()), 3)
    dedup_sec = timings["dedup_pipeline"]
    out = {
        "metric": "headline query wall-clock (dedup pipeline + operator suite; min of interleaved rounds)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "rounds": ROUNDS,
        "ctl_sec": ctl,
        "sf": sf,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / dedup_sec, 1),
        "warc_pages": n_warc_pages,
        "warc_pages_per_sec": round(n_warc_pages / timings["warc_parse"], 1),
        "clustered_urls": n_clustered,
        "f1": round(f1["f1"], 6) if f1 else None,
        "f1_detail": {k: round(v, 6) for k, v in f1.items()} if f1 else None,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
