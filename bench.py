"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus dedup throughput extras}.

The dedup pipeline input is the deterministic synthetic pages table,
materialized once to a parquet cache (.bench_cache/) so the benchmark
times the *pipeline scan→cluster path*, not generation. Pages count
scales with sf: sf0.1 → 200k pages (FIXTURES.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dedupe_algo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


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


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    sf = sf_of(SF_DIR)
    n_pages = max(2_000, int(200_000 * sf / 0.1))

    from dedupe_algo_spark.pipeline import dedup_pipeline
    from dedupe_algo_spark.queries import QUERIES

    timings: dict[str, float] = {}

    # --- flagship: full dedup pipeline over n_pages synthetic pages ---
    ppath = pages_parquet(spark, n_pages)
    t0 = time.time()
    pages = spark.read.parquet(ppath)
    res = dedup_pipeline(pages)
    n_clustered = res.clusters.count()
    dedup_sec = time.time() - t0
    timings["dedup_pipeline"] = round(dedup_sec, 3)
    res.unpersist()  # the suite below should run without pipeline caches

    # --- exact-only cascade (the reference's start_scan analog) ---
    t0 = time.time()
    from dedupe_algo_spark.operators.dedup import exact_dup_assignments

    exact_dup_assignments(spark.read.parquet(ppath)).count()
    timings["exact_cascade"] = round(time.time() - t0, 3)

    # --- representative relational/text/vector queries on testdata ---
    headline = [
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
    ]
    for name in headline:
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query wall-clock (dedup pipeline + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / dedup_sec, 1),
        "clustered_urls": n_clustered,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
