"""Fixed-cluster DATA-size scaling: the amortization axis.

The cluster-size sessions (bench/scaling.py) attribute the 4N residual
largely to terms that are CONSTANT in data size — per-job submit
latency, broadcast builds, CC superstep barriers, and per-stage
write-stall windows. If that attribution is right, throughput at a
fixed cluster size must RISE with input size as those constants
amortize — which is also the operative regime for the 10^12-document
target, where per-stage data grows ~10^6× beyond this sandbox.

This harness measures it directly: the same dedup job on the same
standalone cluster at the hi config (8 executors × 4 cores), over
1M / 2M / 4M pages, rounds interleaved size-major (each round visits
every size once) with min-of-K per size — the same era-robust protocol
as the cluster-size sessions.

Usage:  DATA_SCALING_ROUNDS=2 python bench/data_scaling.py
Writes: BENCH/data_scaling_<tag>.json  (tag via DATA_SCALING_TAG)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))

from scaling import ensure_master, run  # noqa: E402  (bench/ sibling)


NULL_HTML_ABOVE = int(os.environ.get("DATA_SCALING_NULL_HTML_ABOVE", "4000000"))


def materialize(n_pages: int) -> str:
    """Sizes above ``NULL_HTML_ABOVE`` are written with ``html`` NULL:
    the dedup pipeline's parquet scan prunes html (plan-asserted in
    test_plans — text-only projection), so the timed work is identical,
    while the on-disk corpus shrinks ~15× (the 4M corpus with html is
    31 GB; this sandbox disk cannot hold an 8M/16M html corpus). The
    artifact records which sizes carry html so cross-size pages/s stays
    an apples-to-apples pipeline number."""
    suffix = "" if n_pages <= NULL_HTML_ABOVE else "_nohtml"
    path = os.path.join(REPO, ".bench_cache", f"pages_{n_pages}{suffix}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # Generate in a SUBPROCESS: spark.stop() in-process leaves the
        # py4j gateway JVM alive (with its multi-GB heap) for the rest
        # of this script — measured 18GB of dead RSS squatting on the
        # page cache during the timed runs. A child process exits and
        # frees everything before timing starts.
        import subprocess

        null_html = (
            "from pyspark.sql import functions as F\n"
            "pages = pages.withColumn('html', F.lit(None).cast('binary'))\n"
            if suffix
            else ""
        )
        code = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from dedupe_algo_spark.session import get_spark\n"
            "from dedupe_algo_spark.synth import synth_pages\n"
            "spark = get_spark(app_name='gen-{n}', master='local[32]')\n"
            "pages = synth_pages(spark, {n})\n"
            "{null_html}"
            "pages.write.mode('overwrite').parquet({path!r})\n"
            "spark.stop()\n"
        ).format(repo=REPO, n=n_pages, path=path, null_html=null_html)
        subprocess.run([sys.executable, "-c", code], check=True)
    return path


def main() -> None:
    sizes = [
        int(s) for s in os.environ.get(
            "DATA_SCALING_SIZES", "1000000,2000000,4000000"
        ).split(",")
    ]
    rounds = int(os.environ.get("DATA_SCALING_ROUNDS", "2"))
    cores = int(os.environ.get("DATA_SCALING_CORES", "32"))
    paths = {n: materialize(n) for n in sizes}
    ensure_master()

    walls: dict[int, list[float]] = {n: [] for n in sizes}
    for _ in range(rounds):
        for n in sizes:  # size-major interleave: every size sees every era
            walls[n].append(run(cores, paths[n], n)["sec"])

    result = {
        "config": f"{cores // 4} executors x 4 cores (the 4N cluster)",
        "rounds": rounds,
        "sizes": {
            str(n): {
                "sec": min(ws),
                "pages_per_sec": round(n / min(ws), 1),
                "all_runs": ws,
                "html_in_parquet": n <= NULL_HTML_ABOVE,
            }
            for n, ws in walls.items()
        },
    }
    lo, hi = min(sizes), max(sizes)
    result["throughput_gain_small_to_large"] = round(
        (hi / min(walls[hi])) / (lo / min(walls[lo])), 3
    )
    print(json.dumps(result))
    tag = os.environ.get("DATA_SCALING_TAG", "r4")
    with open(os.path.join(REPO, "BENCH", f"data_scaling_{tag}.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
