"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N→4N executor comparison is impossible in this sandbox; the
stand-in (sanctioned by BASELINE.md) runs the identical dedup job at
``local[8]`` and ``local[32]`` on the same materialized input and
reports throughput at both plus scaling efficiency
(= speedup / core-ratio). Results are written to BENCH/BASELINE.md.

Each measurement runs in a fresh subprocess so the two sessions can't
share JVM state or cached shuffle files.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dedupe_algo_spark.session import get_spark
spark = get_spark(app_name="scaling", master="local[{cores}]")
from dedupe_algo_spark.pipeline import dedup_pipeline
from dedupe_algo_spark.synth import synth_pages
# JIT/codegen warmup: run the identical job shape on a tiny input first
# so the timed run measures steady-state throughput, not JVM compilation
dedup_pipeline(synth_pages(spark, 2000)).clusters.count()
pages = spark.read.parquet({pages!r})
t0 = time.time()
n = dedup_pipeline(pages).clusters.count()
dt = time.time() - t0
print(json.dumps({{"cores": {cores}, "sec": round(dt, 3), "clustered": n}}))
spark.stop()
"""


def run(cores: int, pages_path: str) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, pages=pages_path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(os.environ.get("SCALING_PAGES", "200000"))
    # materialize input once
    sys.path.insert(0, REPO)
    from dedupe_algo_spark.session import get_spark
    from dedupe_algo_spark.synth import synth_pages

    pages_path = os.path.join(REPO, ".bench_cache", f"pages_{n_pages}")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        spark = get_spark(app_name="gen", master="local[32]")
        synth_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)
        spark.stop()

    lo = run(8, pages_path)
    hi = run(32, pages_path)
    tput_lo = n_pages / lo["sec"]
    tput_hi = n_pages / hi["sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    result = {
        "n_pages": n_pages,
        "local8": {"sec": lo["sec"], "pages_per_sec": round(tput_lo, 1)},
        "local32": {"sec": hi["sec"], "pages_per_sec": round(tput_hi, 1)},
        "speedup": round(tput_hi / tput_lo, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH")
    os.makedirs(md, exist_ok=True)
    with open(os.path.join(md, "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH — scaling evidence (north_rule stand-in)\n\n"
            "Same dedup job (full exact+near pipeline, synthetic pages with\n"
            "planted duplicates) on the same materialized parquet input at two\n"
            "parallelism levels — the sandbox stand-in for N vs 4N executors.\n\n"
            f"| config | wall-clock (s) | pages/sec |\n|---|---|---|\n"
            f"| local[8] | {lo['sec']} | {round(tput_lo,1)} |\n"
            f"| local[32] | {hi['sec']} | {round(tput_hi,1)} |\n\n"
            f"- input: {n_pages:,} pages (deterministic synth, seed 42)\n"
            f"- speedup 8→32 cores: **{round(tput_hi/tput_lo,3)}×** "
            f"(core ratio 4×)\n"
            f"- **scaling efficiency: {round(eff,3)}** (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
