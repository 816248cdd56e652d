#!/usr/bin/env python
"""Condense a Spark event log into a per-stage cost table.

Usage: python bench/stage_table.py <eventlog-file-or-dir> [top_n]

Prints one JSON line: {"stages": [{stage_id, name, tasks, wall_sec,
run_sec, shuffle_read_mb, shuffle_write_mb, input_mb} ...],
"totals": {...}} sorted by executor run time descending. Pure stdlib —
safe to run while nothing else should touch the JVM.
"""

from __future__ import annotations

import json
import os
import sys


def _iter_events(path: str):
    def expand(p: str) -> list[str]:
        # Spark 4 rolling logs are DIRECTORIES (eventlog_v2_<app>/
        # events_1_<app> + an empty appstatus_ marker); recurse into
        # them and keep only event files.
        if os.path.isdir(p):
            out = []
            for f in sorted(os.listdir(p)):
                if f.startswith(".") or f.startswith("appstatus_"):
                    continue
                out.extend(expand(os.path.join(p, f)))
            return out
        return [p]

    paths = expand(path)
    for p in paths:
        if p.endswith(".zstd"):
            # Spark's rolled event files are zstd streams without a
            # content-size header; shell out to the zstd binary (no
            # python binding is guaranteed in this env)
            import io
            import subprocess

            raw = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout
            fh = io.StringIO(raw.decode("utf-8", errors="replace"))
            close = fh.close
        elif p.endswith(".gz"):
            import gzip

            fh = gzip.open(p, "rt", errors="replace")
            close = fh.close
        else:
            fh = open(p, "rt", errors="replace")
            close = fh.close
        try:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue
        finally:
            close()


def stage_table(path: str) -> dict:
    stages: dict[tuple[int, int], dict] = {}
    for ev in _iter_events(path):
        if not isinstance(ev, dict):
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si.get("Stage Attempt ID", 0))
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages.setdefault(key, {"run_ms": 0, "tasks": 0}).update(
                {
                    "stage_id": si["Stage ID"],
                    "name": si.get("Stage Name", si.get("Name", ""))[:80],
                    "wall_sec": round((comp - sub) / 1000.0, 2)
                    if sub and comp
                    else None,
                }
            )
        elif kind == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev.get("Stage Attempt ID", 0))
            s = stages.setdefault(key, {"run_ms": 0, "tasks": 0})
            s["tasks"] += 1
            m = ev.get("Task Metrics") or {}
            s["run_ms"] += m.get("Executor Run Time", 0) or 0
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            inp = m.get("Input Metrics") or {}
            s["sr_b"] = s.get("sr_b", 0) + (
                (sr.get("Remote Bytes Read", 0) or 0)
                + (sr.get("Local Bytes Read", 0) or 0)
            )
            s["sw_b"] = s.get("sw_b", 0) + (
                sw.get("Shuffle Bytes Written", 0) or 0
            )
            s["in_b"] = s.get("in_b", 0) + (inp.get("Bytes Read", 0) or 0)
    rows = []
    for s in stages.values():
        if not s.get("tasks"):
            continue
        rows.append(
            {
                "stage_id": s.get("stage_id"),
                "name": s.get("name", ""),
                "tasks": s["tasks"],
                "wall_sec": s.get("wall_sec"),
                "run_sec": round(s["run_ms"] / 1000.0, 2),
                "shuffle_read_mb": round(s.get("sr_b", 0) / 1e6, 1),
                "shuffle_write_mb": round(s.get("sw_b", 0) / 1e6, 1),
                "input_mb": round(s.get("in_b", 0) / 1e6, 1),
            }
        )
    rows.sort(key=lambda r: -r["run_sec"])
    totals = {
        "stages": len(rows),
        "tasks": sum(r["tasks"] for r in rows),
        "run_sec": round(sum(r["run_sec"] for r in rows), 1),
        "shuffle_read_mb": round(sum(r["shuffle_read_mb"] for r in rows), 1),
        "shuffle_write_mb": round(
            sum(r["shuffle_write_mb"] for r in rows), 1
        ),
        "input_mb": round(sum(r["input_mb"] for r in rows), 1),
    }
    return {"stages": rows, "totals": totals}


if __name__ == "__main__":
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    t = stage_table(path)
    t["stages"] = t["stages"][:top]
    print(json.dumps(t))
