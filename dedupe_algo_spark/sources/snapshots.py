"""Snapshot-versioned parquet tables — the Iceberg commit model.

The north_star targets Iceberg catalog tables; the sandbox has no
iceberg runtime jar, so ``sources/tables.py`` routes iceberg mode but
cannot exercise it. This module implements the PART of Iceberg the
pipeline actually depends on — atomic snapshot commits, time-travel
reads, rollback — over plain files, with the same mechanics Iceberg
uses (spec v2, public docs):

* **Immutable data files**: every commit stages a fresh
  ``data/txn-<uuid>`` directory; nothing already committed is ever
  rewritten (append) — overwrite just stops REFERENCING old dirs.
* **Manifest per snapshot**: ``snap-<N>.json`` lists the data dirs
  that make up snapshot N plus parent/mode/row-count metadata. File
  listings live in manifests, never from directory scans, so a read
  plans from O(manifest) metadata — at 10^12 rows the manifest holds
  file paths, not data.
* **Atomic HEAD swap**: a commit becomes visible by one
  ``os.replace`` of the ``HEAD`` pointer (fsync'd, like the memo's
  MANIFEST commit — sources/memo.py). A crash anywhere before that
  leaves the previous snapshot fully intact and the staged dir as
  unreferenced garbage for the next ``expire_snapshots``.
* **Time travel**: ``read(snapshot=k)`` plans from ``snap-k.json``;
  ``rollback(k)`` re-points HEAD without touching data; the next
  commit branches from k with a fresh id (old snapshots stay
  readable until expired).

Single-writer, like the reference's SQLite store (lib.rs cache) and
the memo. Reads are plain ``spark.read.parquet`` over the manifest's
dirs — column pruning and predicate pushdown hit the scan exactly as
for any parquet source.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

HEAD = "HEAD"


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- metadata ---------------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.path, HEAD)

    def _snap_path(self, snapshot_id: int) -> str:
        return os.path.join(self.path, f"snap-{snapshot_id}.json")

    def current_snapshot(self) -> int | None:
        """Id of the snapshot HEAD points at, or None for an empty table."""
        try:
            with open(self._head_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _load_snap(self, snapshot_id: int) -> dict:
        with open(self._snap_path(snapshot_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All retained snapshot manifests, oldest first."""
        ids = sorted(
            int(e[len("snap-"):-len(".json")])
            for e in os.listdir(self.path)
            if e.startswith("snap-") and e.endswith(".json")
        )
        return [self._load_snap(i) for i in ids]

    def _write_atomic(self, path: str, payload: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    # -- reads ------------------------------------------------------------

    def read(self, snapshot: int | None = None) -> DataFrame:
        """The table as of ``snapshot`` (default: HEAD). Raises
        FileNotFoundError for an expired/unknown snapshot id; an empty
        table (no commits) raises ValueError — there is no schema to
        serve."""
        sid = self.current_snapshot() if snapshot is None else snapshot
        if sid is None:
            raise ValueError(f"snapshot table {self.path} has no commits")
        snap = self._load_snap(sid)
        dirs = [os.path.join(self.path, d) for d in snap["dirs"]]
        # mergeSchema: appended snapshots may carry added columns — the
        # reader resolves by name across dirs (Iceberg schema evolution,
        # minus id-based renames which need a real catalog)
        return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

    # -- writes -----------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write ``df`` as a new snapshot; returns its id. ``mode``:
        ``append`` (new snapshot = parent's dirs + this commit's dir) or
        ``overwrite`` (new snapshot = this commit's dir only — old dirs
        stay on disk, referenced by old snapshots, until expired).

        The parquet write runs fully BEFORE any metadata changes; the
        commit point is the final atomic HEAD swap.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        txn = f"txn-{uuid.uuid4().hex}"
        staged_rel = os.path.join("data", txn)
        df.write.parquet(os.path.join(self.path, staged_rel))

        parent = self.current_snapshot()
        dirs = [staged_rel]
        if mode == "append" and parent is not None:
            dirs = self._load_snap(parent)["dirs"] + dirs
        existing = [
            int(e[len("snap-"):-len(".json")])
            for e in os.listdir(self.path)
            if e.startswith("snap-") and e.endswith(".json")
        ]
        sid = max(existing, default=0) + 1
        snap = {
            "id": sid,
            "parent": parent,
            "mode": mode,
            "dirs": dirs,
            "committed_at": time.time(),
        }
        self._write_atomic(self._snap_path(sid), json.dumps(snap))
        self._write_atomic(self._head_path(), str(sid))  # the commit point
        return sid

    def rollback(self, snapshot: int) -> int:
        """Re-point HEAD at an earlier snapshot (metadata-only, instant).
        The abandoned snapshots stay readable by explicit id until
        expired; the next commit branches from here with a fresh id."""
        self._load_snap(snapshot)  # raises if unknown/expired
        self._write_atomic(self._head_path(), str(snapshot))
        return snapshot

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshot manifests
        (HEAD's snapshot is always kept) and delete data dirs no
        retained snapshot references — crash-orphaned staging dirs
        included. Returns the expired ids."""
        snaps = self.snapshots()
        head = self.current_snapshot()
        keep = {s["id"] for s in snaps[-keep_last:]} | ({head} if head else set())
        expired = [s["id"] for s in snaps if s["id"] not in keep]
        for sid in expired:
            os.remove(self._snap_path(sid))
        live = {
            d for s in self.snapshots() for d in s["dirs"]
        }
        data_root = os.path.join(self.path, "data")
        for entry in os.listdir(data_root):
            if os.path.join("data", entry) not in live:
                shutil.rmtree(os.path.join(data_root, entry), ignore_errors=True)
        return expired
