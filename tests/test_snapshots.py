"""Snapshot-versioned table: atomic commits, time travel, rollback, GC."""

from __future__ import annotations

import os

import pytest

from dedupe_algo_spark.sources.snapshots import SnapshotTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "concat('u', id) AS url")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    s1 = t.commit(_df(spark, 0, 3))
    s2 = t.commit(_df(spark, 3, 5))             # append
    s3 = t.commit(_df(spark, 100, 101), mode="overwrite")
    assert (s1, s2, s3) == (1, 2, 3)
    assert t.current_snapshot() == 3
    assert _rows(t.read()) == _rows(_df(spark, 100, 101))
    # every historical snapshot stays readable by id
    assert _rows(t.read(snapshot=1)) == _rows(_df(spark, 0, 3))
    assert _rows(t.read(snapshot=2)) == _rows(_df(spark, 0, 5))


def test_rollback_then_branch(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 2))
    t.commit(_df(spark, 2, 4))
    assert t.rollback(1) == 1
    assert _rows(t.read()) == _rows(_df(spark, 0, 2))
    # next commit branches from snapshot 1 with a FRESH id (3, not 2)
    s = t.commit(_df(spark, 50, 51))
    assert s == 3
    assert _rows(t.read()) == _rows(_df(spark, 0, 2).union(_df(spark, 50, 51)))
    # the abandoned snapshot 2 is still time-travel-readable
    assert _rows(t.read(snapshot=2)) == _rows(_df(spark, 0, 4))


def test_crash_before_head_swap_is_invisible(spark, tmp_path):
    """A staged data dir with no committed manifest/HEAD never changes
    what readers see, and expire_snapshots collects it."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 3))
    # simulate: the parquet write of a second commit completed, then the
    # process died before any metadata was written
    _df(spark, 90, 95).write.parquet(os.path.join(t.path, "data", "txn-orphan"))
    assert _rows(t.read()) == _rows(_df(spark, 0, 3))
    assert t.current_snapshot() == 1
    t.expire_snapshots(keep_last=5)
    assert not os.path.exists(os.path.join(t.path, "data", "txn-orphan"))
    assert _rows(t.read()) == _rows(_df(spark, 0, 3))


def test_expire_drops_old_manifests_and_unreferenced_dirs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 2))
    t.commit(_df(spark, 0, 9), mode="overwrite")
    t.commit(_df(spark, 9, 10))
    expired = t.expire_snapshots(keep_last=2)
    assert expired == [1]
    with pytest.raises(FileNotFoundError):
        t.read(snapshot=1)
    # snapshot 1's data dir is gone; 2 and 3 still read correctly
    assert len(os.listdir(os.path.join(t.path, "data"))) == 2
    assert _rows(t.read(snapshot=2)) == _rows(_df(spark, 0, 9))
    assert _rows(t.read()) == _rows(_df(spark, 0, 10))


def test_schema_evolution_merges_by_name(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.range(0, 2).selectExpr("id"))
    t.commit(spark.range(2, 3).selectExpr("id", "id * 2 AS extra"))
    got = {r["id"]: r["extra"] for r in t.read().collect()}
    assert got == {0: None, 1: None, 2: 4}


def test_empty_table_read_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    with pytest.raises(ValueError):
        t.read()


def test_dedup_clusters_commit_roundtrip(spark, tmp_path):
    """The integration the table exists for: pipeline output committed
    per run, with the previous run's clusters still time-travelable."""
    from dedupe_algo_spark.pipeline import dedup_pipeline
    from dedupe_algo_spark.synth import synth_pages

    t = SnapshotTable(spark, str(tmp_path / "clusters"))
    res = dedup_pipeline(synth_pages(spark, 400))
    s1 = t.commit(res.clusters, mode="overwrite")
    n1 = t.read().count()
    assert n1 == res.clusters.count() > 0
    res.unpersist()
    res2 = dedup_pipeline(synth_pages(spark, 600))
    t.commit(res2.clusters, mode="overwrite")
    assert t.read(snapshot=s1).count() == n1
    assert t.read().count() == res2.clusters.count()
    res2.unpersist()
