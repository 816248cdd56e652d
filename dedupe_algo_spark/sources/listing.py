"""Listing & text-parse sources and the mutating delete sink.

S6 — the reference parses ``df -k`` stdout into DriveInfo rows
(lib.rs:263-302): whitespace tokenize, numeric casts ×1024, device-name
rewrites, mount filtering. Ours is the same parse as DataFrame ops over
a text source.

S8/S9 — directory-listing sources (lib.rs:379-486): one-level listing
with ignore filters and dirs-first ordering.

S10 — mutating delete sink (lib.rs:200-259): per-key delete with
per-row error capture returning DeletionReport(success/fail/errors).
On Iceberg this is ``DELETE FROM``; on the parquet-backed table it is a
rewrite excluding matched keys, with the same report contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..operators.filters import system_name_filter


def parse_df_output(spark: SparkSession, lines_path: str) -> DataFrame:
    """S6 — parse `df -k`-style text into DriveInfo rows:
    (name, mount_point, total_space, available_space, is_removable).
    Mirrors lib.rs:276-296: skip header, whitespace split, ×1024 casts,
    friendly-name rewrite, keep only real volumes."""
    raw = spark.read.text(lines_path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = raw.select(
        F.element_at(toks, 1).alias("device"),
        # try_cast: the header row's '1024-blocks' must become NULL (and
        # be filtered), not an ANSI cast error
        F.element_at(toks, 2).try_cast("long").alias("blocks_kb"),
        F.element_at(toks, 4).try_cast("long").alias("avail_kb"),
        F.element_at(toks, -1).alias("mount_point"),
    ).where(F.col("blocks_kb").isNotNull())  # drops the header row
    return parsed.select(
        F.when(F.col("mount_point") == "/", F.lit("System"))
        .otherwise(F.element_at(F.split(F.col("mount_point"), "/"), -1))
        .alias("name"),
        "mount_point",
        (F.col("blocks_kb") * 1024).alias("total_space"),
        (F.col("avail_kb") * 1024).alias("available_space"),
        F.col("mount_point").startswith("/Volumes/").alias("is_removable"),
    ).where(
        F.col("mount_point").startswith("/")
        & ~F.col("device").startswith("map")
        & ~F.col("device").startswith("devfs")
    )


SYSTEM_NODE_NAMES = ["Home", "Desktop", "Documents", "Downloads", "Pictures", "Music"]


def system_nodes(spark: SparkSession, home: str = "/home/user") -> DataFrame:
    """S7 — the static well-known-roots dimension (``get_system_nodes``,
    lib.rs:304-335): Home/Desktop/Documents/... rows with their paths.
    A tiny dimension table, meant to be broadcast."""
    rows = [("Home", home)] + [
        (n, f"{home}/{n}") for n in SYSTEM_NODE_NAMES if n != "Home"
    ]
    return spark.createDataFrame(rows, "name string, path string")


def enrich_system_nodes(nodes: DataFrame, drives: DataFrame) -> DataFrame:
    """S7 — attach disk stats to each system node via the longest-prefix
    mount join (the reference enriches each root with its disk's
    total/available space, lib.rs:316-330; join semantics = J4)."""
    from ..operators.views import longest_prefix_join

    picked = longest_prefix_join(
        nodes, drives.select("mount_point", "total_space", "available_space")
    )
    return picked.select(
        "name", "path", "mount_point", "total_space", "available_space"
    )


def list_directory(spark: SparkSession, path: str) -> DataFrame:
    """S8 — one-level FileEntry listing with the system-name ignore
    filter and dirs-first case-insensitive ordering (lib.rs:431-486,
    O5). Driver-side os.scandir (a directory is a small dimension), then
    DataFrame filters/sorts so the query semantics live in Spark."""
    rows = []
    with os.scandir(path) as it:
        for e in it:
            st = e.stat(follow_symlinks=False)
            rows.append(
                Row(
                    name=e.name,
                    path=e.path,
                    is_dir=e.is_dir(follow_symlinks=False),
                    size=int(st.st_size),
                    created=int(st.st_ctime),
                    modified=int(st.st_mtime),
                )
            )
    df = spark.createDataFrame(
        rows,
        "name string, path string, is_dir boolean, size long, created long, modified long",
    ) if rows else spark.createDataFrame(
        [],
        "name string, path string, is_dir boolean, size long, created long, modified long",
    )
    return (
        df.where(system_name_filter(F.col("name")))
        .where(~F.col("name").startswith("."))
        .orderBy(F.desc("is_dir"), F.lower("name"))
    )


def subdirectories(spark: SparkSession, path: str) -> DataFrame:
    """S9 — dirs only, alphabetical case-insensitive (lib.rs:379-419, O4)."""
    return (
        list_directory(spark, path)
        .where(F.col("is_dir"))
        .select("name", "path")
        .orderBy(F.lower("name"))
    )


class DeletionReport(Row):
    pass


# Error strings returned by delete_urls are a sample, never the full
# miss set: an unbounded selection of misses would otherwise OOM the
# driver (the counts are always exact — they come from joins).
MAX_DELETE_ERRORS = 1000


def delete_urls(
    spark: SparkSession, table_path: str, urls: "list[str] | DataFrame"
) -> dict:
    """S10 — delete rows by key from the parquet-backed table with
    per-key error capture (lib.rs:200-259 semantics): keys not present
    are failures; the rewrite is atomic (write-then-swap), success/fail
    counts + error strings returned.

    The selection is a DataFrame (a list of keys is wrapped into one);
    membership is decided with semi/anti joins — no key set is ever
    collected to the driver or inlined into the plan as a literal, so a
    10^9-row selection against the pages table works. Semantics are
    **per distinct key** (the set form of the reference's per-entry loop,
    lib.rs:200-259): a key listed twice counts once in success/fail and
    yields at most one error. ``fail_count`` is exact (an anti-join
    count); ``errors`` carries at most ``MAX_DELETE_ERRORS`` sample
    strings, in no guaranteed order. On Iceberg the rewrite is
    ``DELETE FROM t WHERE url IN (SELECT url FROM sel)``; the parquet
    stand-in rewrites the table excluding matched keys."""
    import shutil
    import uuid

    df = spark.read.parquet(table_path)
    sel = (
        urls
        if isinstance(urls, DataFrame)
        else spark.createDataFrame([(u,) for u in urls], "url string")
    ).select("url").distinct()
    missing = sel.join(df.select("url"), "url", "left_anti")
    n_missing = missing.count()
    errors = [
        f"not found: {r['url']}"
        for r in missing.limit(MAX_DELETE_ERRORS).collect()
    ]
    n_selected = sel.count()
    kept = df.join(sel, "url", "left_anti")
    tmp = f"{table_path}.tmp-{uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(table_path)
    os.rename(tmp, table_path)
    return {
        "success_count": n_selected - n_missing,
        "fail_count": n_missing,
        "errors": errors,
    }
