"""Transitive clustering — iterative large-star / small-star connected
components over a match-edge DataFrame.

Algorithm per Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14, public) — the north_star-mandated formulation. Both
steps are a groupBy + join on node id (2 shuffles per superstep);
convergence is O(log n) supersteps for any graph, and 2-3 for the
star/chain shapes dedup produces.

Scale notes:
* every superstep ends with ``localCheckpoint`` — truncates the lineage
  so the plan does not grow exponentially across iterations (on a real
  cluster this is a checkpoint dir / intermediate table write; local
  mode keeps it in block storage).
* convergence test is a one-pass aggregate signature
  (count + sum of xxhash64 over edges) — no exceptAll anti-join, no
  collect of the edge set.
* node ids are strings (urls); min() is lexicographic — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (hi, lo) sorted pairs, deduped, no loops."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    nbrs = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbrs.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (hi→lo); for each node u: connect every ≤-neighbor and u
    itself to min(N≤(u) ∪ {u})."""
    oriented = _canonical(edges)  # src > dst
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    j = oriented.join(m, "src")
    # no inner distinct: the caller's _canonical dedups the superstep output
    return j.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        j.select("src", F.col("m").alias("dst"))
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint: bool = True
) -> DataFrame:
    """→ (url, component) assignment for every node appearing in edges.

    ``component`` is the lexicographic min url of the component. Nodes
    not present in any edge are singletons and simply absent here.
    """
    cur = _canonical(edges.select(F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")))
    if checkpoint:
        cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    for i in range(max_iter):
        cur = _canonical(_small_star(_large_star(cur)))
        if checkpoint:
            cur = cur.localCheckpoint(eager=True)
        # signature check every superstep: the collect is two sub-second
        # stages while a wasted superstep is ~10 shuffle/checkpoint jobs,
        # so eager checking minimizes total job count (star/clique edge
        # sets -- the dedup shape -- converge at superstep 2)
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # fixpoint: every edge is (member, root). Roots map to themselves.
    members = cur.select(F.col("src").alias("url"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("url"), F.col("dst").alias("component")).distinct()
    return members.union(roots).groupBy("url").agg(F.min("component").alias("component"))
