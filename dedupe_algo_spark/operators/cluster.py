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


# Below this many canonical edges the contracted rep-graph is solved
# driver-side: a union-find over ≤1M string pairs is ~1s of driver work,
# while every distributed superstep costs ~10 shuffle/checkpoint jobs of
# fixed latency that no executor count can shrink. The distributed
# large-star/small-star path stays the algorithm of record for graphs
# that cannot fit (10^12-doc corpora can carry billions of rep edges).
SMALL_GRAPH_EDGES = 1_000_000


def _local_cc(edges: DataFrame, limit: int | None = None) -> "DataFrame | None":
    """Driver union-find fast path — identical output contract to the
    distributed path: (url, component=lexicographic min of component).

    Edges stream to the driver as plain 2-tuples via ``toLocalIterator``
    over ONE coalesced partition (one job, no per-partition barrier),
    never as a collected list of Row objects — at the 1M-edge threshold
    the Row form is several hundred MB of driver heap; the streamed
    form holds only the union-find dict plus the Arrow batches.

    ``limit`` folds the is-it-small-enough decision into the same
    stream: if more than ``limit`` edges arrive, the attempt aborts and
    returns None (caller falls back to the distributed path) — no
    separate count job on the common path. The returned DataFrame
    carries ``_dedupe_known_rows`` so callers can make broadcast
    decisions without another counting job."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    n = 0
    for a, b in edges.select("src", "dst").coalesce(1).toLocalIterator():
        n += 1
        if limit is not None and n > limit:
            return None
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[str, str] = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    rows = [(v, comp_min[find(v)]) for v in sorted(parent)]
    # plain tuples through parallelize — half the per-row driver footprint
    # of createDataFrame(list-of-Rows) and the ship to executors is chunked
    sc = edges.sparkSession.sparkContext
    n_slices = max(1, len(rows) // 50_000)
    out = edges.sparkSession.createDataFrame(
        sc.parallelize(rows, numSlices=n_slices), "url string, component string"
    )
    out._dedupe_known_rows = len(rows)
    return out


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    checkpoint: bool = True,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
    tracker=None,
) -> DataFrame:
    """→ (url, component) assignment for every node appearing in edges.

    ``component`` is the lexicographic min url of the component. Nodes
    not present in any edge are singletons and simply absent here.

    Graphs whose canonical edge set is ≤ ``small_graph_edges`` are
    solved with a driver-side union-find (same output, ~1 job instead of
    ~10 per superstep); pass 0 to force the distributed path.

    Checkpoint hygiene: each superstep's eager ``localCheckpoint``
    supersedes its parent, which is unpersisted immediately — only ONE
    superstep's blocks are ever live. The final checkpoint backs the
    returned DataFrame; its RDD ids are registered on ``tracker``
    (a :class:`~dedupe_algo_spark.tracking.PersistTracker`) if given, so
    the caller can release it after consuming the assignment.
    """
    from ..tracking import checkpoint_rdd_ids, persistent_rdd_ids, unpersist_rdd_ids

    spark = edges.sparkSession
    live: set[int] = set()  # RDD ids of the current (newest) checkpoint
    before = persistent_rdd_ids(spark) if checkpoint else set()

    def _ckpt(df: DataFrame) -> DataFrame:
        nonlocal live, before
        out = df.localCheckpoint(eager=True)
        # Identify the checkpoint's OWN rdd id(s), precisely: the
        # checkpointed DataFrame's LogicalRDD holds the persisted RDD.
        # The persistent-RDD-set delta is only the fallback — a stage
        # cache materialized by this same job (the first action of a
        # lazy pipeline often runs inside the first checkpoint) lands
        # in the delta and would get wrongly unpersisted later, forcing
        # its consumers (audit flush, cluster join) to recompute — a
        # measured 23s re-read of the confirm shuffle at 4M pages.
        ids = checkpoint_rdd_ids(out)
        now = persistent_rdd_ids(spark)
        if ids is None:
            ids = now - before
        unpersist_rdd_ids(spark, live)  # parent superstep is superseded
        live = ids
        before = now
        return out

    cur = _canonical(edges.select(F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")))
    if checkpoint:
        cur = _ckpt(cur)
    if small_graph_edges:
        # stream-and-abort: the size decision rides the union-find's own
        # edge stream (no separate count job); None ⇒ graph too big
        out = _local_cc(cur, limit=small_graph_edges)
        if out is not None:
            # the union-find consumed the edges; the canonical checkpoint
            # is dead weight (the result is parallelize-backed, independent)
            unpersist_rdd_ids(spark, live)
            return out
    prev_sig = None
    for i in range(max_iter):
        cur = _canonical(_small_star(_large_star(cur)))
        if checkpoint:
            cur = _ckpt(cur)
        # signature check every superstep: the collect is two sub-second
        # stages while a wasted superstep is ~10 shuffle/checkpoint jobs,
        # so eager checking minimizes total job count (star/clique edge
        # sets -- the dedup shape -- converge at superstep 2)
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    if tracker is not None and live:
        tracker.adopt_ids(spark, live)
    # fixpoint: every edge is (member, root). Roots map to themselves.
    members = cur.select(F.col("src").alias("url"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("url"), F.col("dst").alias("component")).distinct()
    return members.union(roots).groupBy("url").agg(F.min("component").alias("component"))
