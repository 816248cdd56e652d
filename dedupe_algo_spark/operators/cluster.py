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
SMALL_GRAPH_EDGES_CAP = 1_000_000

# Driver-heap budget per canonical edge for the fast path. Measured: 1M
# edges of ~60-char urls cost ~0.4GB of driver RSS including the Arrow
# batches and pandas intermediates (~400B/edge); 4KiB/edge is 10×
# headroom, so the memory-derived bound only bites on drivers smaller
# than ~4g — where a 1M-row toPandas genuinely is a footgun.
_EDGE_MEM_BUDGET = 4096


def _mem_to_bytes(mem: str) -> int:
    """Parse a JVM memory string ('16g', '512m', '64k', bare = MiB,
    matching Spark's JavaUtils.byteStringAsMb default for this conf)."""
    s = mem.strip().lower().rstrip("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(float(s)) * (1 << 20)


def small_graph_limit(spark) -> int:
    """Derived ``small_graph_edges`` default:
    ``min(1M, driver_memory / 4KiB-per-edge)``."""
    try:
        mem = spark.conf.get("spark.driver.memory", "1g")
    except Exception:
        mem = "1g"
    return min(SMALL_GRAPH_EDGES_CAP, _mem_to_bytes(mem) // _EDGE_MEM_BUDGET)


def _local_cc(edges: DataFrame) -> DataFrame:
    """Driver union-find fast path — identical output contract to the
    distributed path: (url, component=lexicographic min of component).

    Transport is Arrow both ways. Inbound, ``toPandas`` fetches the
    edge partitions as parallel Arrow batches — measured 6.2s for a
    single-task ``coalesce(1).toLocalIterator`` drain of the same edge
    set at 4M pages vs well under a second for the batched collect
    (the caller has already bounded the edge count, so driver memory is
    capped either way). Outbound, ``createDataFrame(pandas)`` ships the
    assignment as Arrow record batches instead of pickled tuples in
    task binaries (the parallelize form logged >1MB task-size warnings
    and serialized on one driver thread). The returned DataFrame
    carries ``_dedupe_known_rows`` so callers can make broadcast
    decisions without another counting job."""
    import pandas as pd

    pdf = edges.select("src", "dst").toPandas()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"].values, pdf["dst"].values):
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
    urls = sorted(parent)
    out_pdf = pd.DataFrame(
        {"url": urls, "component": [comp_min[find(v)] for v in urls]}
    )
    out = edges.sparkSession.createDataFrame(out_pdf, "url string, component string")
    out._dedupe_known_rows = len(urls)
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
    small_graph_edges: int | None = None,
    tracker=None,
) -> DataFrame:
    """→ (url, component) assignment for every node appearing in edges.

    ``component`` is the lexicographic min url of the component. Nodes
    not present in any edge are singletons and simply absent here.

    Graphs whose canonical edge set is ≤ ``small_graph_edges`` are
    solved with a driver-side union-find (same output, ~1 job instead of
    ~10 per superstep); the default (``None``) derives the bound from
    the driver heap via :func:`small_graph_limit`; pass 0 to force the
    distributed path.

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

    if small_graph_edges is None:
        small_graph_edges = small_graph_limit(spark)
    cur = _canonical(edges.select(F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")))
    if checkpoint:
        cur = _ckpt(cur)
    base_cache = None
    if small_graph_edges:
        # The size decision is one count over the canonical edge set. On
        # the checkpointed path it is already materialized by the eager
        # localCheckpoint above, so the count scans block-manager blocks
        # (sub-second) without recomputing the edges. (A previous
        # stream-and-abort design that folded the decision into a
        # coalesce(1) iterator saved this count but paid a 6.2s
        # single-threaded drain at 4M pages.) Without checkpointing,
        # persist the canonical edges first so the count and their
        # consumer (_local_cc's toPandas, or the first superstep) share
        # one computation instead of running the edge plan twice.
        if not checkpoint:
            base_cache = cur = cur.persist()
        if cur.count() <= small_graph_edges:
            out = _local_cc(cur)
            # the union-find consumed the edges; the canonical checkpoint
            # / cache is dead weight (the result is Arrow/driver-backed)
            unpersist_rdd_ids(spark, live)
            if base_cache is not None:
                base_cache.unpersist()
            return out
    prev_sig = None
    for i in range(max_iter):
        cur = _canonical(_small_star(_large_star(cur)))
        if checkpoint:
            # convergence signature piggybacks on the checkpoint job
            # itself: CollectMetrics rides the eager materialization
            # (localCheckpoint runs under withAction, so the observed
            # (count, bit_xor) lands with ZERO extra jobs or driver
            # round-trips per superstep — previously a separate
            # two-stage agg-collect each iteration)
            from pyspark.sql import Observation

            obs = Observation()
            cur = cur.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)
                ).alias("h"),
            )
            cur = _ckpt(cur)
            m = obs.get
            sig = (int(m["n"]), int(m["h"]))
        else:
            # uncheckpointed path: no materializing job to ride — the
            # signature stays its own two-stage agg over the lineage
            # (a wasted superstep is ~10 shuffle jobs, so eager checking
            # still minimizes total job count; star/clique edge sets --
            # the dedup shape -- converge at superstep 2)
            sig = _signature(cur)
        if base_cache is not None:
            # the non-checkpoint input cache fed the first superstep's
            # signature pass; later iterations re-derive from lineage
            base_cache.unpersist()
            base_cache = None
        if sig == prev_sig:
            break
        prev_sig = sig
    if tracker is not None and live:
        tracker.adopt_ids(spark, live)
    # fixpoint: every edge is (member, root). Roots map to themselves.
    members = cur.select(F.col("src").alias("url"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("url"), F.col("dst").alias("component")).distinct()
    return members.union(roots).groupBy("url").agg(F.min("component").alias("component"))


def merge_clusters(
    assignments: DataFrame, new_edges: DataFrame, **cc_kwargs
) -> DataFrame:
    """→ (url, component): an existing cluster assignment updated with
    a batch of new match edges, recomputing ONLY the clusters the
    batch touches — the incremental counterpart of
    :func:`connected_components` for the daily-ingest deployment
    (sources/bucketed.py finds the batch's pairs exchange-free; this
    folds them into yesterday's entities without re-running CC over
    the 10^12-node historical graph).

    ``assignments`` is a prior CC output (url, component) where
    ``component`` is the min-url member — the star encoding of the
    historical partition, so each old cluster is reconstructible from
    its assignment rows alone (component→url star edges) and the full
    edge history is never needed. Correctness: a new edge can only
    change components it touches, and every member of a touched
    component is pulled into the subgraph via its star edges, so
    CC(star(touched) ∪ batch) equals the touched slice of
    CC(history ∪ batch); untouched rows pass through by anti-join.
    Labels stay the global min url because every merged cluster's
    candidate minima are all present in the subgraph.

    Scale shape: two slim semi/anti-joins on (url)/(component) and one
    CC over a subgraph proportional to the BATCH's blast radius, not
    the corpus. Urls unseen in ``assignments`` (brand-new pages, or
    prior singletons which CC omits) need no special casing — they
    enter through the batch edges themselves."""
    a = assignments.select(
        F.col(assignments.columns[0]).alias("url"),
        F.col(assignments.columns[1]).alias("component"),
    )
    e = new_edges.select(
        F.col(new_edges.columns[0]).alias("src"),
        F.col(new_edges.columns[1]).alias("dst"),
    )
    touched_urls = (
        e.select(F.col("src").alias("url"))
        .unionByName(e.select(F.col("dst").alias("url")))
        .distinct()
    )
    touched_comp = (
        a.join(touched_urls, "url", "left_semi").select("component").distinct()
    )
    star = (
        a.join(touched_comp, "component", "left_semi")
        .where(F.col("url") != F.col("component"))
        .select(F.col("component").alias("src"), F.col("url").alias("dst"))
    )
    merged = connected_components(star.unionByName(e), **cc_kwargs)
    untouched = a.join(touched_comp, "component", "left_anti")
    return untouched.unionByName(merged.select("url", "component"))
