"""Connected components: correctness on adversarial graph shapes.

Every case runs through BOTH paths — the driver union-find fast path
(small_graph_edges default) and the distributed large-star/small-star
loop (small_graph_edges=0) — which must produce identical labels.
"""

from __future__ import annotations

import pytest

from dedupe_algo_spark.operators.cluster import connected_components


@pytest.fixture(params=[0, 1_000_000], ids=["distributed", "local-fastpath"])
def _cc(spark, request):
    def run(spark_, edges):
        df = spark_.createDataFrame(edges, ["src", "dst"])
        out = connected_components(df, small_graph_edges=request.param).collect()
        return {r["url"]: r["component"] for r in out}

    return lambda spark_, edges: run(spark_, edges)


def test_two_components(spark, _cc):
    m = _cc(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    assert m == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_long_chain(spark, _cc):
    # chain stresses superstep convergence (naive propagation = O(n) iters)
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    m = _cc(spark, edges)
    assert set(m.values()) == {"n000"}
    assert len(m) == 40


def test_star_and_duplicate_edges(spark, _cc):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    edges += edges[:3]  # duplicates
    edges += [(b, a) for a, b in edges[:3]]  # reversed duplicates
    m = _cc(spark, edges)
    assert len(set(m.values())) == 1
    assert min(m) in m.values()


def test_self_loops_ignored(spark, _cc):
    m = _cc(spark, [("a", "a"), ("a", "b")])
    assert m == {"a": "a", "b": "a"}


def test_component_id_is_lexicographic_min(spark, _cc):
    m = _cc(spark, [("z", "m"), ("m", "b"), ("q", "z")])
    assert set(m.values()) == {"b"}
