"""Connected components: correctness on adversarial graph shapes."""

from __future__ import annotations

import pytest

from dedupe_algo_spark.operators.cluster import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df).collect()
    return {r["url"]: r["component"] for r in out}


def test_two_components(spark):
    m = _cc(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    assert m == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_long_chain(spark):
    # chain stresses superstep convergence (naive propagation = O(n) iters)
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    m = _cc(spark, edges)
    assert set(m.values()) == {"n000"}
    assert len(m) == 40


def test_star_and_duplicate_edges(spark):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    edges += edges[:3]  # duplicates
    edges += [(b, a) for a, b in edges[:3]]  # reversed duplicates
    m = _cc(spark, edges)
    assert len(set(m.values())) == 1
    assert min(m) in m.values()


def test_self_loops_ignored(spark):
    m = _cc(spark, [("a", "a"), ("a", "b")])
    assert m == {"a": "a", "b": "a"}


def test_component_id_is_lexicographic_min(spark):
    m = _cc(spark, [("z", "m"), ("m", "b"), ("q", "z")])
    assert set(m.values()) == {"b"}
