"""graph.pagerank / textrank_keywords vs a pure-Python reference."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import graph


def _py_pagerank(edges, iterations=10):
    """Reference: same integer fixed-point recurrence, plain dicts."""
    from collections import defaultdict

    w = defaultdict(int)
    for u, v, n in edges:
        w[(u, v)] += n
    wu = defaultdict(int)
    for (u, _v), n in w.items():
        wu[u] += n
    nodes = {u for u, _ in w} | {v for _, v in w}
    r = {n: graph.SCALE for n in nodes}
    base = (15 * graph.SCALE) // 100
    for _ in range(iterations):
        inflow = defaultdict(int)
        for (u, v), n in w.items():
            inflow[v] += (r[u] // wu[u]) * n + ((r[u] % wu[u]) * n) // wu[u]
        r = {n: base + (85 * inflow[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    edges = [
        ("a", "b", 3), ("b", "a", 3),       # strong mutual pair
        ("c", "a", 1), ("d", "a", 1),       # star into a
        ("a", "c", 1), ("a", "d", 1),
        ("d", "e", 2), ("e", "d", 2),
        ("f", "f2", 1), ("f2", "f", 1),     # separate component
    ]
    df = spark.createDataFrame(edges, "u string, v string, w long")
    got = {r.node: r.rank_e12 for r in graph.pagerank(df).collect()}
    assert got == _py_pagerank(edges)
    # the hub must outrank leaves
    assert got["a"] > got["c"] and got["a"] > got["f"]


def test_pagerank_symmetric_cycle_is_uniform(spark):
    n = 5
    edges = [(str(i), str((i + 1) % n), 1) for i in range(n)]
    edges += [(str((i + 1) % n), str(i), 1) for i in range(n)]
    df = spark.createDataFrame(edges, "u string, v string, w long")
    ranks = {r.rank_e12 for r in graph.pagerank(df).collect()}
    assert len(ranks) == 1  # perfect symmetry → identical integer ranks


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # v has no out-edges: it receives mass but redistributes none
    df = spark.createDataFrame(
        [("u", "v", 1), ("w", "u", 1), ("u", "w", 1)],
        "u string, v string, w long",
    )
    got = {r.node: r.rank_e12 for r in graph.pagerank(df).collect()}
    assert got == _py_pagerank([("u", "v", 1), ("w", "u", 1), ("u", "w", 1)])


def test_pagerank_nonpositive_weights_dropped_not_divide_by_zero(spark):
    """Zero/negative summed weights are filtered at edge prep (the
    ANSI-hardening rule): ranks equal the graph with only the
    positive-weight edges, instead of a DIVIDE_BY_ZERO mid-iteration
    (wu = 0) or silently corrupted ranks."""
    df = spark.createDataFrame(
        [
            ("a", "b", 2), ("b", "a", 2),
            ("z", "a", 0),              # zero weight → dropped
            ("y", "b", 3), ("y", "b", -3),  # sums to 0 → dropped
            ("c", "a", 1), ("a", "c", 1),
        ],
        "u string, v string, w long",
    )
    got = {r.node: r.rank_e12 for r in graph.pagerank(df).collect()}
    assert got == _py_pagerank(
        [("a", "b", 2), ("b", "a", 2), ("c", "a", 1), ("a", "c", 1)]
    )
    assert "z" not in got and "y" not in got


def test_textrank_keywords_shape(spark, tables):
    out = graph.textrank_keywords(tables["documents"], top_k=10).collect()
    assert len(out) == 10
    ranks = [r.rank_e12 for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.n_edges >= 1 for r in out)
