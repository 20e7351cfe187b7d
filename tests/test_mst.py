"""Borůvka MSF — Kruskal python mirror (the MSF is unique under the total
edge order (w, u, v), so two different algorithms must agree EXACTLY)."""

from __future__ import annotations

import random

import pytest


def _py_kruskal(edges):
    """→ sorted [(u, v, w)] — union-find Kruskal over canonical edges."""
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        canon[(u, v)] = min(w, canon.get((u, v), w))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _run(spark, edges):
    from osmgraphing_spark.operators import mst

    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = sorted(
        (r["u"], r["v"], r["w"]) for r in mst.boruvka_msf(df).collect()
    )
    assert got == _py_kruskal(edges)
    return got


def test_msf_simple_triangle(spark):
    # triangle: the heaviest edge is dropped
    got = _run(spark, [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 3.0)])
    assert got == [(1, 2, 1.0), (2, 3, 2.0)]


def test_msf_disconnected_forest(spark):
    got = _run(
        spark,
        [(1, 2, 5.0), (2, 3, 1.0), (1, 3, 2.0), (10, 11, 7.0), (11, 12, 1.0)],
    )
    # two trees: {1,2,3} keeps (2,3) and (1,3); {10,11,12} keeps both
    assert len(got) == 4 and (1, 2, 5.0) not in got


def test_msf_parallel_edges_and_self_loops(spark):
    got = _run(spark, [(1, 2, 9.0), (2, 1, 3.0), (1, 1, 0.5), (2, 3, 4.0)])
    assert got == [(1, 2, 3.0), (2, 3, 4.0)]


def test_msf_equal_weights_tie_break_unique(spark):
    # all weights equal: the (w, u, v) order still fixes a unique forest
    edges = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    got = _run(spark, edges)
    assert len(got) == 4


@pytest.mark.parametrize("seed,n,m", [(3, 30, 80), (9, 50, 120)])
def test_msf_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n), rng.randrange(n), float(rng.randrange(1, 12)))
        for _ in range(m)
    ]
    _run(spark, edges)


def test_msf_weight_summary(spark):
    from osmgraphing_spark.operators import mst

    df = spark.createDataFrame(
        [(1, 2, 1.5), (2, 3, 2.5), (1, 3, 9.0)], "src long, dst long, weight double"
    )
    s = mst.msf_weight(mst.boruvka_msf(df)).collect()[0]
    assert (s["n_edges"], s["total_w"]) == (2, 4.0)
