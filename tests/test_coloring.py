"""Jones-Plassmann coloring — python round-replay mirror (md5 priorities ⇒
deterministic) + properness / Δ+1 bound / partition invariance."""

from __future__ import annotations

import hashlib
import random

import pytest


def _prio(v):
    s = str(v)
    return hashlib.md5(s.encode()).hexdigest() + "|" + s.zfill(12)


def _sym(edges):
    out = set()
    for s, d, *_ in edges:
        if s != d:
            out.add((s, d))
            out.add((d, s))
    return out


def _py_coloring(edges, max_rounds=200):
    """Exact replay of coloring._jp_loop."""
    sym = _sym(edges)
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    uncolored = set(adj)
    colored = {}
    r = 0
    while uncolored and r < max_rounds:
        r += 1
        winners = [
            v
            for v in uncolored
            if all(
                _prio(v) > _prio(w) for w in adj[v] if w in uncolored
            )
        ]
        if not winners:
            break
        for v in winners:
            used = {colored[w] for w in adj[v] if w in colored}
            c = 1
            while c in used:
                c += 1
            colored[v] = c
        uncolored -= set(winners)
    return colored


def _run(spark, edges):
    from osmgraphing_spark.operators import coloring

    df = spark.createDataFrame(
        [(s, d) for s, d, *_ in edges], "src long, dst long"
    )
    got = {r["vid"]: r["color"] for r in coloring.greedy_coloring(df).collect()}
    assert got == _py_coloring(edges)
    # properness
    for a, b in _sym(edges):
        assert got[a] != got[b]
    # Δ+1 bound
    deg = {}
    for a, b in _sym(edges):
        deg[a] = deg.get(a, 0) + 1
    assert max(got.values()) <= max(deg.values()) + 1
    return got


def test_coloring_triangle_and_path(spark):
    got = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert len({got[1], got[2], got[3]}) == 3  # triangle needs 3 colors


def test_coloring_bipartite_star(spark):
    got = _run(spark, [(0, i) for i in range(1, 12)])
    assert max(got.values()) == 2  # a star is 2-colorable


@pytest.mark.parametrize("seed,n,m", [(4, 25, 60), (13, 50, 140)])
def test_coloring_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    _run(spark, edges)


def test_coloring_partition_invariance(spark):
    from osmgraphing_spark.operators import coloring

    rng = random.Random(6)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, coloring.greedy_coloring(df).collect()))
    b = sorted(
        map(tuple, coloring.greedy_coloring(df.repartition(11)).collect())
    )
    assert a == b
