"""Betweenness centrality (operators/betweenness) vs an exact python
Brandes oracle — full-pivot exact match, sampled-pivot subset match, and
the textbook star/path goldens."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest

from osmgraphing_spark.operators import betweenness as bt


def _brandes_oracle(edges, sources, verts=None):
    """Directed Brandes restricted to the given pivot sources."""
    adj = defaultdict(list)
    vs = set()
    for s, d in edges:
        if s != d:
            adj[s].append(d)
            vs.update((s, d))
    if verts:
        vs.update(verts)
    score = defaultdict(float)
    for s in sources:
        preds = defaultdict(list)
        sigma = defaultdict(float)
        dist = {s: 0}
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v in vs:
            if v != s:
                score[v] += delta[v]
    return {v: round(score[v], 6) for v in vs if score[v] != 0.0}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_path_and_star_goldens(spark):
    # directed path 0→1→2→3: betweenness(1)=2 (0→2,0→3... via 1), (2)=2
    path = [(0, 1), (1, 2), (2, 3)]
    got = {
        r["vid"]: r["betweenness"]
        for r in bt.betweenness(_df(spark, path), sources=[0, 1, 2, 3]).collect()
    }
    assert got == _brandes_oracle(path, [0, 1, 2, 3]) == {1: 2.0, 2: 2.0}

    # out-star: hub 0 → leaves; no vertex is interior
    star = [(0, i) for i in range(1, 6)]
    got = bt.betweenness(_df(spark, star), sources=list(range(6))).collect()
    assert {r["vid"]: r["betweenness"] for r in got} == {}


@pytest.mark.parametrize("seed,n,m", [(3, 25, 60), (4, 40, 110)])
def test_matches_brandes_all_pivots(spark, seed, n, m):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    edges = sorted(edges)
    pivots = sorted({v for e in edges for v in e})
    got = {
        r["vid"]: r["betweenness"]
        for r in bt.betweenness(_df(spark, edges), sources=pivots).collect()
    }
    want = _brandes_oracle(edges, pivots)
    assert set(got) == set(want)
    for v, x in want.items():
        assert abs(got[v] - x) < 1e-6, (v, got[v], x)


def test_sampled_pivots_and_scaling(spark):
    rng = random.Random(11)
    edges = sorted(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(90)}
        - {(i, i) for i in range(30)}
    )
    pivots = [0, 3, 7, 12]
    n = len({v for e in edges for v in e})
    got = {
        r["vid"]: r["betweenness"]
        for r in bt.betweenness(
            _df(spark, edges), sources=pivots, scale_to_n=n
        ).collect()
    }
    want = {
        v: round(x * n / len(pivots), 6)
        for v, x in _brandes_oracle(edges, pivots).items()
    }
    assert set(got) == set(want)
    for v, x in want.items():
        assert abs(got[v] - x) < 1e-4
