"""Densest subgraph (Charikar greedy peel) vs a pure-Python mirror and
planted-clique recovery."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from osmgraphing_spark.operators import densest


def _peel_py(edges, epsilon, max_rounds=64):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    best = (-1.0, 0, set())
    r = 0
    while und and r < max_rounds:
        deg = defaultdict(int)
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        n, m = len(deg), len(und)
        rho = m / n
        if rho > best[0]:
            best = (rho, r, set(deg))
        thresh = 2 * (1 + epsilon) * rho
        keep = {v for v, d in deg.items() if d > thresh}
        und = {(a, b) for a, b in und if a in keep and b in keep}
        r += 1
    return best


def test_matches_python_mirror(spark):
    rng = random.Random(59)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    members, stats = densest.densest_subgraph(df, epsilon=0.1)
    rho, rnd, vids = _peel_py(edges, 0.1)
    assert stats["best_density"] == round(rho, 6)
    assert stats["best_round"] == rnd
    assert {r["vid"] for r in members.collect()} == vids


def test_planted_clique_found(spark):
    rng = random.Random(61)
    # sparse background: a long path + random sprinkle
    edges = [(i, i + 1) for i in range(100, 160)]
    edges += list({(100 + rng.randrange(60), 100 + rng.randrange(60))
                   for _ in range(20)})
    # planted K8 on vertices 0..7: density (8*7/2)/8 = 3.5
    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    df = spark.createDataFrame(edges + clique, "src long, dst long")
    members, stats = densest.densest_subgraph(df, epsilon=0.05)
    got = {r["vid"] for r in members.collect()}
    assert set(range(8)) <= got
    assert stats["best_density"] >= 3.0  # the clique dominates


def test_edgeless_graph(spark):
    df = spark.createDataFrame([(1, 1)], "src long, dst long")  # self-loop only
    members, stats = densest.densest_subgraph(df, epsilon=0.2)
    assert members.count() == 0 and stats["best_density"] == 0.0
