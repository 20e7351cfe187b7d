"""Neighborhood function / distance distribution / effective diameter
(operators/neighborhood): exact bitset tier pinned against a python BFS
oracle, HyperANF sketch tier pinned against the exact tier."""

from __future__ import annotations

import random
from collections import deque

import pytest

from osmgraphing_spark.operators import neighborhood as nb


def _bfs_nf(n_vertices: list[int], edges: list[tuple[int, int]]) -> list[int]:
    """Exact neighborhood function: N[t] = # ordered pairs (u,v) with
    dist(u→v) <= t, self pairs at t=0 included."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    counts: dict[int, int] = {}
    for u in n_vertices:
        dist = {u: 0}
        q = deque([u])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for d in dist.values():
            counts[d] = counts.get(d, 0) + 1
    out, cum = [], 0
    for t in range(max(counts) + 1):
        cum += counts.get(t, 0)
        out.append(cum)
    return out


def _mk_random(seed: int, n: int, m: int) -> tuple[list[int], list[tuple[int, int]]]:
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        s, d = rng.randrange(n), rng.randrange(n)
        if s != d:
            edges.add((s, d))
    verts = sorted({v for e in edges for v in e})
    return verts, sorted(edges)


@pytest.mark.parametrize("seed,n,m", [(1, 30, 60), (2, 50, 120), (3, 40, 300)])
def test_exact_matches_bfs_oracle(spark, seed, n, m):
    verts, edges = _mk_random(seed, n, m)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["t"]: r["pairs"] for r in nb.distance_distribution(df).collect()}
    want = _bfs_nf(verts, edges)
    assert got == {t: c for t, c in enumerate(want)}


def test_exact_on_disconnected_ring_and_path(spark):
    # ring 0→1→2→0 (diameter 2) + path 10→11 (diameter 1), disconnected
    edges = [(0, 1), (1, 2), (2, 0), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [(r["t"], r["pairs"]) for r in nb.distance_distribution(df).collect()]
    # t=0: 5 selves; t=1: +4 edges→9; t=2: +3 ring second hops→12; stop
    assert got == [(0, 5), (1, 9), (2, 12)]


def test_effective_diameter_and_avg_distance(spark):
    edges = [(i, i + 1) for i in range(4)]  # path of 5 vertices
    dd = nb.distance_distribution(spark.createDataFrame(edges, "src long, dst long"))
    # N = [5, 9, 12, 14, 15]; target 0.9*15=13.5 between t=2 (12) and t=3 (14)
    assert abs(nb.effective_diameter(dd, alpha=0.9) - (2 + 1.5 / 2)) < 1e-9
    # Σ t·ΔN = 1·4 + 2·3 + 3·2 + 4·1 = 20; 20/15
    assert abs(nb.avg_distance(dd) - 20 / 15) < 1e-9


def test_hll_tracks_exact_within_error(spark):
    verts, edges = _mk_random(7, 200, 700)
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {r["t"]: r["pairs"] for r in nb.distance_distribution(df).collect()}
    est = {r["t"]: r["pairs"] for r in nb.neighborhood_function_hll(df, log2m=9).collect()}
    # same support (fixpoint at the same diameter ± 1 round)
    assert abs(max(est) - max(exact)) <= 1
    for t, n in exact.items():
        if t in est:
            assert abs(est[t] - n) / n < 0.15, (t, est[t], n)
    # estimates are monotone in t like the true function
    ts = sorted(est)
    assert all(est[a] <= est[b] * 1.001 for a, b in zip(ts, ts[1:]))


def test_hll_deterministic_across_partitionings(spark):
    """Register STATE is integer-exact and partition-invariant (md5-derived),
    so the series support is identical; the harmonic-mean readout is a
    distributed float sum, deterministic only to reduction order (ulps)."""
    _, edges = _mk_random(11, 60, 150)
    a = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(2)
    ra = sorted((r["t"], r["pairs"]) for r in nb.neighborhood_function_hll(a).collect())
    rb = sorted((r["t"], r["pairs"]) for r in nb.neighborhood_function_hll(b).collect())
    assert [t for t, _ in ra] == [t for t, _ in rb]
    for (_, x), (_, y) in zip(ra, rb):
        assert abs(x - y) <= 1e-9 * max(x, y)
