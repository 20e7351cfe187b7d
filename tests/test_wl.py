"""WL color refinement vs a pure-Python md5 mirror + structural facts."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest

from osmgraphing_spark.operators import wl


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _h(color: str) -> int:
    return int(_md5(color)[:12], 16) % wl.H_MOD


def _wl_py(edges, rounds):
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    color = {v: _md5(str(len(ns))) for v, ns in nbrs.items()}
    for _ in range(rounds):
        color = {
            v: _md5(
                f"{color[v]}|{sum(_h(color[u]) for u in ns)}|{len(ns)}"
            )
            for v, ns in nbrs.items()
        }
    return color


@pytest.mark.parametrize("rounds", [0, 1, 3])
def test_wl_matches_mirror(spark, rounds):
    rng = random.Random(41)
    edges = sorted({(rng.randrange(14), rng.randrange(14)) for _ in range(35)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vid"]: r["color"] for r in wl.wl_colors(df, rounds=rounds).collect()}
    assert got == _wl_py(edges, rounds)


def test_wl_distinguishes_path_endpoints(spark):
    # path 0-1-2-3-4: after refinement ends/middles separate by position
    edges = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vid"]: r["color"] for r in wl.wl_colors(df, rounds=2).collect()}
    assert got[0] == got[4]          # symmetric endpoints
    assert got[1] == got[3]          # symmetric next-to-ends
    assert got[0] != got[1] != got[2]


def test_wl_ring_is_uniform_and_histogram(spark):
    # every vertex of a ring is structurally identical at any depth
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    colors = {r["color"] for r in wl.wl_colors(df, rounds=3).collect()}
    assert len(colors) == 1
    hist = wl.wl_histogram(df, rounds=3).collect()
    assert len(hist) == 1 and hist[0]["n_vertices"] == n
