"""Maximal matching — python round-replay mirror (md5 priorities make the
algorithm deterministic, so the mirror must agree EXACTLY) + matching /
maximality / vertex-cover properties."""

from __future__ import annotations

import hashlib
import random

import pytest


def _canon(edges):
    return sorted(
        {(min(s, d), max(s, d)) for s, d, *rest in edges if s != d}
    )


def _prio(u, v, r):
    return int(hashlib.md5(f"{u}|{v}|{r}".encode()).hexdigest()[:14], 16)


def _py_matching(edges, max_rounds=60):
    """Exact replay of matching._matching_loop."""
    live = set(_canon(edges))
    matched = []
    r = 0
    while live and r < max_rounds:
        r += 1
        pick = {}
        for (u, v) in live:
            key = (_prio(u, v, r), u, v)
            for vtx in (u, v):
                if vtx not in pick or key < pick[vtx]:
                    pick[vtx] = key
        new = {
            (u, v)
            for (u, v) in live
            if pick[u][1:] == (u, v) and pick[v][1:] == (u, v)
        }
        if not new:
            break
        matched.extend(new)
        dead = {x for e in new for x in e}
        live = {(u, v) for (u, v) in live if u not in dead and v not in dead}
    return sorted(matched)


def _run(spark, edges, expect_mirror=True):
    from osmgraphing_spark.operators import matching

    df = spark.createDataFrame(
        [(s, d) for s, d, *_ in edges], "src long, dst long"
    )
    got = sorted((r["u"], r["v"]) for r in matching.maximal_matching(df).collect())
    if expect_mirror:
        assert got == _py_matching(edges)
    # matching property: endpoints disjoint
    flat = [x for e in got for x in e]
    assert len(flat) == len(set(flat))
    # maximality: every canonical edge has a matched endpoint
    ms = set(flat)
    for (u, v) in _canon(edges):
        assert u in ms or v in ms, (u, v)
    return got


def test_matching_triangle(spark):
    got = _run(spark, [(1, 2), (2, 3), (1, 3)])
    assert len(got) == 1  # a triangle can match only one edge


def test_matching_path_and_isolated_dups(spark):
    _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 5), (2, 1), (9, 10)])


@pytest.mark.parametrize("seed,n,m", [(2, 30, 70), (11, 60, 150)])
def test_matching_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    _run(spark, edges)


def test_matching_partition_invariance(spark):
    from osmgraphing_spark.operators import matching

    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, matching.maximal_matching(df).collect()))
    b = sorted(
        map(tuple, matching.maximal_matching(df.repartition(13)).collect())
    )
    assert a == b == _py_matching(edges)


def test_vertex_cover_covers_everything(spark):
    from osmgraphing_spark.operators import matching

    rng = random.Random(8)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    cover = {r["vid"] for r in matching.vertex_cover_2approx(df).collect()}
    for (u, v) in _canon(edges):
        assert u in cover or v in cover
    # 2-approx bound vs the mirror matching (cover = 2·|M|, OPT >= |M|)
    assert len(cover) == 2 * len(_py_matching(edges))
