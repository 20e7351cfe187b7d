"""Deterministic random walks vs a pure-python md5 oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from osmgraphing_spark.operators import walks


def _h(walker: int, step: int) -> int:
    return int(hashlib.md5(f"{walker}|{step}".encode()).hexdigest()[:14], 16)


def _walks_oracle(edges, length, wpv):
    adj = defaultdict(list)
    for a, b in sorted(set(edges)):
        adj[a].append(b)  # sorted by dst via the outer sort
    verts = sorted({v for e in edges for v in e})
    rows = set()
    for v in verts:
        for j in range(wpv):
            walker = v * wpv + j
            node = v
            rows.add((walker, 0, node))
            for s in range(1, length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = nbrs[_h(walker, s) % len(nbrs)]
                rows.add((walker, s, node))
    return rows


def _run(spark, edges, length, wpv):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["walker"], r["step"], r["node"])
        for r in walks.random_walks(df, length=length, walks_per_vertex=wpv).collect()
    }
    assert got == _walks_oracle(edges, length, wpv)


def test_walks_ring_and_deadend(spark):
    # ring 0-1-2-3 plus a dead-end spur 3 -> 9
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 9)]
    _run(spark, edges, length=4, wpv=2)


def test_walks_random_graph(spark):
    import random

    rng = random.Random(13)
    edges = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    edges = [e for e in edges if e[0] != e[1]]
    _run(spark, edges, length=3, wpv=1)


def test_walks_partition_invariant(spark):
    edges = [(i, (i * 3 + 1) % 10) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {tuple(r) for r in walks.random_walks(df, 3, 1).collect()}
    b = {
        tuple(r)
        for r in walks.random_walks(df.repartition(7), 3, 1).collect()
    }
    assert a == b
