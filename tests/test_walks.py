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


def _n2v_oracle(edges, length, ret_w, d1_w, d2_w, wpv=1, max_degree=None):
    adj = defaultdict(list)
    eset = set()
    for a, b in sorted(set(edges)):
        adj[a].append(b)
        eset.add((a, b))
    verts = sorted({v for e in edges for v in e})
    rows = set()
    for v in verts:
        for j in range(wpv):
            walker = v * wpv + j
            prev, node = None, v
            rows.add((walker, 0, node))
            for s in range(1, length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                hub = max_degree is not None and len(nbrs) > max_degree
                if prev is None or s == 1 or hub:
                    nxt = nbrs[_h(walker, s) % len(nbrs)]
                else:
                    ws = [
                        ret_w if x == prev
                        else d1_w if (prev, x) in eset
                        else d2_w
                        for x in nbrs
                    ]
                    r = _h(walker, s) % sum(ws)
                    cum = 0
                    for x, w in zip(nbrs, ws):
                        cum += w
                        if r < cum:
                            nxt = x
                            break
                prev, node = node, nxt
                rows.add((walker, s, node))
    return rows


def _run_n2v(spark, edges, length, wpv=1, max_degree=None, **bias):
    bias = {"ret_w": 1, "d1_w": 2, "d2_w": 4, **bias}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["walker"], r["step"], r["node"])
        for r in walks.node2vec_walks(
            df, length=length, walks_per_vertex=wpv, max_degree=max_degree, **bias
        ).collect()
    }
    assert got == _n2v_oracle(
        edges, length, bias["ret_w"], bias["d1_w"], bias["d2_w"],
        wpv=wpv, max_degree=max_degree,
    )


def test_node2vec_ring_and_deadend(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 9), (1, 0), (2, 1)]
    _run_n2v(spark, edges, length=4, wpv=2)


def test_node2vec_random_graph_biases(spark):
    import random

    rng = random.Random(19)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(50)})
    edges = [e for e in edges if e[0] != e[1]]
    _run_n2v(spark, edges, length=3)
    _run_n2v(spark, edges, length=3, ret_w=5, d1_w=1, d2_w=1)  # return-y
    _run_n2v(spark, edges, length=3, ret_w=1, d1_w=1, d2_w=9)  # exploratory


def test_node2vec_hub_valve(spark):
    # star hub 0 -> {1..8} plus a cycle so walks continue
    edges = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    edges += [(1, 2), (2, 1)]
    _run_n2v(spark, edges, length=4, max_degree=4)
    _run_n2v(spark, edges, length=4, max_degree=None)
