"""Luby MIS — exact python-mirror replay + independence/maximality proofs.

The mirror replays the same md5-priority rounds; the structural tests
verify the two defining properties directly on the output (no member
adjacency; every non-member has a member neighbor) so a mirror bug can't
hide an algorithm bug.
"""

from __future__ import annotations

import hashlib

import pytest

from osmgraphing_spark.operators import mis as mis_op
from tests.helpers import graph_from_pairs


def _key(v: int) -> str:
    return hashlib.md5(str(v).encode()).hexdigest() + "|" + str(v).zfill(12)


def _py_luby(vertices, edges, rounds=None):
    """→ {vid: rnd} — mirror of mis.luby_mis over an undirected edge list."""
    adj = {v: set() for v in vertices}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    active = set(adj)
    out = {}
    r = 0
    while active and (rounds is None or r < rounds):
        r += 1
        sel = {
            v
            for v in active
            if all(_key(v) < _key(n) for n in adj[v] if n in active)
        }
        for v in sel:
            out[v] = r
        removed = set(sel)
        for v in sel:
            removed |= adj[v] & active
        active -= removed
        adj = {v: ns & active for v, ns in adj.items() if v in active}
    return out


def _check_properties(members, vertices, edges):
    ms = set(members)
    adj = {v: set() for v in vertices}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    for u, v in edges:
        assert not (u in ms and v in ms and u != v), f"adjacent members {u},{v}"
    for v in vertices:
        if v not in ms:
            assert adj[v] & ms, f"non-member {v} has no member neighbor"


EDGE_SETS = [
    # path, star, two cliques + bridge, ring
    [(1, 2), (2, 3), (3, 4), (4, 5)],
    [(0, i) for i in range(1, 8)],
    [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
    [(i, (i + 1) % 10) for i in range(10)],
]


@pytest.mark.parametrize("edges", EDGE_SETS)
def test_luby_matches_mirror_and_is_valid(spark, edges):
    g = graph_from_pairs(spark, [(f"v{u:03d}", f"v{v:03d}") for u, v in edges])
    got = {r["vid"]: r["rnd"] for r in mis_op.luby_mis(g).collect()}
    vids = {r["vid"] for r in g.vertices.select("vid").collect()}
    edge_vids = [
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    ]
    assert got == _py_luby(vids, edge_vids)
    _check_properties(got, vids, edge_vids)


def test_luby_random_graph_fixpoint(spark):
    import random

    rng = random.Random(11)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    g = graph_from_pairs(spark, [(f"v{u:03d}", f"v{v:03d}") for u, v in edges])
    got = {r["vid"]: r["rnd"] for r in mis_op.luby_mis(g, truncate_every=2).collect()}
    vids = {r["vid"] for r in g.vertices.select("vid").collect()}
    edge_vids = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    assert got == _py_luby(vids, edge_vids)
    _check_properties(got, vids, edge_vids)


def test_luby_bounded_rounds_prefix_of_fixpoint(spark):
    edges = [(i, (i + 1) % 12) for i in range(12)]
    g = graph_from_pairs(spark, [(f"v{u:03d}", f"v{v:03d}") for u, v in edges])
    full = {r["vid"]: r["rnd"] for r in mis_op.luby_mis(g).collect()}
    one = {r["vid"]: r["rnd"] for r in mis_op.luby_mis(g, rounds=1).collect()}
    assert one == {v: r for v, r in full.items() if r <= 1}
    many = {r["vid"]: r["rnd"] for r in mis_op.luby_mis(g, rounds=50).collect()}
    assert many == full  # idempotent past the fixpoint
