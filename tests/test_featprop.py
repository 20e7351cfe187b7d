"""Feature propagation vs a pure-Python integer mirror."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from osmgraphing_spark.operators import featprop


def _prop_py(edges, feats, rounds, include_self=True):
    state = {k: list(v) for k, v in feats.items()}
    for _ in range(rounds):
        inbox = defaultdict(list)
        for s, d in edges:
            if s in state:
                inbox[d].append(state[s])
        if include_self:
            for v, f in state.items():
                inbox[v].append(f)
        nxt = {}
        for v, vecs in inbox.items():
            n = len(vecs)
            nxt[v] = [
                (2 * sum(vec[i] for vec in vecs) + n) // (2 * n)
                for i in range(len(vecs[0]))
            ]
        state = nxt
    return state


@pytest.fixture(scope="module")
def graph(spark):
    rng = random.Random(37)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(30)})
    edges = [e for e in edges if e[0] != e[1]]
    feats = {v: [rng.randrange(-50, 50) for _ in range(4)] for v in range(12)}
    edf = spark.createDataFrame(edges, "src long, dst long")
    fdf = spark.createDataFrame(
        [(v, f) for v, f in feats.items()], "vid long, f array<long>"
    )
    return edges, feats, edf, fdf


@pytest.mark.parametrize("rounds", [0, 1, 3])
def test_propagation_matches_mirror(spark, graph, rounds):
    edges, feats, edf, fdf = graph
    got = {
        r["vid"]: list(r["f"])
        for r in featprop.propagate_features(edf, fdf, rounds=rounds).collect()
    }
    assert got == _prop_py(edges, feats, rounds)


def test_no_self_drops_isolated(spark, graph):
    edges, feats, edf, fdf = graph
    got = {
        r["vid"]: list(r["f"])
        for r in featprop.propagate_features(
            edf, fdf, rounds=2, include_self=False
        ).collect()
    }
    assert got == _prop_py(edges, feats, 2, include_self=False)
    # vertices with no in-edges vanish without self-inclusion
    with_in = {d for _, d in edges}
    assert set(got) <= with_in


def test_two_vertex_exact_mean(spark):
    edf = spark.createDataFrame([(1, 2)], "src long, dst long")
    fdf = spark.createDataFrame(
        [(1, [10, -3]), (2, [0, 0])], "vid long, f array<long>"
    )
    got = {
        r["vid"]: list(r["f"])
        for r in featprop.propagate_features(edf, fdf, rounds=1).collect()
    }
    # v2 averages {v1:[10,-3], self:[0,0]} -> [5, -1] (round half up: -1.5 -> -1)
    assert got[2] == [5, -1]
    assert got[1] == [10, -3]
