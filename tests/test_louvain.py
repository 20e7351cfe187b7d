"""Distributed Louvain (operators/louvain) vs an exact python mirror.

The operator is deterministic by construction (parity schedule, strict
gain threshold, (gain desc, label asc) tie-break); with unit edge weights
every aggregate is integer-exact in doubles, so the python mirror below
replays the algorithm move-for-move and the Spark labels must match
EXACTLY — the same pinning style as the walks/sampling oracles."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from osmgraphing_spark.operators import graphstats, louvain


# -- python mirror -----------------------------------------------------------

def _mirror_canonical(edges):
    w = defaultdict(float)
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            w[(a, b)] += 1.0
    return dict(w)


def _mirror_move_rounds(e, selfw, max_rounds):
    adj = defaultdict(dict)
    for (a, b), w in e.items():
        adj[a][b] = adj[a].get(b, 0.0) + w
        adj[b][a] = adj[b].get(a, 0.0) + w
    verts = set(adj) | set(selfw)
    k = {
        v: sum(adj[v].values()) + 2.0 * selfw.get(v, 0.0)
        for v in verts
    }
    two_m = sum(k.values())
    labels = {v: v for v in verts}
    if not two_m:
        return labels, 0
    rounds_used, stale = 0, 0
    for rnd in range(max_rounds):
        tot = defaultdict(float)
        for v in verts:
            tot[labels[v]] += k[v]
        moves = {}
        for v in verts:
            w_ic = defaultdict(float)
            for n, w in adj[v].items():
                w_ic[labels[n]] += w
            w_ia = w_ic.get(labels[v], 0.0)
            best = None
            for cand, wc in w_ic.items():
                if cand == labels[v]:
                    continue
                gain = (wc - w_ia) / (two_m / 2.0) - k[v] * (
                    tot[cand] - tot[labels[v]] + k[v]
                ) / (two_m * two_m / 2.0)
                if gain > 1e-12 and (
                    best is None or gain > best[0] or (gain == best[0] and cand < best[1])
                ):
                    best = (gain, cand)
            if best is not None and (v + rnd) % 2 == 0:
                moves[v] = best[1]
        for v, c in moves.items():
            labels[v] = c
        rounds_used = rnd + 1
        if not moves:
            stale += 1
            if stale >= 2:
                break
        else:
            stale = 0
    return labels, rounds_used


def _mirror_louvain(edges, max_rounds=20, max_levels=5):
    e = _mirror_canonical(edges)
    selfw = {}
    assignments = None
    for _ in range(max_levels):
        n_before = len({v for ab in e for v in ab} | set(selfw))
        labels, used = _mirror_move_rounds(e, selfw, max_rounds)
        if assignments is None:
            assignments = dict(labels)
        else:
            assignments = {v: labels[c] for v, c in assignments.items()}
        ce = defaultdict(float)
        new_self = defaultdict(float)
        for (a, b), w in e.items():
            ca, cb = labels[a], labels[b]
            if ca == cb:
                new_self[ca] += w
            else:
                ce[(min(ca, cb), max(ca, cb))] += w
        for v, w in selfw.items():
            new_self[labels[v]] += w
        e, selfw = dict(ce), dict(new_self)
        n_after = len(set(labels.values()))
        if n_after >= n_before or used == 0:
            break
    return assignments


# -- fixtures ----------------------------------------------------------------

def _two_cliques(n=5, seed=None):
    edges = []
    for base in (0, 100):
        for i in range(n):
            for j in range(i + 1, n):
                edges.append((base + i, base + j))
    edges.append((0, 100))  # bridge
    return edges


def _random_graph(seed, n, m):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    return sorted(edges)


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


# -- tests -------------------------------------------------------------------

def test_two_cliques_golden(spark):
    res = louvain.louvain(_df(spark, _two_cliques()))
    got = {r["vid"]: r["label"] for r in res.assignments.collect()}
    comm = defaultdict(set)
    for v, c in got.items():
        comm[c].add(v)
    assert sorted(map(sorted, comm.values())) == [
        [0, 1, 2, 3, 4],
        [100, 101, 102, 103, 104],
    ]
    assert got == _mirror_louvain(_two_cliques())


@pytest.mark.parametrize("seed,n,m", [(5, 30, 60), (7, 25, 140)])
def test_matches_python_mirror_on_random_graphs(spark, seed, n, m):
    """Exact move-for-move replay; rounds/levels bounded identically on
    both sides to keep suite wall-time sane (each Spark round is a fixed
    scheduler cost on these tiny fixtures)."""
    edges = _random_graph(seed, n, m)
    res = louvain.louvain(_df(spark, edges), max_rounds=8, max_levels=2)
    got = {r["vid"]: r["label"] for r in res.assignments.collect()}
    assert got == _mirror_louvain(edges, max_rounds=8, max_levels=2)


def test_ring_of_cliques_beats_lpa_and_scores_high(spark):
    """4 cliques of 6 in a ring: Louvain must recover the planted partition
    and its modularity must be at least LPA's."""
    edges = []
    for c in range(4):
        base = 10 * c
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
        edges.append((base, 10 * ((c + 1) % 4) + 1))  # ring bridges
    df = _df(spark, edges)

    res = louvain.louvain(df)
    comm = defaultdict(set)
    for r in res.assignments.collect():
        comm[r["label"]].add(r["vid"])
    assert sorted(map(sorted, comm.values())) == [
        sorted(range(10 * c, 10 * c + 6)) for c in range(4)
    ]

    q_louvain = sum(
        r["q"] for r in graphstats.modularity(df, res.assignments).collect()
    )
    from tests.helpers import graph_from_pairs
    from osmgraphing_spark.operators import lpa

    g = graph_from_pairs(
        spark, [(f"v{a}", f"v{b}") for a, b in edges] + [(f"v{b}", f"v{a}") for a, b in edges]
    )
    lpa_labels = lpa.run(g, max_iter=10)
    vmap = {r["vid"]: int(r["key"][1:]) for r in g.vertices.collect()}
    lpa_df = spark.createDataFrame(
        [(vmap[r["vid"]], r["label"]) for r in lpa_labels.collect()],
        "vid long, label long",
    )
    q_lpa = sum(r["q"] for r in graphstats.modularity(df, lpa_df).collect())
    assert q_louvain >= q_lpa - 1e-9
    assert q_louvain > 0.5


def test_partition_invariance(spark):
    edges = _random_graph(9, 40, 90)
    a = louvain.louvain(_df(spark, edges).repartition(7), max_rounds=6, max_levels=2)
    b = louvain.louvain(_df(spark, edges).repartition(2), max_rounds=6, max_levels=2)
    assert sorted(map(tuple, a.assignments.collect())) == sorted(
        map(tuple, b.assignments.collect())
    )
