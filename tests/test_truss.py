"""k-truss (operators/truss) vs an exact python peel mirror — goldens
(clique + pendant path, two cliques sharing an edge), random-graph exact
match at fixpoint, bounded-rounds replay, and closeness centrality
(operators/sssp.closeness_centrality) vs a BFS oracle."""

from __future__ import annotations

import random
from collections import defaultdict, deque
from itertools import combinations

from osmgraphing_spark.operators import sssp as sssp_op
from osmgraphing_spark.operators import truss as truss_op
from osmgraphing_spark.operators.build import build_graph


def _python_truss(edges, k, rounds=None):
    """Exact mirror of truss_edges: peel canonical edges with support <
    k-2, report survivors with support inside the surviving subgraph."""
    live = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def support(es):
        adj = defaultdict(set)
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in es
        }

    r = 0
    prev = len(live)
    while rounds is None or r < rounds:
        sup = support(live)
        live = {e for e in live if sup[e] >= k - 2}
        r += 1
        if len(live) == prev:
            break
        prev = len(live)
    return support(live)


def _run(spark, edges, k, rounds=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = truss_op.truss_edges(df, k, rounds=rounds).collect()
    return {(r["a"], r["b"]): r["support"] for r in got}


def test_clique_with_pendant_path(spark):
    # 4-clique (every edge support 2) + pendant path: the 4-truss keeps
    # exactly the clique; the path edges (support 0) peel in round 1
    clique = list(combinations(range(4), 2))
    path = [(3, 4), (4, 5)]
    got = _run(spark, clique + path, k=4)
    assert got == {e: 2 for e in clique}


def test_two_cliques_sharing_an_edge(spark):
    # two 4-cliques glued on edge (0,1): the shared edge's support is 4 in
    # the full graph; the 4-truss keeps BOTH cliques (every clique edge
    # still has support >= 2), and the shared edge reports support 4
    c1 = list(combinations([0, 1, 2, 3], 2))
    c2 = list(combinations([0, 1, 4, 5], 2))
    got = _run(spark, c1 + c2, k=4)
    want = _python_truss(c1 + c2, k=4)
    assert got == want
    assert got[(0, 1)] == 4
    # k=5 demands support >= 3: only the shared edge has it in round 1,
    # and alone it closes no triangle -> empty 5-truss
    assert _run(spark, c1 + c2, k=5) == {}


def test_random_graph_fixpoint_and_bounded(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(18), rng.randrange(18)) for _ in range(90)})
    for k in (3, 4):
        assert _run(spark, edges, k) == _python_truss(edges, k)
    # bounded budget replays the python mirror round for round
    assert _run(spark, edges, 4, rounds=1) == _python_truss(edges, 4, rounds=1)
    # direction duplicates / self-loops collapse into the canonical view
    noisy = edges + [(b, a) for a, b in edges[:20]] + [(1, 1), (2, 2)]
    assert _run(spark, noisy, 3) == _python_truss(edges, 3)


def _closeness_oracle(edges, verts):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    # inbound: BFS forward from every source, accumulate onto targets
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for s in verts:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, d in dist.items():
            if v != s:
                tot[v] += d
                cnt[v] += 1
    return {
        v: (cnt[v], round(cnt[v] / tot[v], 6)) for v in verts if cnt[v] > 0
    }


def test_closeness_vs_bfs_oracle(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(14), rng.randrange(14)) for _ in range(40)})
    edges = [(a, b, 1.0) for a, b in edges if a != b]
    raw = spark.createDataFrame(
        [(f"v{a:03d}", f"v{b:03d}", w) for a, b, w in edges],
        "src_key string, dst_key string, weight double",
    )
    g = build_graph(raw, num_blocks=2)
    key_of = {r["vid"]: int(r["key"][1:]) for r in g.vertices.collect()}
    got = {
        key_of[r["vid"]]: (r["n_reach"], r["closeness"])
        for r in sssp_op.closeness_centrality(g).collect()
    }
    verts = sorted(key_of.values())
    want = _closeness_oracle([(a, b) for a, b, _ in edges], verts)
    # oracle keys are raw ids; restrict to vertices the graph knows
    assert got == {v: want[v] for v in want if v in set(key_of.values())}
