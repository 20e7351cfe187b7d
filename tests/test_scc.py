"""SCC vs a pure-python iterative Tarjan oracle (independent
implementation, same role as tests/oracle.py's union-find for CC)."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import scc


def _tarjan(vertices, edges):
    """→ {v: min vid of its SCC} — iterative Tarjan."""
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    for root in sorted(vertices):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj[v]
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def _check(spark, edges, extra_vertices=()):
    vertices = sorted({v for e in edges for v in e} | set(extra_vertices))
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    if not edges:
        df = df.limit(0)
    # default path (single-task local Tarjan below the caps) AND the
    # forced BSP loop (local_cap=0) must both match the python oracle
    got = {r["id"]: r["scc"] for r in scc.run_edges(df).collect()}
    got_bsp = {r["id"]: r["scc"] for r in scc.run_edges(df, local_cap=0).collect()}
    want = _tarjan(vertices, [(a, b) for a, b in edges if a != b])
    # run_edges only knows vertices present in edges
    want = {v: c for v, c in want.items() if any(v in e for e in edges)}
    assert got == want
    assert got_bsp == want


def test_scc_two_cycles_and_bridge(spark):
    # cycle {1,2,3} → bridge 4 → cycle {5,6}
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)]
    _check(spark, edges)


def test_scc_dag_all_singletons(spark):
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    _check(spark, edges)


def test_scc_giant_cycle(spark):
    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    _check(spark, edges)


def test_scc_self_loops_and_parallel(spark):
    edges = [(1, 1), (1, 2), (1, 2), (2, 1), (3, 3), (2, 3)]
    _check(spark, edges)


def test_scc_random_digraphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 20 + 5 * trial
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(int(n * 2.2))
            }
        )
        _check(spark, edges)


def test_scc_condensation_is_dag(spark):
    # two cycles + bridge: condensation must be {1}→{4}→{5} (scc ids 1, 4, 5)
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = scc.run_edges(df)
    cond = {
        (r["scc_src"], r["scc_dst"])
        for r in scc.condensation(df, labels).collect()
    }
    assert cond == {(1, 4), (4, 5)}


def test_scc_planted_cycles_star(spark):
    """5 planted 12-cycles with hub→leaf cross edges (condensation depth 1,
    so outer rounds stay bounded; ring size bounds the coloring fixpoint);
    ids shuffled so min-label order does not correlate with construction
    order."""
    rng = random.Random(3)
    ids = list(range(60))
    rng.shuffle(ids)
    groups = [ids[i * 12 : (i + 1) * 12] for i in range(5)]
    edges = []
    for g in groups:
        edges += [(g[i], g[(i + 1) % 12]) for i in range(12)]
    for leaf in groups[1:]:
        edges.append((groups[0][0], leaf[0]))
    _check(spark, edges)


def test_scc_graph_entry_point(spark):
    """scc.run over a built Graph (the engine path, not run_edges): labels
    in vid space must match Tarjan on the graph's own edge list."""
    from tests.helpers import graph_from_pairs

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"),      # cycle
        ("c", "d"), ("d", "e"),                   # tail
        ("e", "f"), ("f", "e"),                   # 2-cycle
    ]
    g = graph_from_pairs(spark, pairs)
    edges = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    got = {r["vid"]: r["scc"] for r in scc.run(g).collect()}
    want = _tarjan(sorted({v for e in edges for v in e}), edges)
    assert got == want


# ---------------------------------------------------------------------------
# toposort_layers
# ---------------------------------------------------------------------------

def _layers_oracle(vids, edges):
    """Longest path from any root, by relaxation to fixpoint."""
    layer = {v: 0 for v in vids}
    changed = True
    while changed:
        changed = False
        for s, t in edges:
            if layer[s] + 1 > layer[t]:
                layer[t] = layer[s] + 1
                changed = True
    return layer


def test_toposort_layers_diamond_dag(spark):
    """Diamond + tail: layer = longest path, NOT shortest (d sits at 2 via
    the two-hop arm even though a→d... no direct edge; e at 3)."""
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["layer"] for r in scc.toposort_layers(df).collect()}
    vids = sorted({v for e in edges for v in e})
    assert got == _layers_oracle(vids, edges)
    assert got[4] == 3  # longest chain 0→1→3→4 wins over the direct 0→4


@pytest.mark.parametrize("local_cap", [None, 0])
def test_toposort_layers_deep_chain_crosses_stride(spark, local_cap):
    """A 11-deep chain forces rounds past the truncation stride (BSP
    path), and the single-task local path must layer it identically."""
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["layer"]
        for r in scc.toposort_layers(df, local_cap=local_cap).collect()
    }
    assert got == {i: i for i in range(12)}


@pytest.mark.parametrize("local_cap", [None, 0])
def test_toposort_layers_raises_on_cycle(spark, local_cap):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="cycle"):
        scc.toposort_layers(df, max_iter=10, local_cap=local_cap)


def test_toposort_layers_vertices_universe(spark):
    """Isolated vertices (no condensation edges) appear at layer 0 when the
    universe frame pins them."""
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    got = {r["id"]: r["layer"] for r in scc.toposort_layers(df, vertices=verts).collect()}
    assert got == {1: 0, 2: 1, 99: 0}


def test_condensation_then_layers_end_to_end(spark):
    """Two cycles in a chain condense to a 3-node path: layers 0,1,2."""
    edges = [
        (0, 1), (1, 0),          # scc {0,1}
        (1, 2),
        (2, 3), (3, 2),          # scc {2,3}
        (3, 4),                   # singleton 4
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = scc.run_edges(df)
    cond = scc.condensation(df, labels)
    layers = scc.toposort_layers(
        cond.select(F.col("scc_src").alias("src"), F.col("scc_dst").alias("dst")),
        vertices=labels.select(F.col("scc").alias("id")).distinct(),
    )
    got = {r["id"]: r["layer"] for r in layers.collect()}
    assert got == {0: 0, 2: 1, 4: 2}
