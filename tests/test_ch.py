"""CH query execution (operators/ch.py) — validated the same way the
reference validates its CHDijkstra (tests/small/routing/fastest.rs): CH
answers on the contracted map must equal plain Dijkstra on the contracted
map AND on the original uncontracted map, for every pair."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import ch
from osmgraphing_spark.sources import fmi

REF = "/root/reference/resources"

CH_NODES = [
    ("vid", "long"),
    ("ignored_osm", "string"),
    ("lat", "double"),
    ("lon", "double"),
    ("ignored_h", "string"),
    ("level", "long"),
]
CH_EDGES = [
    ("src", "long"),
    ("dst", "long"),
    ("meters", "double"),
    ("seconds", "double"),
    ("sc0", "long"),
    ("sc1", "long"),
]
PLAIN_NODES = [("vid", "long"), ("lat", "double"), ("lon", "double")]
PLAIN_EDGES = [
    ("src", "long"),
    ("dst", "long"),
    ("meters", "double"),
    ("kmph", "double"),
]


def _python_dijkstra_all_pairs(edges):
    """Floyd-Warshall oracle over a [(s, t, w)] list."""
    INF = float("inf")
    vids = sorted({v for e in edges for v in e[:2]})
    d = {(a, b): (0.0 if a == b else INF) for a in vids for b in vids}
    for s, t, w in edges:
        d[(s, t)] = min(d[(s, t)], w)
    for k in vids:
        for i in vids:
            for j in vids:
                if d[(i, k)] + d[(k, j)] < d[(i, j)]:
                    d[(i, j)] = d[(i, k)] + d[(k, j)]
    return vids, d


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_ch_matches_plain_dijkstra_on_reference_fixture(spark):
    """Every (s, t) pair on small/graph.ch.fmi: the CH bidirectional
    upward answer equals the Floyd-Warshall truth of the contracted map
    (shortcuts carry real costs) AND of the original small/graph.fmi in
    the duration metric (seconds = meters * 0.12 at 30 km/h) — the
    reference's own chdijkstra_on_chmap / dijkstra_on_map cross-check."""
    t = fmi.read_fmi(spark, f"{REF}/small/graph.ch.fmi", CH_NODES, CH_EDGES)
    levels = t.nodes.select("vid", "level")
    edges = t.edges.select("src", "dst", F.col("seconds").alias("w"))

    ch_edge_list = [
        (r["src"], r["dst"], r["w"]) for r in edges.collect()
    ]
    vids, truth = _python_dijkstra_all_pairs(ch_edge_list)

    # original (uncontracted) map in the same duration metric
    p = fmi.read_fmi(spark, f"{REF}/small/graph.fmi", PLAIN_NODES, PLAIN_EDGES)
    orig_list = [
        (r["src"], r["dst"], r["meters"] * 3.6 / r["kmph"])
        for r in p.edges.collect()
    ]
    _, truth_orig = _python_dijkstra_all_pairs(orig_list)
    for k, v in truth.items():
        assert truth_orig[k] == pytest.approx(v), (
            f"fixture self-consistency: contracted vs original disagree at {k}"
        )

    pairs = spark.createDataFrame(
        [(a, b) for a in vids for b in vids if a != b], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): r["cost"]
        for r in ch.ch_route_costs(edges, levels, pairs).collect()
    }
    INF = float("inf")
    for a in vids:
        for b in vids:
            if a == b:
                continue
            if truth[(a, b)] == INF:
                assert (a, b) not in got
            else:
                assert got[(a, b)] == pytest.approx(truth[(a, b)]), (a, b)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_upward_filter_prunes_and_shortcuts_carry(spark):
    """The forward upward graph of the fixture drops every edge into a
    strictly lower level and keeps both shortcuts (they end at b/f which
    sit above or equal their tails)."""
    t = fmi.read_fmi(spark, f"{REF}/small/graph.ch.fmi", CH_NODES, CH_EDGES)
    levels = t.nodes.select("vid", "level")
    edges = t.edges.select("src", "dst", F.col("seconds").alias("w"))
    up = ch.upward_edges(edges, levels)
    lv = {r["vid"]: r["level"] for r in levels.collect()}
    for r in up.collect():
        assert lv[r["dst"]] >= lv[r["src"]]
    # the two shortcut edges 4->1 and 7->1 (levels 2->3, 4->3): the first
    # is upward and must survive; total upward count < total count
    assert up.where((F.col("src") == 4) & (F.col("dst") == 1)).count() == 1
    assert up.count() < edges.count()


def test_ch_distances_small_synthetic(spark):
    """ch_distances agrees with the python oracle on a hand-built
    3-level chain with one shortcut (a->b->c contracted to a->c)."""
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 2.0)], "src long, dst long, w double"
    )
    levels = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2)], "vid long, level long"
    )
    got = {
        (r["source"], r["vid"]): r["dist"]
        for r in ch.ch_distances(edges, levels, [1]).collect()
    }
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(1, 3)] == pytest.approx(2.0)
    assert got[(1, 1)] == pytest.approx(0.0)


@pytest.mark.parametrize("local_cap", [None, 0])
def test_contract_graph_random_matches_floyd_warshall(spark, local_cap):
    """Full-stack pin on BOTH construction paths (single-task witnessed
    sequential AND the BSP independent-set rounds, local_cap=0): build
    the hierarchy on a random 30-vertex digraph, answer 8×29 point
    queries with ch_route_costs, compare every answer (and every absence,
    for unreachable pairs) against Floyd-Warshall truth on the ORIGINAL
    graph."""
    import random

    rng = random.Random(42)
    n, m = 30, 90
    raw = [
        (rng.randrange(n), rng.randrange(n), round(rng.uniform(1, 10), 3))
        for _ in range(m)
    ]
    raw = [(s, t, w) for s, t, w in raw if s != t]
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    ch_e, lv = ch.contract_graph(e, local_cap=local_cap)

    vids, truth = _python_dijkstra_all_pairs(raw)
    INF = float("inf")
    pairs = spark.createDataFrame(
        [(a, b) for a in vids[:8] for b in vids if a != b],
        "src long, dst long",
    )
    got = {
        (r["src"], r["dst"]): r["cost"]
        for r in ch.ch_route_costs(ch_e, lv, pairs, local_cap=local_cap).collect()
    }
    for a in vids[:8]:
        for b in vids:
            if a == b:
                continue
            if truth[(a, b)] == INF:
                assert (a, b) not in got, f"spurious path {a}->{b}"
            else:
                assert got[(a, b)] == pytest.approx(truth[(a, b)]), (a, b)


@pytest.mark.parametrize("local_cap", [None, 0])
def test_contract_graph_structure(spark, local_cap):
    """Levels are a strict hierarchy: every vertex gets exactly one
    level, same-level vertices are never adjacent in the ORIGINAL graph
    (BSP: the independence invariant that makes simultaneous contraction
    equal sequential contraction; local: dependency-depth levels are
    strictly ordered along every CH edge), and shortcut costs are sums of
    real paths (>= the true distance, never below)."""
    import random

    rng = random.Random(7)
    raw = [
        (rng.randrange(20), rng.randrange(20), float(rng.randint(1, 9)))
        for _ in range(50)
    ]
    raw = [(s, t, w) for s, t, w in raw if s != t]
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    ch_e, lv = ch.contract_graph(e, local_cap=local_cap)
    levels = {r["vid"]: r["level"] for r in lv.collect()}
    vids = {v for ed in raw for v in ed[:2]}
    assert set(levels) == vids  # every vertex leveled exactly once
    # same-level adjacency check — only for levels assigned IN a round
    # (the shared top level of outliving vertices is exempt by design)
    top = max(levels.values())
    for s, t, _ in raw:
        if levels[s] == levels[t] and levels[s] != top:
            pytest.fail(f"adjacent same-level pair {s},{t}")
    _, truth = _python_dijkstra_all_pairs(raw)
    for r in ch_e.collect():
        assert r["w"] >= truth[(r["src"], r["dst"])] - 1e-9


@pytest.mark.parametrize("local_cap", [None, 0])
def test_ch_shortest_paths_full_routes(spark, local_cap):
    """ch_shortest_paths returns REAL routes: on a random digraph, every
    returned pair's cost equals Floyd-Warshall truth, the node sequence
    starts/ends correctly, every hop is an ORIGINAL edge (all shortcuts
    expanded via provenance), and the hop-weight sum equals the cost."""
    import random

    rng = random.Random(42)
    n, m = 25, 70
    raw = [
        (rng.randrange(n), rng.randrange(n), float(rng.randint(1, 9)))
        for _ in range(m)
    ]
    raw = [(s, t, w) for s, t, w in raw if s != t]
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    ch_e, lv = ch.contract_graph(e, local_cap=local_cap)

    vids, truth = _python_dijkstra_all_pairs(raw)
    INF = float("inf")
    ew = {}
    for s, t, w in raw:
        ew[(s, t)] = min(ew.get((s, t), INF), w)

    pairs = spark.createDataFrame(
        [(a, b) for a in vids[:5] for b in vids if a != b],
        "src long, dst long",
    )
    got = {
        (r["src"], r["dst"]): (r["cost"], list(r["nodes"]))
        for r in ch.ch_shortest_paths(ch_e, lv, pairs, local_cap=local_cap).collect()
    }
    for a in vids[:5]:
        for b in vids:
            if a == b:
                continue
            if truth[(a, b)] == INF:
                assert (a, b) not in got
                continue
            cost, nodes = got[(a, b)]
            assert cost == pytest.approx(truth[(a, b)]), (a, b)
            assert nodes[0] == a and nodes[-1] == b
            assert sum(ew[(x, y)] for x, y in zip(nodes, nodes[1:])) == (
                pytest.approx(cost)
            ), (a, b, nodes)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_contract_to_ch_fmi_roundtrip(spark, tmp_path):
    """The reference's fmi→CH workflow without its external constructor:
    contract small/graph.fmi in-engine, write a graph.ch.fmi (3-count
    header, node levels, shortcut component indices), read it BACK with
    sources.fmi and answer all pairs — every cost equals Floyd-Warshall
    truth on the original map, and every shortcut row's sc0/sc1 indices
    point at a valid component chain whose costs sum to the shortcut's."""
    from osmgraphing_spark.sources import writers

    out = str(tmp_path / "small.ch.fmi")
    writers.contract_to_ch_fmi(
        spark, f"{REF}/small/graph.fmi", out,
        [("vid", "long"), ("lat", "double"), ("lon", "double")],
        [("src", "long"), ("dst", "long"),
         ("meters", "double"), ("kmph", "double")],
        "src", "dst", "meters", metric_cols=["meters"],
    )
    t = fmi.read_fmi(
        spark, out,
        [("node_idx", "long"), ("node_id", "long"), ("lat", "double"),
         ("lon", "double"), ("h", "long"), ("level", "long")],
        [("src", "long"), ("dst", "long"), ("meters", "double"),
         ("sc0", "long"), ("sc1", "long")],
    )
    assert (t.metric_count, t.node_count) == (1, 8)
    lv = t.nodes.select(F.col("node_id").alias("vid"), "level")
    edges = t.edges.select("src", "dst", F.col("meters").alias("w"))

    p = fmi.read_fmi(
        spark, f"{REF}/small/graph.fmi",
        [("vid", "long"), ("lat", "double"), ("lon", "double")],
        [("src", "long"), ("dst", "long"),
         ("meters", "double"), ("kmph", "double")],
    )
    raw = [(r["src"], r["dst"], r["meters"]) for r in p.edges.collect()]
    vids, truth = _python_dijkstra_all_pairs(raw)
    INF = float("inf")

    pairs = spark.createDataFrame(
        [(a, b) for a in vids for b in vids if a != b], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): r["cost"]
        for r in ch.ch_route_costs(edges, lv, pairs).collect()
    }
    for a in vids:
        for b in vids:
            if a == b:
                continue
            if truth[(a, b)] == INF:
                assert (a, b) not in got
            else:
                assert got[(a, b)] == pytest.approx(truth[(a, b)]), (a, b)

    # sc-index integrity: file order == eid order by construction. The
    # witnessed contraction may legitimately need ZERO shortcuts on the
    # dense 8-node fixture (every wedge has a bypass), so the non-empty
    # case is pinned below on a chain graph where no witness can exist.
    def sc_chain_check(rows):
        n_sc = 0
        for s, d, w, a, b in rows:
            if a >= 0:
                n_sc += 1
                ea, eb = rows[a], rows[b]
                assert ea[0] == s and ea[1] == eb[0] and eb[1] == d
                assert ea[2] + eb[2] == pytest.approx(w)
        return n_sc

    rows = [
        (r["src"], r["dst"], r["meters"], r["sc0"], r["sc1"])
        for r in t.edges.collect()
    ]
    rows.sort()  # eid was assigned by (src, dst) order
    sc_chain_check(rows)

    # a directed 6-ring: a chain peels endpoint-first with NO shortcuts
    # (topological order keeps every path upward), but contracting any
    # ring vertex must insert one — the only witness is the long way
    # around, which always costs more — so sc indices must appear and
    # resolve
    chain = tmp_path / "chain.fmi"
    n = 6
    lines = ["# node-count", str(n), "", "# edge-count", str(n), ""]
    lines += [f"{i} 0 0" for i in range(n)]
    lines += [f"{i} {(i+1) % n} {float(i+1)} 30" for i in range(n)]
    chain.write_text("\n".join(lines) + "\n")
    out2 = str(tmp_path / "chain.ch.fmi")
    writers.contract_to_ch_fmi(
        spark, str(chain), out2,
        [("vid", "long"), ("lat", "double"), ("lon", "double")],
        [("src", "long"), ("dst", "long"),
         ("meters", "double"), ("kmph", "double")],
        "src", "dst", "meters", metric_cols=["meters"],
    )
    t2 = fmi.read_fmi(
        spark, out2,
        [("node_idx", "long"), ("node_id", "long"), ("lat", "double"),
         ("lon", "double"), ("h", "long"), ("level", "long")],
        [("src", "long"), ("dst", "long"), ("meters", "double"),
         ("sc0", "long"), ("sc1", "long")],
    )
    rows2 = [
        (r["src"], r["dst"], r["meters"], r["sc0"], r["sc1"])
        for r in t2.edges.collect()
    ]
    rows2.sort()
    assert sc_chain_check(rows2) > 0


def test_ch_distances_cap_refuses_large_graphs(spark):
    """One-to-all mode must refuse to detonate: past max_vertices it
    raises with guidance toward ch_route_costs (the same safe-default
    discipline as the exact-centrality source cap)."""
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(10)], "src long, dst long, w double"
    )
    levels = spark.createDataFrame(
        [(i, i) for i in range(11)], "vid long, level long"
    )
    with pytest.raises(ValueError, match="ch_route_costs"):
        ch.ch_distances(edges, levels, [0], max_vertices=3)


def test_contract_graph_wedge_degree_cap(spark):
    """A star hub that is the priority minimum (all leaves have higher
    salted-hash priority at equal degree... forced here by making the
    hub's neighbors heavier) is DEFERRED under max_wedge_degree, the
    contraction still completes via the fallback, and queries stay
    exact."""
    import random

    rng = random.Random(3)
    # hub 0 with 12 spokes + a ring among spokes making spoke degrees high
    raw = []
    for i in range(1, 13):
        raw.append((0, i, 1.0))
        raw.append((i, 0, 1.0))
        raw.append((i, i % 12 + 1, 2.0))
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    # the wedge guard is a BSP-rounds mechanism: force that path
    ch_e, lv = ch.contract_graph(e, max_wedge_degree=6, local_cap=0)
    vids, truth = _python_dijkstra_all_pairs(raw)
    pairs = spark.createDataFrame(
        [(a, b) for a in vids[:4] for b in vids if a != b],
        "src long, dst long",
    )
    got = {
        (r["src"], r["dst"]): r["cost"]
        for r in ch.ch_route_costs(ch_e, lv, pairs).collect()
    }
    INF = float("inf")
    for a in vids[:4]:
        for b in vids:
            if a == b or truth[(a, b)] == INF:
                continue
            assert got[(a, b)] == pytest.approx(truth[(a, b)]), (a, b)


def test_local_contraction_fewer_shortcuts_and_deterministic(spark):
    """The single-task path's witness search must never produce MORE CH
    edges than the witness-free BSP rounds on the same graph, and two
    runs must be byte-identical (lazy heap + sorted iteration order)."""
    import random

    rng = random.Random(9)
    raw = [
        (rng.randrange(40), rng.randrange(40), float(rng.randint(1, 9)))
        for _ in range(120)
    ]
    raw = [(s, t, w) for s, t, w in raw if s != t]
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    loc_e, loc_lv = ch.contract_graph(e)
    bsp_e, _ = ch.contract_graph(e, local_cap=0)
    assert loc_e.count() <= bsp_e.count()
    again_e, again_lv = ch.contract_graph(e)
    assert sorted(map(tuple, loc_e.collect())) == sorted(
        map(tuple, again_e.collect())
    )
    assert sorted(map(tuple, loc_lv.collect())) == sorted(
        map(tuple, again_lv.collect())
    )
