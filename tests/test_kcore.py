"""k-core peeling: fixpoint + bounded-round semantics vs a pure-Python
oracle (same role as tests/oracle.py's union-find for CC — an independent
implementation the engine must agree with exactly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import kcore
from osmgraphing_spark.operators.build import build_graph


def _peel_oracle(edges: list[tuple[int, int]], k: int, rounds: int | None):
    """Reference peel: (survivor set, degree-in-survivor-subgraph map)."""
    und = {(a, b) for a, b in edges if a != b} | {
        (b, a) for a, b in edges if a != b
    }
    surv = {v for e in und for v in e}
    r = 0
    while rounds is None or r < rounds:
        deg: dict[int, int] = {}
        for a, b in und:
            if a in surv and b in surv:
                deg[a] = deg.get(a, 0) + 1
        new_surv = {v for v, d in deg.items() if d >= k}
        if new_surv == surv:
            break
        surv = new_surv
        r += 1
    deg = {v: 0 for v in surv}
    for a, b in und:
        if a in surv and b in surv:
            deg[a] += 1
    return surv, deg


def _graph_from(spark, edges: list[tuple[int, int]]):
    raw = spark.createDataFrame(
        [(f"v{a:04d}", f"v{b:04d}", 1.0) for a, b in edges],
        "src_key string, dst_key string, weight double",
    )
    g = build_graph(raw, num_blocks=2)
    vmap = {
        int(r["key"][1:]): r["vid"] for r in g.vertices.collect()
    }
    return g, vmap


def _run_peel(spark, edges, k, rounds, truncate_every=4):
    g, vmap = _graph_from(spark, edges)
    inv = {v: orig for orig, v in vmap.items()}
    got = {
        inv[r["vid"]]: r["deg"]
        for r in kcore.peel(g, k=k, rounds=rounds,
                            truncate_every=truncate_every).collect()
    }
    return got


# clique of 5 (ids 0-4) + a 4-vertex tail 5-6-7-8 hanging off vertex 0:
# at k=2 the tail peels ONE vertex per round (8, then 7, then 6, then 5) —
# a genuinely multi-round cascade crossing the truncation stride
CLIQUE_TAIL = [
    (a, b) for a in range(5) for b in range(a + 1, 5)
] + [(0, 5), (5, 6), (6, 7), (7, 8)]


def test_kcore_fixpoint_matches_oracle(spark):
    surv, deg = _peel_oracle(CLIQUE_TAIL, k=2, rounds=None)
    got = _run_peel(spark, CLIQUE_TAIL, k=2, rounds=None)
    assert got == deg
    assert set(got) == {0, 1, 2, 3, 4}  # the clique is the 2-core


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_kcore_bounded_rounds_match_oracle(spark, rounds):
    """Each bounded budget is a DIFFERENT intermediate state on the
    cascade (tail vertices peel one per round) — pins round-for-round
    agreement, which is what the driver's chained-CTE oracle checks."""
    surv, deg = _peel_oracle(CLIQUE_TAIL, k=2, rounds=rounds)
    got = _run_peel(spark, CLIQUE_TAIL, k=2, rounds=rounds)
    assert got == deg
    # the cascade really is gradual: budget r leaves 9 - r vertices
    assert len(got) == 9 - rounds


def test_kcore_stride_boundary_invariance(spark):
    """Result is identical whether the reliable truncation lands mid-run
    (stride 1/2) or never fires before the fixpoint (stride 100)."""
    expected = _run_peel(spark, CLIQUE_TAIL, k=2, rounds=None, truncate_every=100)
    for stride in (1, 2):
        assert _run_peel(
            spark, CLIQUE_TAIL, k=2, rounds=None, truncate_every=stride
        ) == expected


def test_kcore_everything_peels(spark):
    # a path has empty 2-core
    path = [(i, i + 1) for i in range(6)]
    assert _run_peel(spark, path, k=2, rounds=None) == {}


def test_kcore_zero_degree_survivor_rule(spark):
    """A vertex can clear k in the count round and still end with degree 0
    in the induced subgraph (both its neighbors peeled in the same round):
    it must be REPORTED with deg=0, matching the SQL left join."""
    # star center 0 with leaves 1,2; k=2: round 1 keeps {0} (deg 2),
    # peels the leaves (deg 1) -> 0 survives the round with deg 0
    star = [(0, 1), (0, 2)]
    surv, deg = _peel_oracle(star, k=2, rounds=1)
    got = _run_peel(spark, star, k=2, rounds=1)
    assert got == deg == {0: 0}


def _coreness_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    und = {(a, b) for a, b in edges if a != b} | {(b, a) for a, b in edges if a != b}
    verts = {v for e in und for v in e}
    core = {}
    k = 1
    while verts:
        while True:
            deg = {v: 0 for v in verts}
            for a, b in und:
                if a in verts and b in verts:
                    deg[a] += 1
            drop = {v for v in verts if deg[v] < k}
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
            verts -= drop
        k += 1
        if k > len(core) + len(verts) + 2:
            break
    for v in verts:
        core[v] = k - 1  # unreachable in practice (loop empties verts)
    return core


def test_coreness_structures(spark):
    # ring (all coreness 2... wait: ring degree 2 ⇒ 2-core, peeled at k=3)
    ring = [(i, (i + 1) % 8) for i in range(8)]
    # star: leaves coreness 1, hub coreness 1
    star = [(100, 100 + i) for i in range(1, 6)]
    # 5-clique: all coreness 4
    clique = [(200 + i, 200 + j) for i in range(5) for j in range(i + 1, 5)]
    edges = ring + star + clique
    g, vmap = _graph_from(spark, edges)
    got = {r["vid"]: r["coreness"] for r in kcore.coreness(g).collect()}
    want = {vmap[v]: c for v, c in _coreness_oracle(edges).items()}
    assert got == want
    assert got[vmap[0]] == 2 and got[vmap[100]] == 1 and got[vmap[200]] == 4


def test_coreness_bounded_budget_floor(spark):
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    g, vmap = _graph_from(spark, clique)
    got = {r["vid"]: r["coreness"] for r in kcore.coreness(g, max_k=3).collect()}
    assert set(got.values()) == {3}  # true coreness 5, floored at the budget


def test_coreness_random_graph(spark):
    import random

    rng = random.Random(5)
    edges = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    edges = [e for e in edges if e[0] != e[1]]
    g, vmap = _graph_from(spark, edges)
    got = {r["vid"]: r["coreness"] for r in kcore.coreness(g).collect()}
    want = {vmap[v]: c for v, c in _coreness_oracle(edges).items()}
    assert got == want
