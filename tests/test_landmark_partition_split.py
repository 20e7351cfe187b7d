"""Landmark distance oracle, partition-layout diagnostics, and the
leakage-safe split: python-mirror and invariant tests.

Landmark correctness hinges on two properties of the triangle inequality:
est(u,v) = min_l d(u→l)+d(l→v) is an UPPER bound always, and EXACT when
landmarks ⊇ {u} (l = u contributes 0 + d(u→v)) — so landmarks = all
vertices must reproduce sssp.run bit-for-bit, and any subset must dominate
it from above on a strictly smaller-or-equal pair set."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import graphstats, sssp
from osmgraphing_spark.operators.build import build_graph
from osmgraphing_spark.operators.sampling import leakage_safe_split


def _wgraph(spark):
    rows = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0), ("a", "d", 10.0),
        ("d", "a", 3.0), ("b", "d", 5.0), ("e", "a", 1.0),
    ]
    raw = spark.createDataFrame(
        rows, "src_key string, dst_key string, weight double"
    )
    return build_graph(raw, num_blocks=2, id_partitions=2)


def _all_pairs(g):
    va = g.vertices.select(F.col("vid").alias("src"))
    vb = g.vertices.select(F.col("vid").alias("dst"))
    return va.crossJoin(vb).where(F.col("src") != F.col("dst"))


def _exact(g):
    vids = [r["vid"] for r in g.vertices.collect()]
    d = sssp.run(g, sources=vids, weighted=True)
    return {
        (r["source"], r["vid"]): r["dist"]
        for r in d.collect()
        if r["source"] != r["vid"]
    }


def test_landmark_all_vertices_is_exact(spark):
    g = _wgraph(spark)
    vids = [r["vid"] for r in g.vertices.collect()]
    est = {
        (r["src"], r["dst"]): r["est_dist"]
        for r in sssp.landmark_estimates(g, vids, _all_pairs(g)).collect()
    }
    assert est == {k: round(v, 6) for k, v in _exact(g).items()}


def test_landmark_subset_upper_bound(spark):
    g = _wgraph(spark)
    exact = _exact(g)
    kv = {r["key"]: r["vid"] for r in g.vertices.collect()}
    est = {
        (r["src"], r["dst"]): r["est_dist"]
        for r in sssp.landmark_estimates(g, [kv["b"]], _all_pairs(g)).collect()
    }
    assert est  # b is on many shortest paths in this fixture
    for (u, v), e in est.items():
        assert (u, v) in exact  # never invents an unreachable pair
        assert e >= round(exact[(u, v)], 6) - 1e-9  # upper bound
    # pairs not routable via b are absent: e has no in-edges, so (u, e) never appears
    assert all(v != kv["e"] for (_, v) in est)


def test_reversed_view_distances(spark):
    """d(u→l) from the reversed view equals the forward distance computed
    by running sssp FROM u — on a digraph where d(u→l) ≠ d(l→u)."""
    g = _wgraph(spark)
    kv = {r["key"]: r["vid"] for r in g.vertices.collect()}
    fwd, bwd = sssp.landmark_distances(g, [kv["d"]], weighted=True)
    to_d = {r["vid"]: r["dist"] for r in bwd.collect()}
    from_each = {
        r["source"]: r["dist"]
        for r in sssp.run(g, sources=list(kv.values()), weighted=True)
        .where(F.col("vid") == kv["d"]).collect()
    }
    assert to_d == from_each
    # asymmetry really exercised: d(a→d) = 4 (a-b-c-d) but d(d→a) = 3
    assert to_d[kv["a"]] == 4.0
    assert {r["vid"]: r["dist"] for r in fwd.collect()}[kv["a"]] == 3.0


def _pbucket(x, p):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:14], 16) % p


def test_partition_stats_python_mirror(spark):
    import random

    random.seed(7)
    edges = [(random.randrange(50), random.randrange(50)) for _ in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long")
    P = 8
    got = {r["partition"]: r.asDict() for r in
           graphstats.partition_stats(df, P).collect()}

    deg, cut = {}, {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        cut[s] = cut.get(s, 0) + (1 if _pbucket(d, P) != _pbucket(s, P) else 0)
    exp = {}
    for s in deg:
        p = _pbucket(s, P)
        e = exp.setdefault(p, {"n_edges": 0, "n_src": 0, "max": 0, "cut": 0})
        e["n_edges"] += deg[s]
        e["n_src"] += 1
        e["max"] = max(e["max"], deg[s])
        e["cut"] += cut[s]
    mean = len(edges) / P
    assert set(got) == set(exp)
    for p, e in exp.items():
        r = got[p]
        assert r["n_edges"] == e["n_edges"]
        assert r["n_src"] == e["n_src"]
        assert r["max_src_deg"] == e["max"]
        assert r["cut_edges"] == e["cut"]
        assert r["cut_frac"] == pytest.approx(e["cut"] / e["n_edges"], abs=1e-6)
        assert r["skew"] == pytest.approx(e["n_edges"] / mean, abs=1e-6)
    assert sum(r["n_edges"] for r in got.values()) == len(edges)


def test_leakage_safe_split_invariants(spark):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "doc_id long, grp long"
    )
    rows = leakage_safe_split(df, fr, "grp").collect()
    by_grp: dict[int, set] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # the leakage guard: one split per group, never straddling
    assert all(len(s) == 1 for s in by_grp.values())
    # exact bucket semantics (python mirror of the portable md5 bucket)
    for r in rows:
        b = _pbucket(r["grp"], 1_000_000)
        exp = "train" if b < 800000 else ("val" if b < 900000 else "test")
        assert r["split"] == exp
    # corpus growth never moves an existing group's split
    df2 = df.union(spark.createDataFrame([(1000, 999)], "doc_id long, grp long"))
    after = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(df2, fr, "grp").collect()}
    for r in rows:
        assert after[r["doc_id"]] == r["split"]
    with pytest.raises(ValueError):
        leakage_safe_split(df, {"a": 0.5, "b": 0.1}, "grp")


def _bfs(edges, seeds, k, direction):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        pairs = []
        if direction in ("out", "both"):
            pairs.append((s, d))
        if direction in ("in", "both"):
            pairs.append((d, s))
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for t in range(1, k + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = t
                    nxt.add(v)
        frontier = nxt
    return dist


@pytest.mark.parametrize("direction", ["out", "in", "both"])
def test_khop_vertices_python_mirror(spark, direction):
    import random

    from osmgraphing_spark.operators import neighborhood

    random.seed(11)
    edges = list({(random.randrange(30), random.randrange(30)) for _ in range(80)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: r["hops"]
        for r in neighborhood.khop_vertices(df, [0, 17], 3, direction).collect()
    }
    assert got == _bfs(edges, [0, 17], 3, direction)


def test_ego_net_induced_edges(spark):
    from osmgraphing_spark.operators import neighborhood

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 1), (9, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = neighborhood.ego_net(df, [1], 2, "both").collect()
    got = {(r["src"], r["dst"]): (r["src_hops"], r["dst_hops"]) for r in rows}
    # ball = {1:0, 2:1, 3:2}; (3,4) excluded (4 is hop 3), self-loop 9 excluded
    assert got == {(1, 2): (0, 1), (2, 3): (1, 2), (2, 1): (1, 0)}
    with pytest.raises(ValueError):
        neighborhood.khop_vertices(df, [1], 2, "sideways")


def test_temperature_sample_mirror_and_saturation(spark):
    import math

    from osmgraphing_spark.operators.sampling import W_GRID, temperature_sample

    rows = [(i, "en" if i < 160 else ("fr" if i < 190 else "de")) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, "lang", budget=60, alpha=0.5, key_cols=["doc_id"])
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}

    n = {"en": 160, "fr": 30, "de": 10}
    w = {s: math.floor(math.sqrt(c) * W_GRID) for s, c in n.items()}
    wsum = sum(w.values())
    exp = set()
    for i, lang in rows:
        rate = min(1.0, 60.0 * w[lang] / (float(wsum) * float(n[lang])))
        if _pbucket(i, 1_000_000) < math.floor(rate * 1_000_000):
            exp.add((i, lang))
    assert got == exp
    # α < 1 upweights the tail: de's keep RATE must exceed en's
    kept = {s: sum(1 for (_, l) in got if l == s) for s in n}
    assert kept["de"] / n["de"] > kept["en"] / n["en"]
    # budget ≥ corpus → every stratum saturates at keep-everything
    assert temperature_sample(df, "lang", budget=10_000, alpha=0.5).count() == 200
    with pytest.raises(ValueError):
        temperature_sample(df, "lang", budget=-1)


def test_bowtie_all_regions(spark):
    """Handcrafted digraph with every bowtie region non-empty:
    core 1↔2; 0 reaches it (IN); 3 drains it (OUT); 0→6→3 bypasses it
    (TUBE); 4 hangs off IN and 5 hangs into OUT (TENDRILs); 9 points into
    a tendril (same weak component, unclassified → OTHER); 7→8 is a
    separate weak component (DISC)."""
    edges = [(1, 2), (2, 1), (0, 1), (2, 3), (0, 4), (5, 3),
             (0, 6), (6, 3), (7, 8), (9, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        1: "CORE", 2: "CORE", 0: "IN", 3: "OUT", 6: "TUBE",
        4: "TENDRIL", 5: "TENDRIL", 9: "OTHER", 7: "DISC", 8: "DISC",
    }
    # default path (single-task local) and forced BSP composition agree
    got = {r["vid"]: r["region"] for r in graphstats.bowtie(df).collect()}
    got_bsp = {
        r["vid"]: r["region"]
        for r in graphstats.bowtie(df, local_cap=0).collect()
    }
    assert got == want
    assert got_bsp == want


def test_khop_seed_frame_fixpoint(spark):
    """DataFrame seeds + k=None runs BFS to the reachability fixpoint."""
    from osmgraphing_spark.operators import neighborhood

    edges = [(0, 1), (1, 2), (2, 3), (5, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {r["vid"]: r["hops"] for r in
           neighborhood.khop_vertices(df, seeds, None, "out").collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_new_operators_partition_invariant(spark):
    """Hash-deterministic operators must give identical results under any
    input partitioning (the retry/repartition contract every sampler in
    this engine carries)."""
    from osmgraphing_spark.operators.sampling import temperature_sample

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    base = {(r["doc_id"], r["split"]) for r in leakage_safe_split(
        df.withColumnRenamed("lang", "grp"), {"train": 0.9, "val": 0.1}, "grp"
    ).selectExpr("doc_id", "split").collect()}
    rep = {(r["doc_id"], r["split"]) for r in leakage_safe_split(
        df.repartition(7).withColumnRenamed("lang", "grp"),
        {"train": 0.9, "val": 0.1}, "grp"
    ).selectExpr("doc_id", "split").collect()}
    assert base == rep

    t1 = {r["doc_id"] for r in
          temperature_sample(df, "lang", 40, key_cols=["doc_id"]).collect()}
    t2 = {r["doc_id"] for r in
          temperature_sample(df.repartition(11), "lang", 40,
                             key_cols=["doc_id"]).collect()}
    assert t1 == t2

    e = spark.createDataFrame(
        [(i % 17, (i * 7) % 23) for i in range(200)], "src long, dst long"
    )
    s1 = sorted(map(tuple, graphstats.partition_stats(e, 8).collect()))
    s2 = sorted(map(tuple, graphstats.partition_stats(e.repartition(5), 8).collect()))
    assert s1 == s2


def test_simrank_python_mirror(spark):
    """Exact Jeh-Widom recurrence mirror on a digraph with shared
    in-neighbors, plus the contract details: diagonal implicit, a < b,
    zero rows dropped, symmetric scores."""
    from osmgraphing_spark.operators import simrank

    edges = [(0, 1), (0, 2), (3, 1), (3, 2), (1, 4), (2, 4), (4, 0)]
    C, K = 0.8, 3
    got = {(r["a"], r["b"]): r["simrank"]
           for r in simrank.run(
               spark.createDataFrame(edges, "src long, dst long"),
               c=C, max_iter=K).collect()}

    import itertools

    verts = sorted({v for e in edges for v in e})
    inn = {v: [s for s, d in edges if d == v] for v in verts}
    s = {(a, b): 1.0 if a == b else 0.0
         for a, b in itertools.product(verts, verts)}
    for _ in range(K):
        nxt = {}
        for a, b in itertools.product(verts, verts):
            if a == b:
                nxt[(a, b)] = 1.0
            elif inn[a] and inn[b]:
                tot = sum(s[(u, v)] for u in inn[a] for v in inn[b])
                nxt[(a, b)] = C * tot / (len(inn[a]) * len(inn[b]))
            else:
                nxt[(a, b)] = 0.0
        s = nxt
    exp = {(a, b): round(v, 6) for (a, b), v in s.items()
           if a < b and round(v, 6) > 0}
    assert got == pytest.approx(exp, abs=1e-6)
    with pytest.raises(ValueError):
        simrank.run(spark.createDataFrame(edges, "src long, dst long"), c=1.5)
