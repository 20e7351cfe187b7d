"""Cross-path checks for the single-task tiny-graph fast paths
(operators/localgraph): the local Tarjan/Kahn/bowtie tasks must produce
byte-identical answers to the distributed BSP operators on random
digraphs — the fast path is a pure plan substitution, never a semantics
change."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import graphstats, scc


def _rand_digraph(seed, n, m):
    rng = random.Random(seed)
    return sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


@pytest.mark.parametrize("seed,n,m", [(1, 30, 70), (2, 40, 60), (3, 25, 120)])
def test_local_vs_bsp_scc(spark, seed, n, m):
    df = spark.createDataFrame(_rand_digraph(seed, n, m), "src long, dst long")
    local = {(r["id"], r["scc"]) for r in scc.run_edges(df).collect()}
    bsp = {(r["id"], r["scc"]) for r in scc.run_edges(df, local_cap=0).collect()}
    assert local == bsp


@pytest.mark.parametrize("seed,n,m", [(4, 30, 70), (5, 45, 90)])
def test_local_vs_bsp_bowtie(spark, seed, n, m):
    df = spark.createDataFrame(_rand_digraph(seed, n, m), "src long, dst long")
    local = {(r["vid"], r["region"]) for r in graphstats.bowtie(df).collect()}
    bsp = {
        (r["vid"], r["region"])
        for r in graphstats.bowtie(df, local_cap=0).collect()
    }
    assert local == bsp


@pytest.mark.parametrize("seed,n,m", [(6, 30, 50), (7, 50, 80)])
def test_local_vs_bsp_toposort_on_condensation(spark, seed, n, m):
    """Random digraph → SCC condensation (a guaranteed DAG) → both
    layering paths agree."""
    df = spark.createDataFrame(_rand_digraph(seed, n, m), "src long, dst long")
    labels = scc.run_edges(df)
    cond = scc.condensation(df, labels).select(
        F.col("scc_src").alias("src"), F.col("scc_dst").alias("dst")
    )
    verts = labels.select(F.col("scc").alias("id")).distinct()
    local = {
        (r["id"], r["layer"])
        for r in scc.toposort_layers(cond, vertices=verts).collect()
    }
    bsp = {
        (r["id"], r["layer"])
        for r in scc.toposort_layers(cond, vertices=verts, local_cap=0).collect()
    }
    assert local == bsp


def test_local_scc_isolated_vertices_and_self_loops(spark):
    """The vertex-sentinel rows carry isolated/self-loop-only vertices
    through the single task: they must come back as singleton SCCs."""
    from osmgraphing_spark.operators.localgraph import local_scc

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (9,)], "vid long")
    got = {(r["vid"], r["scc"]) for r in local_scc(edges, verts).collect()}
    assert got == {(1, 1), (2, 1), (9, 9)}


def test_local_path_plan_is_one_task(spark):
    """The fast path's value is plan shape: a single coalesced partition,
    no shuffle Exchange in the map task's plan."""
    from osmgraphing_spark.operators.localgraph import local_scc

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    df = local_scc(edges, None)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("seed,n,m,weighted", [(8, 25, 60, True), (9, 35, 90, False)])
def test_local_vs_bsp_sssp(spark, seed, n, m, weighted):
    """local_sssp must equal the BSP loop bit-for-bit: same reached set,
    same float dists (both are min over identical prefix-sum floats),
    same min-pred tie-breaks."""
    from osmgraphing_spark.operators import sssp
    from osmgraphing_spark.operators.build import build_graph

    rng = random.Random(seed)
    raw = [
        (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}",
         round(rng.uniform(0.5, 5.0), 3))
        for _ in range(m)
    ]
    g = build_graph(
        spark.createDataFrame(raw, "src_key string, dst_key string, weight double"),
        num_blocks=2,
    )
    srcs = [r["vid"] for r in g.vertices.limit(3).collect()]
    local = sorted(map(tuple, sssp.run(g, srcs, weighted=weighted,
                                       track_paths=True).collect()))
    bsp = sorted(map(tuple, sssp.run(g, srcs, weighted=weighted,
                                     track_paths=True, local_cap=0).collect()))
    assert local == bsp


@pytest.mark.parametrize("seed,n,m", [(10, 25, 70), (11, 40, 100)])
def test_local_vs_bsp_betweenness(spark, seed, n, m):
    """local_betweenness matches the two-sweep BSP Brandes at the 1e-6
    rounding the operator publishes."""
    from osmgraphing_spark.operators import betweenness as bt

    df = spark.createDataFrame(_rand_digraph(seed, n, m), "src long, dst long")
    pivots = sorted({a for a, _ in _rand_digraph(seed, n, m)})[:8]
    local = {r["vid"]: r["betweenness"]
             for r in bt.betweenness(df, pivots).collect()}
    bsp = {r["vid"]: r["betweenness"]
           for r in bt.betweenness(df, pivots, local_cap=0).collect()}
    assert local == bsp


def test_local_sssp_negative_weights_fall_back(spark):
    """A negative metric must bypass Dijkstra: the BSP loop is
    Bellman-Ford and stays the path for it (same final dists here)."""
    from osmgraphing_spark.operators import sssp
    from osmgraphing_spark.operators.build import build_graph

    raw = [("a", "b", 2.0), ("b", "c", -1.0), ("a", "c", 3.0)]
    g = build_graph(
        spark.createDataFrame(raw, "src_key string, dst_key string, weight double"),
        num_blocks=2,
    )
    got = sorted(map(tuple, sssp.run(g, [r["vid"] for r in
                 g.vertices.limit(1).collect()], weighted=True).collect()))
    bsp = sorted(map(tuple, sssp.run(g, [r["vid"] for r in
                 g.vertices.limit(1).collect()], weighted=True,
                 local_cap=0).collect()))
    assert got == bsp


@pytest.mark.parametrize("seed,n,m", [(12, 20, 80), (13, 35, 140)])
def test_local_vs_bsp_truss_and_msf(spark, seed, n, m):
    from osmgraphing_spark.operators import mst, truss

    rng = random.Random(seed)
    raw = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    df = spark.createDataFrame(raw, "src long, dst long")
    for k in (3, 4):
        local = sorted(map(tuple, truss.truss_edges(df, k=k).collect()))
        bsp = sorted(map(tuple, truss.truss_edges(df, k=k, local_cap=0).collect()))
        assert local == bsp, f"k={k}"
    # bounded-rounds variant must mirror too (the driver oracle's shape)
    local_r = sorted(map(tuple, truss.truss_edges(df, k=4, rounds=2).collect()))
    bsp_r = sorted(map(tuple, truss.truss_edges(df, k=4, rounds=2, local_cap=0).collect()))
    assert local_r == bsp_r

    wdf = spark.createDataFrame(
        [(a, b, round(rng.uniform(1, 9), 3)) for a, b in raw],
        "src long, dst long, weight double",
    )
    local_f = sorted(map(tuple, mst.boruvka_msf(wdf).collect()))
    bsp_f = sorted(map(tuple, mst.boruvka_msf(wdf, local_cap=0).collect()))
    assert local_f == bsp_f
