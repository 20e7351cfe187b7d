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
