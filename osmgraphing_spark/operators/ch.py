"""Contraction-hierarchy (CH) query execution — the reference's flagship
routing accelerator, batched Spark-first.

The reference consumes pre-contracted graphs (``graph.ch.fmi``: per-node
contraction levels + shortcut edges whose costs equal the two replaced
edges' sum) and answers point queries with a bidirectional CH-Dijkstra
(/root/reference/src/routing/dijkstra.rs — upward-only edge relaxation from
both ends, answer = min over meeting vertices). Construction itself is
delegated to an external tool by the reference too (README: CHConstructor),
so parity here is the QUERY side.

The priority-queue shape is wrong for BSP; the Spark-native equivalent
exploits the property that makes CH fast in the first place: the upward
graph (edges whose head level ≥ tail level) is a DAG through the level
hierarchy, so delta-frontier relaxation converges in ≤ #levels rounds, and

    dist(s, t) = min over v of  d_up(s → v) + d_up(t → v in reverse graph)

Batched execution — the reference's G5 multi-query amortization taken to
its limit: ONE upward BSP from all query sources, ONE from all query
targets (on the reversed graph, same upward filter after reversal), then
one join on the meeting vertex. Per query batch that is two bounded loops
+ one shuffle, regardless of how many pairs are asked.

Correctness pin (tests/test_ch.py): on the reference's own
``small/graph.ch.fmi`` fixture (8 nodes, 25 edges incl. 2 shortcuts,
levels 1-4), CH answers equal plain BSP Dijkstra on the same map AND on
the original uncontracted ``small/graph.fmi`` for every reachable pair —
the same cross-check the reference's routing tests run
(tests/small/routing/fastest.rs: chdijkstra_on_chmap vs dijkstra_on_map).

Scale contract (100 TB): the upward filter is one broadcast-able join on
the level table; the per-round frontier tracks the BFS wavefront of the
upward DAG (≤ #levels rounds, ~log-ish on real hierarchies); searches for
ALL queries in a batch share every round's shuffle. No per-query work
exists outside the two shared loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def upward_edges(
    edges: DataFrame, levels: DataFrame, reverse: bool = False
) -> DataFrame:
    """Edges (src, dst, w) filtered to the upward graph: level(dst) ≥
    level(src) (ties kept — correctness is unaffected because every
    relaxed cost is a real path cost; strictness only prunes harder).
    ``reverse=True`` flips the edges FIRST (the backward search's graph),
    then applies the same upward filter."""
    e = edges.select("src", "dst", "w")
    if reverse:
        e = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    lv = levels.select("vid", "level")
    return (
        e.join(
            lv.select(F.col("vid").alias("src"), F.col("level").alias("_ls")),
            "src",
        )
        .join(
            lv.select(F.col("vid").alias("dst"), F.col("level").alias("_ld")),
            "dst",
        )
        .where(F.col("_ld") >= F.col("_ls"))
        .select("src", "dst", "w")
    )


def _upward_sssp(
    spark, up_edges: DataFrame, sources: list[int], max_iter: int
) -> DataFrame:
    """Delta-frontier min-relaxation over an upward DAG, all sources
    simultaneously → (source, vid, dist). Same loop discipline as
    operators/sssp (min-merge, lazy truncation, batched convergence on an
    empty frontier) minus path tracking."""
    trunc = EphemeralTruncator(spark, "ch-up")
    scope = BlockScope(spark)
    state = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources],
        "source long, vid long, dist double",
    )
    frontier = state
    with iterative_conf(spark):
        for it in range(max_iter):
            relaxed = (
                frontier.join(
                    up_edges.withColumnRenamed("src", "vid"), "vid"
                )
                .select(
                    "source",
                    F.col("dst").alias("vid"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
            )
            merged = (
                state.unionByName(relaxed)
                .groupBy("source", "vid")
                .agg(F.min("dist").alias("dist"))
            )
            new_frontier = (
                merged.join(
                    state.select(
                        "source", "vid", F.col("dist").alias("_old")
                    ),
                    ["source", "vid"],
                    "left",
                )
                .where(
                    F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
                )
                .select("source", "vid", "dist")
            )
            new_frontier = trunc.truncate(new_frontier, reap=False)
            state = trunc.truncate(merged, reap=False)
            frontier = new_frontier
            if frontier.limit(1).count() == 0:
                break
        scope.release_new()
        return state


def ch_route_costs(
    edges: DataFrame,
    levels: DataFrame,
    pairs: DataFrame,
    max_iter: int = 64,
) -> DataFrame:
    """Batched CH point queries: ``pairs`` (src, dst) → (src, dst, cost)
    keeping only pairs with a real path (the reference generator's
    contract, random_or_all.rs:32-158). ``edges`` = (src, dst, w) of the
    CONTRACTED graph (original + shortcut edges); ``levels`` = (vid,
    level) contraction levels."""
    spark = edges.sparkSession
    sources = [r["src"] for r in pairs.select("src").distinct().collect()]
    targets = [r["dst"] for r in pairs.select("dst").distinct().collect()]
    fwd = _upward_sssp(spark, upward_edges(edges, levels), sources, max_iter)
    bwd = _upward_sssp(
        spark, upward_edges(edges, levels, reverse=True), targets, max_iter
    )
    cand = (
        fwd.select(F.col("source").alias("src"), "vid", F.col("dist").alias("_df"))
        .join(
            bwd.select(
                F.col("source").alias("dst"), "vid", F.col("dist").alias("_db")
            ),
            "vid",
        )
        .select("src", "dst", (F.col("_df") + F.col("_db")).alias("cost"))
        .groupBy("src", "dst")
        .agg(F.min("cost").alias("cost"))
    )
    return pairs.select("src", "dst").distinct().join(cand, ["src", "dst"])


def ch_distances(
    edges: DataFrame,
    levels: DataFrame,
    sources: list[int],
    max_iter: int = 64,
) -> DataFrame:
    """One-to-all distances via CH: forward upward sweep from ``sources``
    + backward upward sweep from ALL vertices is pointless at that width,
    so this runs forward-up from the sources and backward-up from every
    vertex the forward sweep settled — correct but only sensible on small
    graphs; batched point queries should use ``ch_route_costs``."""
    spark = edges.sparkSession
    fwd = _upward_sssp(spark, upward_edges(edges, levels), sources, max_iter)
    verts = [
        r["vid"]
        for r in edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
        .collect()
    ]
    bwd = _upward_sssp(
        spark, upward_edges(edges, levels, reverse=True), verts, max_iter
    )
    return (
        fwd.select(F.col("source"), "vid", F.col("dist").alias("_df"))
        .join(
            bwd.select(
                F.col("source").alias("target"), "vid", F.col("dist").alias("_db")
            ),
            "vid",
        )
        .select("source", F.col("target").alias("vid"), (F.col("_df") + F.col("_db")).alias("dist"))
        .groupBy("source", "vid")
        .agg(F.min("dist").alias("dist"))
    )
