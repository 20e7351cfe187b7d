"""Single/multi-source shortest paths — BSP Bellman-Ford with a delta
frontier.

Closes the reference's point-to-point cost capability (its flagship:
bidirectional Dijkstra, /root/reference/src/routing/dijkstra.rs:144-342, and
the route-pair generator that keeps only pairs with a real path + cost,
/root/reference/src/io/writing/routing/random_or_all.rs:32-158). A priority
queue is the wrong shape for BSP; the Spark-native equivalent is iterative
edge relaxation:

    dist'(s, v) = min(dist(s, v), min over in-edges (u→v): dist(s, u) + w)

run for every source s SIMULTANEOUSLY (state keyed (source, vid)) until no
distance improves. Positive weights (the build clamps metrics ≥ 1e-6,
building.rs:69-88) guarantee convergence in ≤ V-1 rounds; real graphs
converge in ~diameter rounds.

Scale design:
- **delta frontier**: only rows whose distance improved last round relax
  again — per-round join size tracks the BFS wavefront, not |state|. The
  edge side rests in its build-time hash(src) layout (zero re-shuffle).
- multi-source batches the reference's per-pair Dijkstra loop into ONE BSP
  run over however many sources were sampled — the per-query cost
  amortizes across the batch exactly like its query workloads (G5).
- per-round state goes through reliable parquet truncation + BlockScope
  release (same lineage discipline as PageRank/CC/LPA).

Correctness pin: the bidirectional-bait fixture — the cheap path rr→ll is
the 3-hop top route (cost 9), not the 2-hop bottom one (cost 10)
(/root/reference/resources/bidirectional_bait/graph.fmi:16-31, asserted in
/root/reference/tests/bidirectional_bait/routing/fastest.rs) — tested in
tests/test_sssp.py, plus a DuckDB chained-relaxation oracle in the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, EphemeralTruncator, SuperstepMetrics
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def run(
    graph: Graph,
    sources: list[int],
    weighted: bool = True,
    max_iter: int = 100,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> DataFrame:
    """→ (source long, vid long, dist double): shortest-path cost from each
    source to every REACHABLE vertex (unreachable pairs are absent, like the
    reference's generator dropping path-less pairs)."""
    with iterative_conf(graph.edges.sparkSession):
        return _run_loop(graph, sources, weighted, max_iter, checkpoint, resume)


def _run_loop(graph, sources, weighted, max_iter, checkpoint, resume):
    spark = graph.edges.sparkSession
    w_col = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select(
        F.col("src").alias("vid"), F.col("dst").alias("to"), w_col.alias("w")
    )

    scope = BlockScope(spark)
    trunc_state = EphemeralTruncator(spark, "sssp-state")
    trunc_front = EphemeralTruncator(spark, "sssp-frontier")

    state = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "source long, vid long, dist double"
    )
    frontier = state
    start = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            state = checkpoint.read(latest)
            frontier = state  # conservative re-frontier: one extra no-op round
            start = latest + 1

    import time

    for it in range(start, max_iter):
        t0 = time.time()
        relaxed = (
            frontier.join(edges, "vid")
            .select("source", F.col("to").alias("vid"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("source", "vid")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            state.unionByName(relaxed)
            .groupBy("source", "vid")
            .agg(F.min("dist").alias("dist"))
        )
        new_frontier = (
            merged.join(
                state.select("source", "vid", F.col("dist").alias("old")),
                ["source", "vid"],
                "left",
            )
            .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("source", "vid", "dist")
        )
        # Both loop frames are written BEFORE either's previous step is
        # reaped: new_frontier's plan scans the previous state step and
        # merged's plan scans the previous frontier step, so an eager delete
        # inside the first truncate would yank files from under the second.
        new_frontier = trunc_front.truncate(new_frontier, reap=False)
        if checkpoint is not None:
            merged = checkpoint.write(
                it,
                merged,
                SuperstepMetrics(
                    step=it, delta=-1.0, rows=-1, wall_ms=(time.time() - t0) * 1000
                ),
            )
        else:
            merged = trunc_state.truncate(merged, reap=False)
        trunc_front.reap()
        trunc_state.reap()
        scope.release_new()
        n_front = new_frontier.limit(1).count()
        if checkpoint is not None:
            checkpoint.amend_metrics(
                it,
                SuperstepMetrics(
                    step=it,
                    delta=float(n_front),
                    rows=-1,
                    wall_ms=(time.time() - t0) * 1000,
                ),
            )
        state, frontier = merged, new_frontier
        if n_front == 0:
            break
    return state


def route_costs(graph: Graph, pairs: DataFrame, weighted: bool = True) -> DataFrame:
    """(src, dst) pairs → (src, dst, cost) keeping only pairs with a real
    path — the reference generator's contract (random_or_all.rs:32-158),
    batched: ONE multi-source BSP run over the distinct sources instead of
    a Dijkstra per pair."""
    sources = [r["src"] for r in pairs.select("src").distinct().collect()]
    dists = run(graph, sources, weighted=weighted)
    return (
        pairs.join(
            dists.select(
                F.col("source").alias("src"), F.col("vid").alias("dst"),
                F.col("dist").alias("cost"),
            ),
            ["src", "dst"],
            "inner",
        )
    )
