"""Maximal independent set — Luby's algorithm as a BSP peel loop.

A beyond-reference link-graph extension (family of kcore/scc): an MIS is
a canonical "spread-out representative" set — pick one doc per near-dup
neighborhood, one landmark per graph region, a conflict-free scheduling
set. Luby's round: every vertex whose priority beats ALL its live
neighbors joins the set; winners and their neighbors leave the graph.
Expected O(log n) rounds regardless of topology.

Determinism contract: the priority is the portable md5 of the vertex id
(tie-broken by the zero-padded id itself, concatenated into ONE fixed-
width string key so a single lexicographic MIN is the whole comparison)
— no RNG, so the selected set is identical across runs, retries,
partitionings and engines, and the driver's chained-CTE oracle replays
every round value-for-value. Classic Luby draws fresh randomness per
round; a fixed hash priority is equally independent of the topology and
is what makes the operator reproducible (same trade as walks/sampling).

Scale design:
- per-round work ∝ LIVE edges (winners + their neighborhoods leave; the
  frontier only shrinks). The neighbor-minimum is ONE algebraic groupBy
  (map-side combine caps hub fan-in); removal is semi/anti joins on vid.
- loop state (live edges, live vertices, accumulated set) is parquet-
  truncated every ``truncate_every`` rounds and lazily localCheckpointed
  between — the same stride discipline as kcore/pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph
from .kcore import _symmetric


def _prio_key(col) -> F.Column:
    """Fixed-width portable priority key: md5(vid) + '|' + 12-digit vid —
    one string MIN compares (priority, id) lexicographically in any
    engine."""
    s = col.cast("string")
    return F.concat(F.md5(s), F.lit("|"), F.lpad(s, 12, "0"))


def luby_mis(
    graph: Graph,
    rounds: int | None = None,
    truncate_every: int = 4,
) -> DataFrame:
    """→ (vid long, rnd int): the maximal independent set of the
    UNDIRECTED view of the graph, each member tagged with the round that
    selected it. ``rounds=None`` runs to fixpoint (every vertex selected
    or eliminated — a maximal set); a bounded ``rounds`` is the
    round-for-round variant the SQL oracle replays (idempotent past the
    fixpoint: an empty frontier selects nothing)."""
    with iterative_conf(graph.edges.sparkSession):
        return _luby_loop(graph, rounds, max(truncate_every, 1))


def _luby_loop(graph, rounds, truncate_every):
    spark = graph.edges.sparkSession
    scope = BlockScope(spark)
    trunc_live = EphemeralTruncator(spark, "mis-live")
    trunc_active = EphemeralTruncator(spark, "mis-active")
    trunc_mis = EphemeralTruncator(spark, "mis-set")

    live = _symmetric(graph.edges)  # (src, dst) both directions, no loops
    active = graph.vertices.select("vid")  # isolated vertices win round 1
    mis = spark.createDataFrame([], "vid long, rnd int")
    r = 0
    while rounds is None or r < rounds:
        r += 1
        # neighbor minimum over the live graph: one algebraic groupBy
        nmin = live.groupBy("src").agg(F.min(_prio_key(F.col("dst"))).alias("nmin"))
        sel = (
            active.join(nmin, active["vid"] == nmin["src"], "left")
            .where(F.col("nmin").isNull() | (_prio_key(F.col("vid")) < F.col("nmin")))
            .select("vid")
        )
        mis = mis.unionAll(sel.select("vid", F.lit(r).alias("rnd")))
        # winners + their neighborhoods leave the graph
        removed = sel.unionAll(
            live.join(sel.withColumnRenamed("vid", "src"), "src", "semi")
            .select(F.col("dst").alias("vid"))
        ).distinct()
        active = active.join(removed, "vid", "anti")
        live = (
            live.join(active.withColumnRenamed("vid", "src"), "src", "semi")
            .join(active.withColumnRenamed("vid", "dst"), "dst", "semi")
            .select("src", "dst")
        )
        boundary = r % truncate_every == 0 or (rounds is not None and r >= rounds)
        if boundary:
            mis = trunc_mis.truncate(mis, reap=False)
            active = trunc_active.truncate(active, reap=False)
            live = trunc_live.truncate(live, reap=False)
            trunc_mis.reap()
            trunc_active.reap()
            trunc_live.reap()
            scope.release_new()
        else:
            mis = mis.localCheckpoint(eager=False)
            active = active.localCheckpoint(eager=False)
            live = live.localCheckpoint(eager=False)
        if active.count() == 0:
            break
    # the loop may end mid-stride with block-backed frames: the RESULT must
    # survive the final release
    mis = trunc_mis.truncate(mis)
    scope.release_new()
    return mis
