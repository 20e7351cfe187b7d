"""Katz centrality — α-attenuated walk counting as a BSP relax loop.

Beyond-reference centrality (same family as PageRank/HITS, different
fixpoint): katz(v) = β Σ_j α^j · #walks of length j ending at v, computed
by the linear recurrence

    x_0      = β
    x_{k+1}(v) = β + α Σ_{u→v} w(u,v) · x_k(u)

Unlike PageRank there is no per-step normalization and no dangling
redistribution, so a FIXED-ITERATION run is an exact polynomial in the
adjacency matrix — a bounded-hop SQL walk enumeration reproduces it
bit-for-bit (mod 1e-6 rounding), which is what the ``katz_nations``
driver oracle does. With unbounded iterations it converges for
α < 1/λ_max; fixed ``max_iter`` is the value-checkable mode.

Scale design (the pagerank.py discipline):
- the edge table is consumed in its RESTING hash(src) layout — per
  superstep only the slim (vid, katz) state shuffles to the edge layout,
  then one groupBy(dst) with an algebraic SUM (map-side combine caps hub
  fan-in; same salting escape hatch as pagerank applies if needed).
- per-stride reliable parquet truncation (EphemeralTruncator) keeps the
  lineage flat; no localCheckpoint-only state survives a stride.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def run(
    graph: Graph,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iter: int = 8,
    weighted: bool = False,
    truncate_every: int = 2,
) -> DataFrame:
    """→ (vid long, katz double) after exactly ``max_iter`` iterations of
    x ← β + α·AᵀWx (W = edge weights if ``weighted``, else 1)."""
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = graph.edges.sparkSession
    with iterative_conf(spark):
        return _run_loop(graph, alpha, beta, max_iter, weighted, max(truncate_every, 1))


def _run_loop(graph, alpha, beta, max_iter, weighted, truncate_every):
    spark = graph.edges.sparkSession
    wcol = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select("src", "dst", wcol.alias("w"))
    verts = graph.vertices.select("vid")

    trunc = EphemeralTruncator(spark, "katz")
    scope = BlockScope(spark)

    state = verts.select("vid", F.lit(float(beta)).alias("katz"))
    for it in range(1, max_iter + 1):
        contrib = (
            edges.join(state.select(F.col("vid").alias("src"), "katz"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("katz") * F.col("w")).alias("s"))
            .withColumnRenamed("dst", "vid")
        )
        state = verts.join(contrib, "vid", "left").select(
            "vid",
            (
                F.lit(float(beta))
                + F.lit(float(alpha)) * F.coalesce("s", F.lit(0.0))
            ).alias("katz"),
        )
        if it % truncate_every == 0 or it == max_iter:
            state = trunc.truncate(state)
            scope.release_new()
        else:
            state = state.localCheckpoint(eager=False)
    return state
