"""HITS (hubs & authorities) — BSP mutual reinforcement on the link graph.

Beyond-reference extension (the reference computes PageRank-family metrics
only): on a directed link graph, a good HUB points at good authorities and
a good AUTHORITY is pointed at by good hubs —

    auth'(v) = Σ_{u→v} hub(u)        then L1-normalize (Σ auth' = 1)
    hub'(u)  = Σ_{u→v} auth'(v)      then L1-normalize (Σ hub'  = 1)

L1 normalization (instead of the textbook L2) keeps every step a plain
sum — bit-reproducible in an unrolled SQL oracle — and converges to the
same ranking (normalization only rescales the dominant eigenvector).

Scale design (same discipline as pagerank.py):
- TWO resting edge layouts are persisted once — hash(src) for the hub
  gather and hash(dst) for the authority gather — so per half-step only
  the slim per-vertex state shuffles, never the edge table.
- the normalizer is an in-plan 1-row aggregate cross-joined back in (the
  virtual-sink trick's cousin), so a full iteration composes lazily into
  ONE action; no per-step driver round-trip.
- per-iteration reliable parquet truncation + BlockScope release (the
  lineage rules in plans/checkpoint.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def run(graph: Graph, max_iter: int = 20, tol: float = 1e-9) -> DataFrame:
    """→ (vid long, hub double, authority double) after ``max_iter``
    iterations or when max|Δhub| + max|Δauth| < tol. Scores L1-normalized
    (each column sums to 1)."""
    spark = graph.edges.sparkSession
    with iterative_conf(spark):
        return _run_loop(spark, graph, max_iter, tol)


def _run_loop(spark, graph, max_iter, tol):
    edges = graph.edges.select("src", "dst")
    by_src = (
        edges.repartition(graph.num_blocks, F.col("src"))
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    by_dst = (
        edges.repartition(graph.num_blocks, F.col("dst"))
        .sortWithinPartitions("dst", "src")
        .persist()
    )
    by_src.count()
    by_dst.count()
    verts = (
        graph.vertices.select("vid")
        .repartition(graph.num_blocks, F.col("vid"))
        .sortWithinPartitions("vid")
        .persist()
    )
    n = verts.count()

    trunc = EphemeralTruncator(spark, "hits")
    scope = BlockScope(spark)

    state = verts.select(
        "vid",
        (F.lit(1.0) / F.lit(float(n))).alias("hub"),
        (F.lit(1.0) / F.lit(float(n))).alias("authority"),
    )

    # iteration-scoped lazy persists (same role as pagerank's cached_summed):
    # each frame below is referenced by ≥2 downstream branches — the
    # normalizer's total aggregate + its main branch, and auth additionally
    # by the hub gather AND the final join — so without a cache the
    # post-shuffle aggregation subtree re-executes once per reference
    # (exchange reuse dedups only the shuffles, not the work above them).
    # Drained after the iteration's truncation lands.
    cached: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        df = df.persist()
        cached.append(df)
        return df

    def _drain():
        for df in cached:
            df.unpersist()
        cached.clear()

    def _normalized(scores: DataFrame, col: str) -> DataFrame:
        scores = _pin(scores)
        total = scores.agg(F.sum(col).alias("t"))
        return scores.crossJoin(F.broadcast(total)).select(
            "vid", (F.col(col) / F.col("t")).alias(col)
        )

    def iteration(st: DataFrame) -> DataFrame:
        """One full (auth then hub) update; lazy up to the caller's action."""
        raw_auth = (
            by_src.join(st.select(F.col("vid").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("authority"))
            .withColumnRenamed("dst", "vid")
        )
        auth = _pin(
            _normalized(
                verts.join(raw_auth, "vid", "left").select(
                    "vid", F.coalesce("authority", F.lit(0.0)).alias("authority")
                ),
                "authority",
            )
        )
        raw_hub = (
            by_dst.join(auth.select(F.col("vid").alias("dst"), "authority"), "dst")
            .groupBy("src")
            .agg(F.sum("authority").alias("hub"))
            .withColumnRenamed("src", "vid")
        )
        hub = _normalized(
            verts.join(raw_hub, "vid", "left").select(
                "vid", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        return hub.join(auth, "vid").select("vid", "hub", "authority")

    it = 0
    while it < max_iter:
        # truncate FIRST (the iteration's one materializing action), then
        # the convergence delta joins two parquet-backed frames — it never
        # replays the iteration plan. reap=False: the delta below still
        # scans the PREVIOUS step's files, so its deletion is deferred
        # until after the check (the SSSP deferred-reap pattern).
        new_state = trunc.truncate(iteration(state), reap=False)
        _drain()
        scope.release_new()
        if tol > 0:
            delta = float(
                new_state.join(
                    state.select(
                        "vid",
                        F.col("hub").alias("oh"),
                        F.col("authority").alias("oa"),
                    ),
                    "vid",
                )
                .agg(
                    (
                        F.max(F.abs(F.col("hub") - F.col("oh")))
                        + F.max(F.abs(F.col("authority") - F.col("oa")))
                    ).alias("d")
                )
                .collect()[0][0]
                or 0.0
            )
        else:
            delta = float("inf")
        trunc.reap()
        state = new_state
        it += 1
        if delta < tol:
            break

    for df in (by_src, by_dst, verts):
        df.unpersist()
    return state
