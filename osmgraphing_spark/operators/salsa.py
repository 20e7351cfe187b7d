"""SALSA (Stochastic Approach for Link-Structure Analysis) — degree-
normalized hubs & authorities on the link graph.

Beyond-reference extension (the reference computes PageRank-family metrics
only; this rounds out the link-analysis battery next to pagerank/hits/katz):
SALSA replaces HITS's mutual-reinforcement sums with RANDOM-WALK steps, so
hub/authority mass is split among a vertex's links instead of multiplied —
the classic fix for HITS's tightly-knit-community (TKC) bias, and the
neighborhood ranker behind "who to follow"-style recommenders:

    auth'(v) = Σ_{u→v} hub(u)  / outdeg(u)      (forward walk step)
    hub'(u)  = Σ_{u→v} auth'(v) / indeg(v)      (backward walk step)

Each half-step is a column-stochastic walk, so with an L1 initial state
mass is conserved exactly on the non-dangling support; we still L1-
normalize each half-step (an in-plan 1-row aggregate) so dangling-hub leakage
cannot drift the scale over many iterations — normalization only rescales
the stationary vector, never the ranking.

Scale design (same discipline as hits.py / pagerank.py):
- TWO resting edge layouts persisted once — hash(src) carrying the
  precomputed 1/outdeg(src), hash(dst) carrying 1/indeg(dst) — so per
  half-step only the slim (vid, score) state shuffles, never the edges,
  and the degree division costs nothing per iteration.
- normalizers are broadcast 1-row aggregates; one full iteration composes
  lazily into ONE action.
- per-iteration reliable parquet truncation + BlockScope release
  (plans/checkpoint.py lineage rules) — a 100-iteration run holds O(1)
  lineage and cached blocks.

Reference provenance: extends the metric-recomputation surface of
/root/reference/src/network/graph/mod.rs (PageRank-family analytics over
the built graph); algorithm from Lempel & Moran, "SALSA: The Stochastic
Approach for Link-Structure Analysis" (ACM TOIS 2001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def run(graph: Graph, max_iter: int = 20, tol: float = 1e-9) -> DataFrame:
    """→ (vid long, hub double, authority double) after ``max_iter``
    iterations or when max|Δhub| + max|Δauth| < tol. Scores L1-normalized
    (each column sums to 1 over all vertices)."""
    spark = graph.edges.sparkSession
    with iterative_conf(spark):
        return _run_loop(spark, graph, max_iter, tol)


def _run_loop(spark, graph, max_iter, tol):
    edges = graph.edges.select("src", "dst")
    # walk-step weights, attached to the RESTING layouts so the per-
    # iteration plan never recomputes a degree: inv_out on the hash(src)
    # copy (forward step), inv_in on the hash(dst) copy (backward step).
    out_deg = edges.groupBy("src").agg(F.count("*").alias("od"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("idg"))
    by_src = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("inv_out"))
        .repartition(graph.num_blocks, F.col("src"))
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    by_dst = (
        edges.join(in_deg, "dst")
        .select("src", "dst", (F.lit(1.0) / F.col("idg")).alias("inv_in"))
        .repartition(graph.num_blocks, F.col("dst"))
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

    trunc = EphemeralTruncator(spark, "salsa")
    scope = BlockScope(spark)

    state = verts.select(
        "vid",
        (F.lit(1.0) / F.lit(float(n))).alias("hub"),
        (F.lit(1.0) / F.lit(float(n))).alias("authority"),
    )

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
        raw_auth = (
            by_src.join(st.select(F.col("vid").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("hub") * F.col("inv_out")).alias("authority"))
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
            by_dst.join(
                auth.select(F.col("vid").alias("dst"), "authority"), "dst"
            )
            .groupBy("src")
            .agg(F.sum(F.col("authority") * F.col("inv_in")).alias("hub"))
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
        # truncate first (the one materializing action), then the
        # convergence delta joins two parquet-backed frames; the previous
        # step's files are reaped only after the check (deferred-reap).
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
