"""Densest subgraph — Charikar's greedy peel (Charikar, APPROX 2000;
the (1+ε) parallel variant of Bahmani-Kumar-Vassilvitskii, VLDB 2012).

Density ρ(S) = |E(S)| / |S| over the undirected view. Each round removes
EVERY vertex whose degree ≤ (1+ε)·(average degree) = 2(1+ε)·ρ(current),
recording the density before the peel; the best density seen is a
1/(2(1+ε))-approximation of the maximum and the surviving vertex set at
that round is the witness subgraph. The average-degree threshold is the
progress guarantee: at least an ε/(1+ε) fraction of vertices sits at or
below it every round (Markov), so rounds are O(log n / ε) — the
textbook BSP peel, the same shape as k-core with a data-dependent
threshold. (A plain (1+ε)·ρ threshold can remove NOBODY — e.g. a long
path whose interior degrees all exceed it — and stall forever.)

The mining use: the densest community of a link graph is where
spam-farms / template-explosions / mutual-citation rings live — the
subgraph you inspect first when a crawl's edge count explodes.

Scale contract (100 TB): per round one degree aggregation (map-side
combined), one scalar (|E|, |V|) aggregate, one semi-join to drop
peeled vertices — exactly k-core's shuffle budget with one extra
scalar. Edge state re-rests through the ephemeral truncator each round;
only (round, n_vertices, n_edges) scalars reach the driver, which is
how the loop terminates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator


def densest_subgraph(
    edges: DataFrame,
    epsilon: float = 0.1,
    max_rounds: int = 64,
) -> tuple[DataFrame, dict]:
    """→ (members, stats): ``members`` = (vid) of the best-density
    surviving set, ``stats`` = {"rounds", "best_round", "best_density",
    "n_vertices", "n_edges"} (density over the UNDIRECTED simple view;
    rounded to 6)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    trunc = EphemeralTruncator(edges.sparkSession, "densest")
    und = trunc.truncate(
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct(),
        reap=False,
    )
    best = {"best_density": -1.0, "best_round": 0}
    snapshots = []  # per round: the frame BEFORE that round's peel
    r = 0
    while r < max_rounds:
        counts = und.agg(
            F.count("*").alias("m"),
            F.count_distinct(F.col("a")).alias("_"),
        ).collect()[0]
        m = int(counts["m"])
        if m == 0:
            break
        deg = (
            und.select(F.col("a").alias("v"))
            .unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        deg = trunc.truncate(deg, reap=False)
        n = deg.count()
        rho = m / n
        snapshots.append((r, rho, und, n, m))
        if rho > best["best_density"]:
            best.update(
                best_density=rho, best_round=r, n_vertices=n, n_edges=m,
                _frame=und,
            )
        thresh = 2.0 * (1.0 + epsilon) * rho  # (1+eps) x average degree
        survivors = deg.where(F.col("d") > thresh).select("v")
        nxt = (
            und.join(survivors.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(survivors.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
        )
        und = trunc.truncate(nxt, reap=False)
        r += 1
    frame = best.pop("_frame", None)
    if frame is None:  # edgeless input
        members = edges.sparkSession.createDataFrame([], "vid long")
        stats = {"rounds": r, "best_round": 0, "best_density": 0.0,
                 "n_vertices": 0, "n_edges": 0}
        return members, stats
    members = (
        frame.select(F.col("a").alias("vid"))
        .unionAll(frame.select(F.col("b").alias("vid")))
        .distinct()
    )
    stats = {
        "rounds": r,
        "best_round": best["best_round"],
        "best_density": round(best["best_density"], 6),
        "n_vertices": best["n_vertices"],
        "n_edges": best["n_edges"],
    }
    return members, stats
