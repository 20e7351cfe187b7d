"""Distributed Louvain community detection (parallel modularity-based
label moving + graph contraction, multi-level).

LPA (operators/lpa) finds communities by majority vote; Louvain finds them
by directly maximizing Newman modularity Q — the standard quality tier
above LPA (Blondel et al. 2008; synchronous/parallel variant after Staudt
& Meyerhenke's PLM, both public literature). `graphstats.modularity`
scores the result; this operator produces it.

Algorithm, re-expressed as DataFrame BSP (no Rust/C++ shape survives —
every phase is joins + algebraic aggregates over (vid, label) state):

level ℓ (repeated until contraction stops shrinking the graph):
  1. canonical weighted undirected edges (a < b, multi-edges summed,
     self-loops carried separately as ``self_w`` per vertex — contraction
     creates them and they count toward degree mass, 2w each).
  2. label-moving rounds: every vertex i computes, for each neighbor
     community c, the weight w_i→c of its edges into c, and the global
     per-community degree mass tot_c. Moving i from its community a to c
     changes Q by (standard gain with i's own mass removed from both):

         ΔQ(i: a→c) = (w_i→c − w_i→a)/m  −  k_i·(tot_c − tot_a + k_i)/(2m²)

     i moves to the best strictly-positive-gain community (ties → min
     label). SYNCHRONOUS moves oscillate (two vertices swapping forever),
     so rounds alternate parity: only vertices with (vid + round) % 2 == 0
     may move in a round — the deterministic half-graph schedule from the
     distributed-Louvain literature. Stop when a full parity pair of
     rounds moves nothing (or max_rounds).
  3. contraction: communities become supervertices; inter-community edge
     weights sum, intra-community mass becomes the supervertex self-loop.
     The vid→community assignment composes through levels by one join per
     level (assignments are vertex-sized, never edge-sized).

Scale notes: every round is (edge ⨝ labels) + two groupBys — the same
shuffle budget as an LPA round plus one community-mass aggregate whose
output is |communities| rows (map-side combined; hub communities are sums,
not collects). Contraction shrinks |V| geometrically (typically ≥10× per
level on modular graphs), so level cost is dominated by level 0 — total
work ≈ a small constant × one LPA run. State through rounds is the
vertex-sized label frame: truncated reliably at stride boundaries
(plans/checkpoint discipline); per-level assignments are parquet-truncated
once per level.

Determinism: gains are exact rational comparisons ordered by (gain, label)
with a strict-improvement threshold; parity schedule is a pure function of
(vid, round). The python mirror in tests/test_louvain.py replays the same
rules move-for-move.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


@dataclass
class LouvainResult:
    assignments: DataFrame  # (vid, label): final community per ORIGINAL vertex
    levels: int
    rounds: list[int]  # label-moving rounds actually used per level


def _canonical(edges: DataFrame) -> DataFrame:
    """(src,dst[,weight]) → undirected (a, b, w) with a<b, multi-edges
    summed, self-loops dropped (level-0 input; contraction re-adds its own
    as explicit self_w)."""
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def _move_rounds(
    e: DataFrame,
    selfw: DataFrame,
    spark,
    max_rounds: int,
) -> tuple[DataFrame, int]:
    """Label-moving on one level. e: (a,b,w) a<b; selfw: (vid, self_w).
    Returns ((vid, label), rounds_used) with labels RELIABLY parquet-backed
    (the caller releases executor blocks right after). Uses its OWN
    truncation chain — a shared chain would reap parquet still backing the
    caller's e/selfw frames (each EphemeralTruncator deletes its previous
    step on the next truncate) — and its own BlockScope, constructed AFTER
    the static adj/k persists so boundary releases never drop them."""
    trunc = EphemeralTruncator(spark, "louvain-labels")
    # symmetric adjacency (vid, nbr, w)
    adj = e.select(F.col("a").alias("vid"), F.col("b").alias("nbr"), "w").unionByName(
        e.select(F.col("b").alias("vid"), F.col("a").alias("nbr"), "w")
    )
    adj = adj.repartition("vid").persist()
    verts = (
        adj.select("vid").distinct()
        .unionByName(selfw.select("vid"))
        .distinct()
    )
    # weighted degree: adjacency mass + 2·self-loop mass
    k = (
        adj.groupBy("vid").agg(F.sum("w").alias("kw"))
        .join(selfw, "vid", "outer")
        .select(
            "vid",
            (F.coalesce("kw", F.lit(0.0)) + 2.0 * F.coalesce("self_w", F.lit(0.0))).alias("k"),
        )
        .persist()
    )
    two_m = k.agg(F.sum("k")).collect()[0][0]  # = 2m (total degree mass)
    if not two_m:
        adj.unpersist()
        k.unpersist()
        return verts.select("vid", F.col("vid").alias("label")), 0

    scope = BlockScope(spark)  # AFTER adj/k persist: releases spare them
    labels = verts.select("vid", F.col("vid").alias("label"))
    rounds_used = 0
    stale = 0  # consecutive rounds with zero moves
    for rnd in range(max_rounds):
        lab_n = labels.select(F.col("vid").alias("nbr"), F.col("label").alias("nlabel"))
        # community degree mass tot_c (vertex-joined, |C| rows out)
        tot = (
            k.join(labels, "vid")
            .groupBy("label")
            .agg(F.sum("k").alias("tot"))
            .withColumnRenamed("label", "nlabel")
        )
        # per (vertex, neighbor community) edge mass
        w_ic = (
            adj.join(lab_n, "nbr")
            .groupBy("vid", "nlabel")
            .agg(F.sum("w").alias("w_ic"))
        )
        cur = labels.join(k, "vid")
        # candidate rows: vertex × {neighbor communities} with community mass
        cand = (
            w_ic.join(tot, "nlabel")
            .join(cur, "vid")
            .select(
                "vid", "label", "k",
                F.col("nlabel").alias("cand"),
                "w_ic",
                F.col("tot").alias("tot_cand"),
            )
        )
        # w_i→current and tot_current for the same vertex (may be absent if
        # no neighbor shares i's community: then w_i→a = 0)
        w_ia = (
            cand.where(F.col("cand") == F.col("label"))
            .select("vid", F.col("w_ic").alias("w_ia"))
        )
        tot_a = tot.select(F.col("nlabel").alias("label"), F.col("tot").alias("tot_a"))
        gains = (
            cand.where(F.col("cand") != F.col("label"))
            .join(w_ia, "vid", "left")
            .join(tot_a, "label")
            .select(
                "vid", "label", "cand",
                (
                    (F.col("w_ic") - F.coalesce("w_ia", F.lit(0.0))) / F.lit(two_m / 2.0)
                    - F.col("k")
                    * (F.col("tot_cand") - F.col("tot_a") + F.col("k"))
                    / F.lit(two_m * two_m / 2.0)
                ).alias("gain"),
            )
            .where(F.col("gain") > 1e-12)
        )
        best = (
            gains.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("vid").orderBy(
                        F.col("gain").desc(), F.col("cand").asc()
                    )
                ),
            )
            .where(
                (F.col("rk") == 1)
                # parity schedule: half the vertices may move per round
                & ((F.col("vid") + rnd) % 2 == 0)
            )
            .select("vid", F.col("cand").alias("new_label"))
        )
        moved = (
            labels.join(best, "vid", "left")
            .select("vid", F.coalesce("new_label", "label").alias("label"))
        )
        boundary = rnd % 4 == 3
        if boundary:
            moved = trunc.truncate(moved)
        else:
            moved = moved.localCheckpoint(eager=False)
        n_moves = best.limit(1).count()
        if boundary:
            scope.release_new()
        labels = moved
        rounds_used = rnd + 1
        if n_moves == 0:
            stale += 1
            if stale >= 2:  # both parities idle ⇒ local optimum
                break
        else:
            stale = 0
    # the caller consumes labels across a block-release boundary: hand it
    # back parquet-backed, then drop every block this level created
    labels = trunc.truncate(labels)
    scope.release_new()
    adj.unpersist()
    k.unpersist()
    return labels, rounds_used


def louvain(
    edges: DataFrame,
    max_rounds: int = 20,
    max_levels: int = 5,
) -> LouvainResult:
    """→ LouvainResult with (vid, label) over the ORIGINAL vertex ids;
    labels are community ids (a member supervertex's id chain). Directed
    input is treated as its undirected weighted view."""
    spark = edges.sparkSession
    with iterative_conf(spark):
        return _louvain_loop(edges, max_rounds, max_levels)


def _louvain_loop(edges: DataFrame, max_rounds: int, max_levels: int) -> LouvainResult:
    spark = edges.sparkSession
    # one truncation chain PER FRAME: a chain reaps its previous step on
    # each truncate, so frames that feed each other may not share one
    trunc_assign = EphemeralTruncator(spark, "louvain-assign")
    trunc_e = EphemeralTruncator(spark, "louvain-edges")
    trunc_selfw = EphemeralTruncator(spark, "louvain-selfw")
    scope = BlockScope(spark)

    e = _canonical(edges)
    selfw = e.sparkSession.createDataFrame([], "vid long, self_w double")
    assignments: DataFrame | None = None  # original vid -> current supervertex
    rounds_per_level: list[int] = []

    for level in range(max_levels):
        n_before = e.select(F.col("a").alias("v")).unionByName(
            e.select(F.col("b").alias("v"))
        ).distinct().count()
        labels, used = _move_rounds(e, selfw, spark, max_rounds)
        rounds_per_level.append(used)

        # compose assignments back to original ids (vertex-sized join)
        if assignments is None:
            assignments = labels
        else:
            assignments = assignments.join(
                labels.withColumnRenamed("vid", "label_old").withColumnRenamed(
                    "label", "label_new"
                ),
                assignments["label"] == F.col("label_old"),
            ).select("vid", F.col("label_new").alias("label"))
        assignments = trunc_assign.truncate(assignments)
        scope.release_new()

        # contract: communities -> supervertices
        la = labels.select(F.col("vid").alias("a"), F.col("label").alias("ca"))
        lb = labels.select(F.col("vid").alias("b"), F.col("label").alias("cb"))
        ce = e.join(la, "a").join(lb, "b").select("ca", "cb", "w")
        new_self = (
            ce.where(F.col("ca") == F.col("cb"))
            .groupBy(F.col("ca").alias("vid"))
            .agg(F.sum("w").alias("self_w"))
        )
        # carry forward self-loop mass absorbed from members
        prev_self = (
            selfw.join(labels, "vid")
            .groupBy(F.col("label").alias("vid"))
            .agg(F.sum("self_w").alias("self_w"))
        )
        selfw = (
            new_self.unionByName(prev_self)
            .groupBy("vid")
            .agg(F.sum("self_w").alias("self_w"))
        )
        e = (
            ce.where(F.col("ca") != F.col("cb"))
            .select(
                F.least("ca", "cb").alias("a"),
                F.greatest("ca", "cb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
        # BOTH new frames read the previous level's e parquet — defer the
        # reap until both are safely written (same discipline as SSSP's
        # state+frontier pair)
        e = trunc_e.truncate(e, reap=False)
        selfw = trunc_selfw.truncate(selfw, reap=False)
        trunc_e.reap()
        trunc_selfw.reap()
        scope.release_new()
        n_after = labels.select("label").distinct().count()
        if n_after >= n_before or used == 0:
            break
    return LouvainResult(
        assignments=assignments, levels=len(rounds_per_level), rounds=rounds_per_level
    )
