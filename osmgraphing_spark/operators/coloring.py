"""Greedy graph coloring — Jones-Plassmann rounds with portable priorities.

Beyond-reference extension (family of mis/matching): a proper vertex
coloring (no edge monochromatic) partitions the graph into independent
sets — conflict-free scheduling of updates, register/slot assignment,
parallel Gauss-Seidel orderings over the link graph.

Algorithm (Jones-Plassmann): every UNCOLORED vertex whose md5 priority
beats all its uncolored neighbors colors itself NOW with the smallest
color absent from its already-colored neighborhood. Each round colors all
local priority maxima — expected O(log n) rounds on bounded-degree
graphs (same tier as Luby MIS, which is the one-color special case).
Colors used ≤ Δ+1, typically far fewer. The md5 priority (same
``mis._prio_key`` contract) makes the full color assignment deterministic
across runs, retries, partitionings and engines — the python mirror test
replays rounds exactly.

Scale design:
- per round: the uncolored-neighbor maximum is ONE algebraic groupBy over
  the live edge set (map-side combine caps hub fan-in); the
  smallest-missing-color is a pure array expression over the winner's
  colored-neighbor color SET (``collect_set`` partials dedup to ≤ #colors
  used, not degree, before the wire).
- live edges shrink as both endpoints color; loop frames follow the
  strided reliable-truncation discipline.
- Known cliff: a hub's color-set aggregation state is bounded by colors
  used (≤ degeneracy+1), so power-law graphs stay cheap; the adversarial
  case is a clique (Δ+1 rounds AND colors), which no coloring algorithm
  escapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .mis import _prio_key

#: smallest positive int absent from the int array `cs` (scan 1..size+1,
#: keep the first miss) — pure column expression, no UDF
_FIRST_MISSING = (
    "aggregate(sequence(1, size(cs) + 1), 0, "
    "(acc, x) -> CASE WHEN acc > 0 THEN acc "
    "WHEN array_contains(cs, x) THEN 0 ELSE x END)"
)


def _symmetric_pairs(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 200,
    truncate_every: int = 2,
) -> DataFrame:
    """→ (vid long, color int): a proper greedy coloring of the undirected
    view of ``edges`` (src, dst, ...); colors are 1-based and ≤ Δ+1."""
    spark = edges.sparkSession
    with iterative_conf(spark):
        return _jp_loop(
            _symmetric_pairs(edges), max_rounds, max(truncate_every, 1)
        )


def _jp_loop(sym, max_rounds, truncate_every):
    spark = sym.sparkSession
    scope = BlockScope(spark)
    trunc_sym = EphemeralTruncator(spark, "color-sym")
    trunc_unc = EphemeralTruncator(spark, "color-unc")
    trunc_col = EphemeralTruncator(spark, "color-col")

    sym = trunc_sym.truncate(sym)  # static; re-read every round
    uncolored = sym.select(F.col("src").alias("vid")).distinct()
    colored = spark.createDataFrame([], "vid long, color int")
    r = 0
    while r < max_rounds:
        r += 1
        # live edges: both endpoints still uncolored
        live = sym.join(
            uncolored.withColumnRenamed("vid", "src"), "src", "left_semi"
        ).join(uncolored.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        nmax = live.groupBy("src").agg(F.max(_prio_key(F.col("dst"))).alias("nmax"))
        winners = (
            uncolored.join(nmax, uncolored["vid"] == nmax["src"], "left")
            .where(
                F.col("nmax").isNull() | (_prio_key(F.col("vid")) > F.col("nmax"))
            )
            .select("vid")
        )
        # smallest color missing from each winner's COLORED neighborhood
        ncol = (
            sym.join(winners.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(
                colored.withColumnRenamed("vid", "dst"), "dst", "inner"
            )
            .groupBy("src")
            .agg(F.collect_set("color").alias("cs"))
        )
        assign = (
            winners.join(ncol, winners["vid"] == ncol["src"], "left")
            .select(
                "vid",
                F.when(F.col("cs").isNull(), F.lit(1))
                .otherwise(F.expr(_FIRST_MISSING))
                .cast("int")
                .alias("color"),
            )
        )
        assign = assign.localCheckpoint(eager=True)  # one action per round
        if assign.isEmpty():
            break  # an uncolored local max always exists ⇒ empty means done
        colored = colored.unionAll(assign)
        uncolored = uncolored.join(
            assign.select("vid"), "vid", "left_anti"
        )
        boundary = r % truncate_every == 0
        if boundary:
            uncolored = trunc_unc.truncate(uncolored, reap=False)
            colored = trunc_col.truncate(colored, reap=False)
            trunc_unc.reap()
            trunc_col.reap()
            scope.release_new()
        else:
            uncolored = uncolored.localCheckpoint(eager=False)
            colored = colored.localCheckpoint(eager=False)
    colored = trunc_col.truncate(colored)
    scope.release_new()
    return colored
