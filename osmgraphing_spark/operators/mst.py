"""Minimum spanning forest — distributed Borůvka over the edge table.

A beyond-reference link-graph extension: the MSF is the cheapest backbone
connecting every component — hierarchical clustering's dendrogram base
(single-linkage = MSF cut), network-cost skeletons, dedup-cluster
summarization. The reference's closest shapes are its per-component
reachability filter (route generator) and CC; Borůvka composes the same
primitives (per-key MIN + component contraction).

Algorithm (classic Borůvka, log₂V rounds): every component picks its
minimum outgoing edge under the TOTAL order (w, u, v) — the tie-break
makes the MSF unique, so there is no RNG and the output is value-checkable
— the picked edges join the forest, touched components contract (CC over
the component-pair graph), repeat until no component has an outgoing edge
(handles disconnected graphs: the result is the spanning forest).

Scale design:
- each round is: two vid→comp joins to label endpoints, one algebraic
  ``min_by`` groupBy per component (map-side combine caps hub fan-in),
  then star-contraction CC over the PICKED component pairs only (≤ one
  pair per live component — the contraction input shrinks geometrically,
  never the corpus).
- rounds are log₂V ≤ ~40 even at 10^12 vertices; loop frames (comp map,
  forest accumulator) follow the kcore/mis stride-truncation discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .cc import components_of_pairs


def canonical_edges(edges: DataFrame) -> DataFrame:
    """→ (u, v, w): undirected canonical view — u < v, self-loops dropped,
    parallel edges collapsed to their MINIMUM weight (the only one an MSF
    could ever use)."""
    e = edges.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        F.col("weight").cast("double").alias("w"),
    ).where(F.col("u") != F.col("v"))
    return e.groupBy("u", "v").agg(F.min("w").alias("w"))


def boruvka_msf(
    edges: DataFrame,
    max_rounds: int = 50,
    truncate_every: int = 2,
    local_cap: int | None = None,
) -> DataFrame:
    """→ (u long, v long, w double): the minimum spanning forest of the
    undirected view of ``edges`` (src, dst, weight), unique under the
    total edge order (w, u, v). ``max_rounds`` is a safety valve only —
    Borůvka needs ≤ log₂|V| rounds to the fixpoint. Below the localgraph
    edge cap the forest is computed in ONE task by Kruskal under the same
    total order — the uniqueness argument makes the two algorithms'
    outputs identical (``local_cap`` overrides; 0 forces Borůvka)."""
    spark = edges.sparkSession
    from ..plans.checkpoint import EphemeralTruncator as _ET
    from . import localgraph

    ce = canonical_edges(edges)
    e_cap = localgraph.LOCAL_EDGE_CAP if local_cap is None else local_cap
    if e_cap > 0 and ce.limit(e_cap + 1).count() <= e_cap:
        return _ET(spark, "msf-local").truncate(localgraph.local_msf(ce))
    with iterative_conf(spark):
        return _boruvka_loop(ce, max_rounds, max(truncate_every, 1))


def _boruvka_loop(ce, max_rounds, truncate_every):
    spark = ce.sparkSession
    scope = BlockScope(spark)
    trunc_comp = EphemeralTruncator(spark, "msf-comp")
    trunc_forest = EphemeralTruncator(spark, "msf-forest")
    trunc_edges = EphemeralTruncator(spark, "msf-edges")

    # components start as singleton vids; only edge endpoints matter
    ce = trunc_edges.truncate(ce)  # the loop re-reads it every round
    from ..plans.superstep import sized_shuffle

    n_e = ce.limit(8_000_000).count()
    with sized_shuffle(spark, n_e):
        return _boruvka_rounds(
            spark, ce, max_rounds, truncate_every, scope,
            trunc_comp, trunc_forest,
        )


def _boruvka_rounds(spark, ce, max_rounds, truncate_every, scope,
                    trunc_comp, trunc_forest):
    comp = (
        ce.select(F.col("u").alias("vid"))
        .unionAll(ce.select(F.col("v").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("comp"))
    )
    forest = spark.createDataFrame([], "u long, v long, w double")
    r = 0
    while r < max_rounds:
        r += 1
        cu = comp.select(F.col("vid").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("vid").alias("v"), F.col("comp").alias("cv"))
        cross = (
            ce.join(cu, "u").join(cv, "v").where(F.col("cu") != F.col("cv"))
        )
        # per-component minimum outgoing edge under the total order (w,u,v)
        both = cross.select(
            F.col("cu").alias("c"), "u", "v", "w", F.col("cv").alias("other")
        ).unionAll(
            cross.select(
                F.col("cv").alias("c"), "u", "v", "w", F.col("cu").alias("other")
            )
        )
        picked = (
            both.groupBy("c")
            .agg(
                F.min_by(
                    F.struct("u", "v", "w", "other"), F.struct("w", "u", "v")
                ).alias("e")
            )
            .select("c", "e.u", "e.v", "e.w", "e.other")
        )
        # the same edge may be picked from both sides — the forest wants it once
        new_edges = picked.select("u", "v", "w").distinct()
        n_new = new_edges.count()
        if n_new == 0:
            break  # no component has an outgoing edge: forest complete
        forest = forest.unionAll(new_edges)
        # contract: CC over the picked component pairs (≤ 1 per component)
        merged = components_of_pairs(
            picked.select(F.col("c").alias("src"), F.col("other").alias("dst"))
        ).select(F.col("id").alias("old"), F.col("component").alias("new"))
        comp = (
            comp.join(merged, comp["comp"] == merged["old"], "left")
            .select("vid", F.coalesce("new", "comp").alias("comp"))
        )
        boundary = r % truncate_every == 0
        if boundary:
            comp = trunc_comp.truncate(comp, reap=False)
            forest = trunc_forest.truncate(forest, reap=False)
            trunc_comp.reap()
            trunc_forest.reap()
            scope.release_new()
        else:
            comp = comp.localCheckpoint(eager=False)
            forest = forest.localCheckpoint(eager=False)
    forest = trunc_forest.truncate(forest)
    scope.release_new()
    return forest


def msf_weight(forest: DataFrame) -> DataFrame:
    """→ (n_edges long, total_w double): forest size + total weight (the
    single-number clustering diagnostic); one algebraic aggregate."""
    return forest.agg(
        F.count("*").alias("n_edges"), F.round(F.sum("w"), 6).alias("total_w")
    )
