"""Betweenness centrality — k-source Brandes as two BSP sweeps.

The last classic centrality the engine owes: how much shortest-path
traffic routes THROUGH each vertex (Brandes 2001; the k-source sampling
estimator after Brandes-Pich 2007 — both public literature). Exact
betweenness is all-pairs and infeasible at web scale; the standard
estimator runs Brandes from k sampled pivots and scales by n/k, with the
relative ranking converging for a few hundred pivots on power-law graphs
(same landmark discipline as sssp.harmonic_centrality).

Brandes per pivot s = (1) a forward BFS recording each vertex's level
d(s,v) and shortest-path COUNT σ(s,v), (2) a backward accumulation by
descending level:

    δ(s,v) = Σ_{w : v→w on a shortest path}  σ(s,v)/σ(s,w) · (1 + δ(s,w))

with betweenness(v) = Σ_s δ(s,v) over non-pivot terms. All k pivots run
SIMULTANEOUSLY — state is keyed (source, vid), exactly like the
multi-source SSSP loop, so the per-pivot cost amortizes into shared
shuffles:

- **forward**: frontier ⨝ edges (the edge table read in its resting
  layout), groupBy (source, vid) summing σ — an algebraic sum, so hub
  fan-in combines map-side; a vertex enters the state at its FIRST level
  (BFS = unweighted shortest paths), later arrivals are filtered by an
  anti-join against the state. Rounds = diameter.
- **backward**: levels processed in lockstep descending from the deepest;
  each round joins the level-L state rows with their in-edge predecessors
  at level L-1 (one edge join + one groupBy), accumulating δ. Rounds =
  diameter again. Only two vertex-sized frames (state, delta) live across
  rounds; both go through reliable parquet truncation at stride
  boundaries with mid-stride lazy lineage cuts (the engine-wide
  discipline).

Directed semantics: pass the directed edge table for directed
betweenness, or the symmetrized view for the undirected measure (then
divide scores by 2, the caller's choice — documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def betweenness(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 64,
    scale_to_n: int | None = None,
    local_cap: int | None = None,
) -> DataFrame:
    """→ (vid, betweenness double): Σ over pivots of Brandes δ. Pivots'
    own endpoint terms are excluded per the standard definition (source
    and target vertices of a path don't count as 'between').

    ``scale_to_n``: if set, multiply by n/k (the Brandes-Pich estimator
    normalization for a k-pivot sample of an n-vertex graph).
    ``local_cap`` overrides the single-task fast-path edge threshold
    (operators/localgraph; 0 forces the BSP sweeps)."""
    if not sources:
        raise ValueError("betweenness requires at least one pivot source")
    spark = edges.sparkSession
    from ..plans.checkpoint import EphemeralTruncator as _ET
    from . import localgraph

    e_cap = localgraph.LOCAL_EDGE_CAP if local_cap is None else local_cap
    n_e = edges.limit(e_cap + 1).count() if e_cap > 0 else 0
    if (
        e_cap > 0
        and n_e <= e_cap
        and n_e * max(1, len(sources)) <= localgraph.LOCAL_WORK_CAP
    ):
        res = _ET(spark, "btw-local").truncate(
            localgraph.local_betweenness(edges, [int(s) for s in sources])
        )
    else:
        with iterative_conf(spark):
            res = _brandes(edges, [int(s) for s in sources], max_iter)
    if scale_to_n is not None:
        res = res.select(
            "vid",
            (F.col("betweenness") * F.lit(scale_to_n / len(sources))).alias(
                "betweenness"
            ),
        )
    return res.select("vid", F.round("betweenness", 6).alias("betweenness"))


def _brandes(edges: DataFrame, sources: list[int], max_iter: int) -> DataFrame:
    from ..plans.superstep import sized_shuffle

    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.repartition("src").persist()
    # width ∝ the (source, vid) state: |pivots| × reachable vertices bounds
    # it; probe the edge count as the proxy (state ≤ |pivots|·|V| but per
    # -round joins are edge-bound). Width 1 ⇒ fixture-sized: batch the
    # convergence probes to stride boundaries (empty BFS frontier stays
    # empty — exact), the scc._scc discipline.
    n_e = e.limit(8_000_000).count() * max(1, len(sources))
    with sized_shuffle(spark, n_e) as p_state:
        return _brandes_rounds(e, spark, sources, max_iter, p_state == 1)


def _brandes_rounds(
    e: DataFrame,
    spark,
    sources: list[int],
    max_iter: int,
    tiny: bool,
) -> DataFrame:
    scope = BlockScope(spark)
    trunc_state = EphemeralTruncator(spark, "btw-state")
    trunc_front = EphemeralTruncator(spark, "btw-front")
    probe_every = 4 if tiny else 1

    # forward sweep: state (source, vid, level, sigma)
    state = spark.createDataFrame(
        [(s, s, 0, 1.0) for s in sources],
        "source long, vid long, level int, sigma double",
    )
    frontier = state
    level = 0
    for it in range(max_iter):
        level += 1
        relaxed = (
            frontier.join(e, frontier["vid"] == e["src"])
            .groupBy("source", F.col("dst").alias("nvid"))
            .agg(F.sum("sigma").alias("sigma"))
            .select(
                "source",
                F.col("nvid").alias("vid"),
                F.lit(level).cast("int").alias("level"),
                "sigma",
            )
        )
        # BFS: only first-time (source, vid) arrivals enter the state
        new_frontier = relaxed.join(
            state.select("source", "vid"), ["source", "vid"], "left_anti"
        )
        boundary = it % 4 == 3
        merged = state.unionByName(new_frontier)
        if boundary:
            new_frontier = trunc_front.truncate(new_frontier, reap=False)
            merged = trunc_state.truncate(merged, reap=False)
            trunc_front.reap()
            trunc_state.reap()
        else:
            new_frontier = new_frontier.localCheckpoint(eager=False)
            merged = merged.localCheckpoint(eager=False)
        n = -1 if (it + 1) % probe_every else new_frontier.limit(1).count()
        if boundary:
            scope.release_new()
        state, frontier = merged, new_frontier
        if n == 0:
            level -= 1
            break
    state = trunc_state.truncate(state)
    scope.release_new()

    # backward sweep by descending level: delta starts 0 everywhere
    max_level = state.agg(F.max("level")).collect()[0][0] or 0
    delta = state.select("source", "vid", "level", "sigma", F.lit(0.0).alias("delta"))
    trunc_delta = EphemeralTruncator(spark, "btw-delta")
    for idx, lv in enumerate(range(max_level, 0, -1)):
        at = delta.where(F.col("level") == lv).select(
            "source",
            F.col("vid").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        # predecessors v→w with level(v) = level(w) − 1 (shortest-path DAG)
        contrib = (
            at.join(e, at["w"] == e["dst"])
            .select("source", F.col("src").alias("vid"), "sigma_w", "delta_w")
            .join(
                delta.where(F.col("level") == lv - 1).select("source", "vid", "sigma"),
                ["source", "vid"],
            )
            .groupBy("source", "vid")
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sigma_w")) * (1.0 + F.col("delta_w"))
                ).alias("dd")
            )
        )
        delta = (
            delta.join(contrib, ["source", "vid"], "left")
            .select(
                "source", "vid", "level", "sigma",
                (F.col("delta") + F.coalesce("dd", F.lit(0.0))).alias("delta"),
            )
        )
        if idx % 4 == 3:
            delta = trunc_delta.truncate(delta)
            scope.release_new()
        else:
            delta = delta.localCheckpoint(eager=False)
            if not tiny:
                # materialize the lazy cut each level; on a width-1 fixture
                # the whole stride fuses into the boundary's single job
                delta.limit(1).count()

    out = (
        delta.where(F.col("vid") != F.col("source"))
        .groupBy("vid")
        .agg(F.sum("delta").alias("betweenness"))
        # absent = 0 (the harmonic_centrality convention): pure endpoints
        # carry no between-ness and would dominate the output at scale
        .where(F.col("betweenness") > 0)
    )
    # parquet-backed across the block release (a localCheckpoint here would
    # be unpersisted by release_new before the caller ever reads it)
    out = trunc_delta.truncate(out)
    scope.release_new()
    e.unpersist()
    return out
