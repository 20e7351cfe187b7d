"""k-core — BSP peeling over the undirected view of the graph.

A beyond-reference link-graph extension (same family as HITS/PPR): the
k-core is the maximal induced subgraph in which every vertex has degree
≥ k — the standard "dense backbone" filter for link/import graphs (drop
leaf files and near-leaves before expensive analytics, keep the hub
structure). The reference has no analogue; its densest structural query
is triangle counting (mirrored in operators/triangles.py).

Algorithm: repeatedly delete vertices of degree < k. BSP shape:

    round r:  deg(v)  over the LIVE edge set
              S_r   = {v : deg(v) ≥ k}
              E_r   = edges with BOTH endpoints in S_r

until the survivor count stops changing (fixpoint ⇒ the k-core, since
peeling is confluent — deletion order never changes the result) or a
caller-fixed round budget runs out (the bounded variant is what the
driver's chained-CTE SQL oracle reproduces round for round; peeling is
idempotent at the fixpoint, so early convergence under a bigger budget
yields the same table).

Scale design:
- per-round work ∝ LIVE edges (the state shrinks as the graph peels;
  dead vertices never re-enter a shuffle) — degree is one algebraic
  count (map-side combine bounds hub fan-in), the induced-subgraph step
  is two semi-joins on the same keys.
- the live edge set is the only big loop state: lineage is cut per round
  by the lazy localCheckpoint the next round's count materializes, and
  reliably parquet-truncated every ``truncate_every`` rounds (same
  stride discipline as pagerank/sssp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def _symmetric(edges: DataFrame) -> DataFrame:
    """Distinct undirected view (both directions present, self-loops out):
    degree(v) = COUNT(*) grouped by src over this table."""
    e = edges.select("src", "dst")
    return (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def peel(
    graph: Graph,
    k: int,
    rounds: int | None = None,
    truncate_every: int = 4,
) -> DataFrame:
    """→ (vid long, deg long): the vertices surviving ``rounds`` peel
    rounds at threshold ``k`` (``rounds=None`` = run to the fixpoint =
    the k-core), each with its degree INSIDE the surviving subgraph
    (0 when every neighbor was peeled in the final round)."""
    with iterative_conf(graph.edges.sparkSession):
        return _peel_loop(graph, int(k), rounds, max(truncate_every, 1))


def _peel_loop(graph, k, rounds, truncate_every):
    from ..plans.superstep import sized_shuffle

    spark = graph.edges.sparkSession
    n_e = graph.edges.limit(4_000_000).count() * 2  # symmetric view size
    with sized_shuffle(spark, n_e):
        return _peel_rounds(graph, k, rounds, truncate_every, spark)


def _peel_rounds(graph, k, rounds, truncate_every, spark):
    scope = BlockScope(spark)
    trunc_live = EphemeralTruncator(spark, "kcore-live")
    trunc_surv = EphemeralTruncator(spark, "kcore-surv")
    trunc_res = EphemeralTruncator(spark, "kcore-result")

    live = _symmetric(graph.edges)
    surv = None  # S_r; None = "all of round 0" (isolated vertices can
    # never reach deg >= k >= 1, so starting from edge endpoints is exact)
    n_prev = -1
    r = 0
    while rounds is None or r < rounds:
        deg = live.groupBy("src").agg(F.count("*").alias("deg"))
        surv = deg.where(F.col("deg") >= k).select(F.col("src").alias("vid"))
        r += 1
        # `surv` outlives the loop (it is the result's vertex set), so it
        # must never be left referencing blocks a boundary release is about
        # to drop: reliably truncate it at boundaries (it's tiny — one long
        # per survivor), lazily localCheckpoint it mid-stride; either way
        # the convergence count below is the materializing action.
        boundary = r % truncate_every == 0 or (rounds is not None and r >= rounds)
        if boundary:
            surv = trunc_surv.truncate(surv, reap=False)
        else:
            surv = surv.localCheckpoint(eager=False)
        n_surv = surv.count()
        if n_surv == n_prev:
            break  # fixpoint: another round reproduces the same S_r
        n_prev = n_surv
        live = (
            live.join(surv.select(F.col("vid").alias("src")), "src", "semi")
            .join(surv.select(F.col("vid").alias("dst")), "dst", "semi")
            .select("src", "dst")
        )
        if boundary:
            # both loop frames are parquet-backed now — executor blocks
            # from the stride are dead weight
            live = trunc_live.truncate(live, reap=False)
            trunc_surv.reap()
            trunc_live.reap()
            scope.release_new()
        else:
            live = live.localCheckpoint(eager=False)
    if surv is None:  # rounds == 0: degenerate, everything "survives"
        surv = _symmetric(graph.edges).select(F.col("src").alias("vid")).distinct()
    final_deg = live.groupBy("src").agg(F.count("*").alias("deg"))
    result = (
        surv.join(final_deg, surv["vid"] == final_deg["src"], "left")
        .select("vid", F.coalesce("deg", F.lit(0)).alias("deg"))
    )
    # the loop may have ended mid-stride (fixpoint break, or a round budget
    # that isn't a stride multiple) with either frame only block-backed:
    # reliably truncate the (vertex-sized) RESULT, then drop every block
    # the stride left behind
    result = trunc_res.truncate(result)
    scope.release_new()
    return result


def coreness(
    graph: Graph,
    max_k: int | None = None,
    truncate_every: int = 4,
) -> DataFrame:
    """Full core decomposition → (vid long, coreness long): coreness(v) =
    largest k such that v survives in the k-core, for every edge-endpoint
    vertex. Phase k peels the live subgraph to its k-core; vertices
    dropped during phase k have coreness k-1. With ``max_k``, vertices
    still alive after phase max_k are reported AS max_k (a floor — the
    bounded-budget variant).

    Scale: the live edge set only shrinks, and most mass drops in the
    first phases (power-law graphs are leaf-heavy), so total work is
    Σ_k rounds_k × |live_k| ≪ k_max × |E|. Same per-frame reliable
    truncation as the single-k peel; the phase ladder reuses the live
    subgraph — nothing is recomputed from the raw edges per k."""
    with iterative_conf(graph.edges.sparkSession):
        return _coreness_loop(graph, max_k, max(truncate_every, 1))


def _coreness_loop(graph, max_k, truncate_every):
    from ..plans.superstep import sized_shuffle

    spark = graph.edges.sparkSession
    n_e = graph.edges.limit(4_000_000).count() * 2  # symmetric view size
    with sized_shuffle(spark, n_e):
        return _coreness_ladder(graph, max_k, truncate_every, spark)


def _coreness_ladder(graph, max_k, truncate_every, spark):
    scope = BlockScope(spark)
    t_live = EphemeralTruncator(spark, "coreness-live")
    t_verts = EphemeralTruncator(spark, "coreness-verts")
    t_done = EphemeralTruncator(spark, "coreness-done")

    live = t_live.truncate(_symmetric(graph.edges))
    verts = t_verts.truncate(live.select(F.col("src").alias("vid")).distinct())
    done = spark.createDataFrame([], "vid long, coreness long")
    # an edgeless graph has no endpoint vertices: nothing ever peels, and
    # without this exit the unbounded (max_k=None) ladder would spin forever
    if verts.limit(1).count() == 0:
        return done

    k = 1
    layer = 0  # global layer counter: stride boundaries span phases
    dirty = False
    while max_k is None or k <= max_k:
        # peel the live subgraph to its k-core (fixpoint); mid-stride
        # layers cut lineage with a lazy localCheckpoint (materialized by
        # the next layer's probe), boundaries pay the reliable parquet
        # round-trip — the same stride discipline as the single-k peel
        while True:
            deg = live.groupBy("src").agg(F.count("*").alias("deg"))
            surv = deg.where(F.col("deg") >= k).select(F.col("src").alias("vid"))
            removed = verts.join(surv, "vid", "left_anti")
            if removed.limit(1).count() == 0:
                break
            done = done.unionByName(
                removed.select("vid", F.lit(k - 1).cast("long").alias("coreness"))
            )
            verts = surv
            live = (
                live.join(verts.select(F.col("vid").alias("src")), "src", "semi")
                .join(verts.select(F.col("vid").alias("dst")), "dst", "semi")
                .select("src", "dst")
            )
            layer += 1
            if layer % truncate_every == 0:
                done = t_done.truncate(done)
                verts = t_verts.truncate(verts)
                live = t_live.truncate(live)
                scope.release_new()
                dirty = False
            else:
                done = done.localCheckpoint(eager=False)
                verts = verts.localCheckpoint(eager=False)
                live = live.localCheckpoint(eager=False)
                dirty = True
            if verts.limit(1).count() == 0:
                done = t_done.truncate(done)
                scope.release_new()
                return done
        k += 1
    # bounded budget exhausted: survivors have coreness >= max_k
    if dirty:
        verts = t_verts.truncate(verts)
    done = t_done.truncate(
        done.unionByName(
            verts.select("vid", F.lit(max_k).cast("long").alias("coreness"))
        )
    )
    scope.release_new()
    return done
