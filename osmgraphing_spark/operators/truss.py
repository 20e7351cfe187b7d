"""k-truss — triangle-support peeling over the undirected simple graph.

The cohesion ladder above k-core (same beyond-reference family as
kcore/HITS/PPR; the reference's densest structural query is triangle
counting, mirrored in operators/triangles.py): the k-truss is the maximal
subgraph in which every EDGE participates in ≥ k−2 triangles (Cohen 2008,
public literature). Where the k-core filters weakly-attached vertices,
the k-truss filters weakly-embedded edges — the standard "community
backbone" cut on link graphs, strictly nested inside the (k−1)-core.

BSP shape per round, on the live canonical edge set (a < b):

    support(e) over live   — triangle enumeration: degree-ordered
                             orientation + wedge join + closing-edge join
                             (the operators/triangles.py trick: a hub's
                             oriented out-degree is bounded by its count
                             of higher-degree neighbors, capping the wedge
                             explosion ahead of AQE), each triangle then
                             credited to its THREE canonical edges with an
                             algebraic count (map-side combine)
    live' = {e : support(e) ≥ k−2}

until the edge count stops changing (fixpoint ⇒ the k-truss: peeling is
confluent) or a caller-fixed round budget runs out — the bounded variant
is what the driver's chained-CTE SQL oracle replays round for round, and
peeling is idempotent at the fixpoint so early convergence under a larger
budget yields the same table. The reported support is recomputed INSIDE
the surviving subgraph (mirroring kcore.peel's "degree inside the
survivors" contract).

Scale: per-round work ∝ triangles of the LIVE set, which only shrinks;
the live frame is the single loop state, lineage-cut per round (lazy
localCheckpoint materialized by the convergence count) and reliably
parquet-truncated at stride boundaries — the engine-wide discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def _canonical(edges: DataFrame) -> DataFrame:
    """Distinct canonical undirected simple view: one (a < b) row per
    edge regardless of input direction(s); self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _support(live: DataFrame, trunc: EphemeralTruncator | None = None) -> DataFrame:
    """→ (a, b, support) for every live edge (support 0 kept explicit).

    Triangles are enumerated once each via the min-(degree, vid) apex
    orientation, then credited to their three canonical edges. The
    oriented frame is consumed by BOTH wedge-join scans, so it is
    materialized through a parquet round-trip (the triangles.py
    discipline — file bytes are re-read instead of the degree joins being
    recomputed per consumer, and no executor-storage blocks outlive the
    pass)."""
    if trunc is None:
        trunc = EphemeralTruncator(live.sparkSession, "truss-oriented")
    sym = live.unionAll(
        live.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed("a", "v")
    e = (
        sym.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("adeg")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("bdeg")), "b")
    )
    o = trunc.truncate(
        e.where(
            (F.col("adeg") < F.col("bdeg"))
            | ((F.col("adeg") == F.col("bdeg")) & (F.col("a") < F.col("b")))
        ).select("a", "b")
    )
    w1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = w1.join(w2, "x").where(F.col("y") < F.col("z"))
    tris = wedges.join(live.select(F.col("a").alias("y"), F.col("b").alias("z")),
                       ["y", "z"], "left_semi")
    # one scan of the triangle stream (an explode, not a 3-way union whose
    # branches would each recompute the wedge join), then one algebraic count
    credit = (
        tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                    ),
                    F.struct(
                        F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
                    ),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                )
            ).alias("t")
        )
        .select("t.a", "t.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    return (
        live.join(credit, ["a", "b"], "left")
        .select("a", "b", F.coalesce("support", F.lit(0)).alias("support"))
    )


def truss_edges(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    truncate_every: int = 4,
    local_cap: int | None = None,
) -> DataFrame:
    """→ (a long, b long, support long): the canonical edges surviving
    ``rounds`` peel rounds at truss level ``k`` (``rounds=None`` = run to
    the fixpoint = the k-truss), each with its triangle support INSIDE
    the surviving subgraph. ``local_cap`` overrides the single-task
    fast-path threshold (operators/localgraph; 0 forces the BSP peel)."""
    if k < 2:
        raise ValueError("k-truss is defined for k >= 2")
    from ..plans.checkpoint import EphemeralTruncator as _ET
    from . import localgraph

    # tighter default than the generic edge cap: support recomputes every
    # peel round (rounds × per-edge set intersections of python work)
    e_cap = localgraph.LOCAL_EDGE_CAP // 10 if local_cap is None else local_cap
    if e_cap > 0 and edges.limit(e_cap + 1).count() <= e_cap:
        return _ET(edges.sparkSession, "truss-local").truncate(
            localgraph.local_truss(edges, int(k), rounds)
        )
    with iterative_conf(edges.sparkSession):
        return _peel_loop(edges, int(k), rounds, max(truncate_every, 1))


def _peel_loop(edges, k, rounds, truncate_every):
    spark = edges.sparkSession
    scope = BlockScope(spark)
    t_live = EphemeralTruncator(spark, "truss-live")
    t_res = EphemeralTruncator(spark, "truss-result")
    t_orient = EphemeralTruncator(spark, "truss-oriented")

    live = t_live.truncate(_canonical(edges))
    n_prev = live.count()
    from ..plans.superstep import sized_shuffle

    with sized_shuffle(spark, n_prev):
        return _peel_rounds(
            spark, live, k, rounds, truncate_every, scope,
            t_live, t_res, t_orient, n_prev,
        )


def _peel_rounds(spark, live, k, rounds, truncate_every, scope,
                 t_live, t_res, t_orient, n_prev):
    r = 0
    while rounds is None or r < rounds:
        sup = _support(live, t_orient)
        live = sup.where(F.col("support") >= k - 2).select("a", "b")
        r += 1
        boundary = r % truncate_every == 0 or (rounds is not None and r >= rounds)
        if boundary:
            # single loop frame: the new parquet is written before the old
            # one is deleted, so the eager default reap is safe here
            live = t_live.truncate(live)
            scope.release_new()
        else:
            live = live.localCheckpoint(eager=False)
        n_live = live.count()
        if n_live == n_prev:
            break  # fixpoint: another round reproduces the same edge set
        n_prev = n_live
    result = t_res.truncate(_support(live, t_orient))
    scope.release_new()
    return result
