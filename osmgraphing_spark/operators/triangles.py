"""Triangle counting — degree-ordered orientation + wedge join.

Standard two-join formulation (north rule lists it as a first-class
algorithm; the reference has no equivalent — its closest structural check
is CSR fwd/bwd symmetry, /root/reference/tests/small/parsing.rs:60-131):

1. undirected simple graph; orient each edge from the endpoint with
   (degree, vid) smaller → larger. Every triangle then has exactly ONE
   wedge at its minimum-degree vertex, so it's counted exactly once.
2. wedge join: oriented ⨝ oriented on the wedge apex (src);
3. closing-edge check: semi-join wedge (b, c) against oriented edges.

Scale: orientation is the whole trick — a hub with degree D contributes
O(D²) wedges un-oriented, but oriented its out-degree is bounded by the
number of HIGHER-degree neighbors (≤ O(√E) on any graph), which caps the
wedge explosion; this is the join-skew handling here, ahead of AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from .build import Graph


def _materialized_oriented(graph: Graph) -> DataFrame:
    """Oriented edges, materialized through a parquet round-trip: the frame
    is consumed by THREE downstream scans (e1, e2, closing); a parquet-backed
    scan reuses the file bytes with zero executor-storage blocks left behind
    afterwards (a persist() here leaked blocks across a long session)."""
    trunc = EphemeralTruncator(graph.edges.sparkSession, "triangles")
    return trunc.truncate(oriented_edges(graph))


def oriented_edges(graph: Graph) -> DataFrame:
    und = graph.symmetrized_edges().where(F.col("src") < F.col("dst"))
    deg = (
        graph.symmetrized_edges()
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
        .withColumnRenamed("src", "vid")
    )
    e = (
        und.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    fwd = e.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")
    rev = e.where(
        (F.col("ddeg") < F.col("sdeg"))
        | ((F.col("ddeg") == F.col("sdeg")) & (F.col("dst") < F.col("src")))
    ).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionAll(rev)


def count(graph: Graph) -> int:
    o = _materialized_oriented(graph)
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "a", "inner").where(F.col("b") < F.col("c"))
    # closing edge may be oriented either way between b and c
    closing = o.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    ).distinct()
    return wedges.join(closing, ["b", "c"], "left_semi").count()


def per_vertex(graph: Graph) -> DataFrame:
    """→ (vid, triangles): number of triangles each vertex participates in."""
    o = _materialized_oriented(graph)
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "a", "inner").where(F.col("b") < F.col("c"))
    closing = o.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    ).distinct()
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    counts = (
        tris.select(F.col("a").alias("vid"))
        .unionAll(tris.select(F.col("b").alias("vid")))
        .unionAll(tris.select(F.col("c").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        graph.vertices.select("vid")
        .join(counts, "vid", "left")
        .select("vid", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def doulion_estimate(edges: DataFrame, p: float) -> DataFrame:
    """DOULION approximate triangle count (Tsourakakis et al., KDD 2009)
    → one row (p, n_edges, n_sampled, tri_sampled, estimate): keep each
    canonical undirected edge with probability ``p`` via the engine's
    deterministic md5 bucket (sampling._bucket — retry/partitioning/
    engine-invariant, so the "random" sample and therefore the estimate
    are value-checkable), count triangles exactly in the sample with the
    same degree-oriented wedge join as `count`, and scale by 1/p³
    (each surviving triangle needed all three edges kept).

    Scale contract (100 TB): the whole point — the wedge join's
    Σ deg² cost drops by ~p² and the closing semi-join by p, for
    variance ~ T/p³ (+ hub-wedge terms); p is the accuracy dial. The
    sample is decided in the scan (map-only filter); everything after
    runs on the p-fraction graph. Estimate arrives as a 1-row aggregate
    cross join — no driver collect inside the plan."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from .sampling import RESOLUTION, _bucket

    spark = edges.sparkSession
    trunc = EphemeralTruncator(spark, "doulion")
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    und = trunc.truncate(und, reap=False)
    sampled = trunc.truncate(
        und.where(_bucket([F.col("a"), F.col("b")]) < round(p * RESOLUTION)),
        reap=False,
    )
    deg = (
        sampled.select(F.col("a").alias("v"))
        .unionAll(sampled.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e = (
        sampled.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = e.where(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    rev = e.where(
        (F.col("db") < F.col("da"))
        | ((F.col("db") == F.col("da")) & (F.col("b") < F.col("a")))
    ).select(F.col("b").alias("src"), F.col("a").alias("dst"))
    o = trunc.truncate(fwd.unionAll(rev), reap=False)
    e1 = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = o.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedges = e1.join(e2, "x").where(F.col("y") < F.col("z"))
    closing = o.select(
        F.least("src", "dst").alias("y"), F.greatest("src", "dst").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"], "left_semi").agg(
        F.count("*").alias("tri_sampled")
    )
    stats = und.agg(F.count("*").alias("n_edges")).crossJoin(
        sampled.agg(F.count("*").alias("n_sampled"))
    )
    return stats.crossJoin(tri).select(
        F.lit(float(p)).alias("p"),
        "n_edges",
        "n_sampled",
        "tri_sampled",
        F.round(F.col("tri_sampled") / F.lit(float(p) ** 3), 4).alias("estimate"),
    )
