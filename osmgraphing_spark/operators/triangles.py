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
