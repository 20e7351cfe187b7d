"""Link prediction over the undirected graph view: common-neighbor counts
and Adamic-Adar scores.

Beyond-reference link-graph extension (same tier as k-core / HITS): on a
code link graph, a high Adamic-Adar pair is two files that import many of
the same *rare* modules — the standard "should these be linked?" signal
(Adamic & Adar 2003, "Friends and neighbors on the Web").

Scale contract (100 TB): the wedge self-join through a center vertex w
costs deg(w)² rows — a power-law hub center is the whole job. The cap
`max_center_degree` drops hub CENTERS before the self-join (pushed below
it, not filtered after), the same hot-key-removal role `max_df` plays in
Jaccard dedup: a shared neighbor of millions of vertices carries ~zero
Adamic-Adar weight (1/ln d → 0) and pure noise as a common-neighbor
signal, so the cap is also statistically principled, not just cheap.
Remaining aggregation is algebraic (count + sum) → map-side combine
bounds reducer fan-in for popular *pairs*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from .build import Graph


def adamic_adar(
    graph: Graph,
    max_center_degree: int | None = None,
    include_existing: bool = False,
    min_common: int = 1,
) -> DataFrame:
    """→ (u, v, common, adamic_adar) for u < v sharing ≥ `min_common`
    neighbors in the undirected view; adamic_adar = Σ_w 1/ln(deg(w)) over
    shared neighbors w (deg(w) ≥ 2 for any wedge center, so ln > 0).

    `include_existing=False` (default) keeps only PREDICTED pairs — pairs
    not already connected by an edge."""
    return adamic_adar_edges(
        graph.symmetrized_edges().select("src", "dst"),
        max_center_degree=max_center_degree,
        include_existing=include_existing,
        min_common=min_common,
        assume_symmetric=True,  # symmetrized_edges() is already both-
        # directions, self-loop-free and distinct — re-symmetrizing would
        # add a wasted corpus-scale shuffle (union + distinct) per call
    )


def adamic_adar_edges(
    edges: DataFrame,
    max_center_degree: int | None = None,
    include_existing: bool = False,
    min_common: int = 1,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Same as `adamic_adar` over a plain directed (src, dst) edge frame
    (symmetrized + dedup'd here unless `assume_symmetric`) — lets callers
    that already hold an edge table skip the Graph build. The undirected
    view is materialized once and reused by the degree count, both wedge
    legs, and the anti-join (four scans of one parquet round-trip, not
    four plan re-derivations)."""
    sym = edges.select("src", "dst")
    if not assume_symmetric:
        sym = (
            sym.unionAll(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    und = EphemeralTruncator(edges.sparkSession, "aa_und").truncate(sym)
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    if max_center_degree is not None:
        deg = deg.where(F.col("d") <= max_center_degree)
    # (center w, neighbor, deg(w)) with the cap applied BEFORE the self-join
    nb = und.join(deg, "src").select(
        F.col("src").alias("w"), F.col("dst").alias("nbr"), "d"
    )
    wedge = (
        nb.select("w", F.col("nbr").alias("u"), "d")
        .join(nb.select("w", F.col("nbr").alias("v")), "w")
        .where(F.col("u") < F.col("v"))
    )
    scored = (
        wedge.groupBy("u", "v")
        .agg(
            F.count("*").alias("common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("d"))), 6).alias("adamic_adar"),
        )
        .where(F.col("common") >= min_common)
    )
    if not include_existing:
        scored = scored.join(
            und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    return scored


def bipartite_project(
    edges: DataFrame,
    min_shared: int = 1,
    max_partner_degree: int | None = None,
) -> DataFrame:
    """Project a bipartite (member ``src``, partner ``dst``) edge list onto
    the member side → (u, v, shared, jaccard) for member pairs u < v with
    ≥ ``min_shared`` partners in common; jaccard = |P(u) ∩ P(v)| /
    |P(u) ∪ P(v)| over the partner sets (the co-purchase / co-citation /
    shared-dependency graph — Newman 2001 collaboration projections).

    Scale contract (100 TB): a partner of degree D fans out D² projected
    pairs — hub partners ARE the job. ``max_partner_degree`` drops them
    BEFORE the self-join (the adamic_adar cap discipline), which is also
    the principled estimator: a partner shared by millions of members
    carries ~zero association signal. Jaccard denominators use the TRUE
    member degrees (full partner sets), so the cap only thins the shared
    count — documented estimator semantics, not silent truncation. The
    distinct edge list is materialized once (parquet round-trip) and
    reused by both degree counts and both wedge legs."""
    e = EphemeralTruncator(edges.sparkSession, "biproj").truncate(
        edges.select("src", "dst").distinct()
    )
    pdeg = e.groupBy("dst").agg(F.count("*").alias("pd"))
    if max_partner_degree is not None:
        pdeg = pdeg.where(F.col("pd") <= max_partner_degree)
    nb = e.join(pdeg.select("dst"), "dst").select(
        F.col("dst").alias("p"), F.col("src").alias("m")
    )
    shared = (
        nb.select("p", F.col("m").alias("u"))
        .join(nb.select("p", F.col("m").alias("v")), "p")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    mdeg = e.groupBy("src").agg(F.count("*").alias("md"))
    return (
        shared.join(mdeg.select(F.col("src").alias("u"), F.col("md").alias("du")), "u")
        .join(mdeg.select(F.col("src").alias("v"), F.col("md").alias("dv")), "v")
        .select(
            "u", "v", "shared",
            F.round(
                F.col("shared") / (F.col("du") + F.col("dv") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )
