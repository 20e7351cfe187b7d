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


def link_predictor_scores(
    edges: DataFrame,
    max_center_degree: int | None = None,
    include_existing: bool = False,
    min_common: int = 1,
    assume_symmetric: bool = False,
) -> DataFrame:
    """The full classical link-prediction battery in ONE wedge pass:
    → (u, v, common, jaccard, cosine, adamic_adar, resource_alloc,
    pref_attach) for u < v sharing ≥ ``min_common`` neighbors in the
    undirected view (Liben-Nowell & Kleinberg 2003's comparison set).

    Scale contract (100 TB): identical to `adamic_adar_edges` — the deg²
    wedge self-join is the whole job and `max_center_degree` cuts hub
    centers BELOW it; the three wedge-level scores (common count,
    Σ 1/ln d, Σ 1/d) are extra algebraic aggregate columns in the SAME
    map-side combine, so the battery costs the same shuffle as any one
    of them. Jaccard/cosine/preferential-attachment denominators use the
    TRUE degrees (two slim per-vertex joins) — the cap only thins shared
    counts, documented estimator semantics."""
    sym = edges.select("src", "dst")
    if not assume_symmetric:
        sym = (
            sym.unionAll(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    und = EphemeralTruncator(edges.sparkSession, "lp_und").truncate(sym)
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    cdeg = deg
    if max_center_degree is not None:
        cdeg = deg.where(F.col("d") <= max_center_degree)
    nb = und.join(cdeg, "src").select(
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
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("_aa"),
            F.sum(F.lit(1.0) / F.col("d")).alias("_ra"),
        )
        .where(F.col("common") >= min_common)
    )
    if not include_existing:
        scored = scored.join(
            und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    return (
        scored.join(deg.select(F.col("src").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("src").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u", "v", "common",
            F.round(
                F.col("common") / (F.col("du") + F.col("dv") - F.col("common")), 6
            ).alias("jaccard"),
            F.round(
                F.col("common") / F.sqrt(F.col("du") * F.col("dv")), 6
            ).alias("cosine"),
            F.round(F.col("_aa"), 6).alias("adamic_adar"),
            F.round(F.col("_ra"), 6).alias("resource_alloc"),
            (F.col("du") * F.col("dv")).cast("long").alias("pref_attach"),
        )
    )


def butterfly_counts(
    edges: DataFrame,
    max_partner_degree: int | None = None,
) -> DataFrame:
    """Per-member butterfly (bipartite 4-cycle) counts over a bipartite
    (member ``src``, partner ``dst``) edge list → (m, butterflies,
    max_shared). A butterfly is {u,v} × {p,q} fully connected — the
    bipartite clustering primitive (Wang et al., "Butterfly Counting in
    Bipartite Networks", VLDB 2019 problem setting, counted here by the
    exact per-pair formula Σ C(shared(u,v), 2), each butterfly credited
    to both members). Global count = Σ_m butterflies / 2.

    Scale contract (100 TB): shared counts come from the same
    partner-keyed wedge self-join as `bipartite_project` (deg² per
    partner — `max_partner_degree` cuts hub partners BEFORE the join);
    C(s,2) is a pure post-aggregation expression and the member rollup is
    algebraic. No pair list larger than the wedge output ever exists."""
    e = EphemeralTruncator(edges.sparkSession, "bfly").truncate(
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
        .agg(F.count("*").alias("s"))
        .where(F.col("s") >= 2)  # C(s,2) = 0 below 2 shared partners
    )
    per_pair = shared.select(
        "u", "v", (F.col("s") * (F.col("s") - 1) / 2).cast("long").alias("bf"), "s"
    )
    both = per_pair.select(F.col("u").alias("m"), "bf", "s").unionAll(
        per_pair.select(F.col("v").alias("m"), "bf", "s")
    )
    return both.groupBy("m").agg(
        F.sum("bf").alias("butterflies"), F.max("s").alias("max_shared")
    )


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
