"""Whole-graph summary statistics: reciprocity, degree assortativity,
local clustering coefficients.

The link-graph health checks every pipeline runs after a build — the same
role the reference's parse-count regression tests play
(/root/reference/tests/isle_of_man/parsing.rs:36-63 pin node/edge counts;
these pin the graph's SHAPE): reciprocity says how bidirectional the
graph is, assortativity whether hubs link to hubs, clustering how locally
dense neighborhoods are. All three reduce a 10¹³-edge graph to O(1) or
O(|V|) output.

Scale notes:

- **reciprocity** — one self-join of the edge table on the reversed key
  (left-semi, so nothing materializes but a counter) + one count. Both
  sides shuffle on their join key once; with the edge table at rest in
  hash(src) layout, the forward side's exchange is already satisfied.
- **assortativity** — Pearson correlation of (out-degree(src),
  in-degree(dst)) across edges, computed from ALGEBRAIC sums in one
  aggregation after two degree joins; no per-edge state leaves the
  executors, output is one row.
- **clustering coefficient** — triangles-per-vertex (the existing
  degree-oriented wedge join, operators/triangles) over undirected degree
  n(n−1)/2; per-vertex output. Hub wedge explosion is already capped by
  the degree orientation inside the triangle operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reciprocity(edges: DataFrame) -> DataFrame:
    """→ one row (n_edges, n_reciprocal, reciprocity): the fraction of
    directed (src≠dst) edges whose reverse edge also exists."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(recip.agg(F.count("*").alias("n_reciprocal")))
        .select(
            "n_edges",
            "n_reciprocal",
            F.round(
                F.col("n_reciprocal").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """→ one row (n_edges, assortativity): Pearson correlation across
    directed edges between src's out-degree and dst's in-degree (the
    directed out-in assortativity of Newman 2002). Negative on power-law
    link graphs (hubs point at leaves). NULL when either degree sequence
    is constant (zero variance)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    out_d = e.groupBy("src").agg(F.count("*").alias("src_deg"))
    in_d = e.groupBy("dst").agg(F.count("*").alias("dst_deg"))
    joined = e.join(out_d, "src").join(in_d, "dst")
    # corr as algebraic sums (one aggregation, map-side combinable) rather
    # than F.corr so the SQL oracle reproduces the arithmetic exactly
    x = F.col("src_deg").cast("double")
    y = F.col("dst_deg").cast("double")
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        F.col("n").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
        ).alias("assortativity"),
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """→ (vid, degree, triangles, coefficient): local clustering
    coefficient over the UNDIRECTED simple graph — triangles(v) /
    (deg(v)·(deg(v)−1)/2); degree-<2 vertices get 0. Same degree-ordered
    orientation as operators/triangles (every triangle has exactly one
    wedge at its min-degree corner; hub wedge fan-out is capped by the
    count of higher-degree neighbors, ≤ O(√E))."""
    from ..plans.checkpoint import EphemeralTruncator

    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionAll(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("degree"))
    )
    j = und.join(
        deg.select(F.col("vid").alias("a"), F.col("degree").alias("da")), "a"
    ).join(deg.select(F.col("vid").alias("b"), F.col("degree").alias("db")), "b")
    fwd = j.where(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    rev = j.where(
        (F.col("db") < F.col("da"))
        | ((F.col("db") == F.col("da")) & (F.col("b") < F.col("a")))
    ).select(F.col("b").alias("src"), F.col("a").alias("dst"))
    # materialized once: the oriented frame feeds three downstream scans
    o = EphemeralTruncator(edges.sparkSession, "graphstats-cc").truncate(
        fwd.unionAll(rev)
    )
    e1 = o.select(F.col("src").alias("w"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("w"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "w", "inner").where(F.col("b") < F.col("c"))
    closing = o.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    ).distinct()
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    counts = (
        tris.select(F.col("w").alias("vid"))
        .unionAll(tris.select(F.col("b").alias("vid")))
        .unionAll(tris.select(F.col("c").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("triangles"))
    )
    pairs = (F.col("degree") * (F.col("degree") - 1) / 2).cast("double")
    return (
        deg.join(counts, "vid", "left")
        .select(
            "vid",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(F.coalesce("triangles", F.lit(0)) / pairs, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("coefficient"),
        )
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a vertex partition over the UNDIRECTED view →
    per-community rows (label, intra_edges, degree_sum, q) + readable
    total via ``q.sum()``: Q = Σ_c [ e_c/m − (d_c/2m)² ], where e_c =
    undirected intra-community edges, d_c = Σ degrees in c, m = undirected
    edge count. The standard objective LPA/Louvain communities are judged
    by — the quality readout for ``operators/lpa`` partitions.

    ``labels``: (vid, label). Vertices missing a label are their own
    singleton community (coalesce to vid), matching LPA's init.

    Scale: canonicalize to one row per undirected edge (min,max) +
    distinct, two label joins keyed by vid (the same key the vertex state
    rests on), then ONE groupBy(label) with algebraic sums — per-community
    output, nothing per-edge leaves the executors. Skew = community size;
    the aggregate is sum/count (map-side combine), not a collect.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    la = labels.select(F.col("vid").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("vid").alias("b"), F.col("label").alias("lb"))
    lab = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("la", F.col("a")).alias("la"),
            F.coalesce("lb", F.col("b")).alias("lb"),
        )
    )
    # materialize ONCE: three consumers below (two union branches + intra)
    # would otherwise each recompute the dedup + both label joins — at
    # corpus scale that's 3× the dominant cost (caught by the plan test)
    from ..plans.checkpoint import EphemeralTruncator

    lab = EphemeralTruncator(edges.sparkSession, "modularity-lab").truncate(lab)
    m = lab.count()
    if m == 0:
        raise ValueError("modularity of an empty edge set is undefined")
    # degree mass per community: each edge endpoint contributes 1 to its
    # community; intra edges: both endpoints in c
    ends = lab.select(F.col("la").alias("label")).unionAll(
        lab.select(F.col("lb").alias("label"))
    )
    deg = ends.groupBy("label").agg(F.count("*").alias("degree_sum"))
    intra = (
        lab.where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").alias("intra_edges"))
    )
    return (
        deg.join(intra, "label", "left")
        .select(
            "label",
            F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
            "degree_sum",
            F.round(
                F.coalesce("intra_edges", F.lit(0)) / F.lit(float(m))
                - F.pow(F.col("degree_sum") / F.lit(2.0 * m), 2),
                6,
            ).alias("q"),
        )
    )


def powerlaw_fit(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """→ one row (d_min, n_tail, alpha, sigma): continuous MLE of the
    power-law exponent over the undirected degree tail d ≥ d_min
    (Clauset-Shalizi-Newman 2009, eq. 3.1 with the d_min − ½ discrete
    correction):

        α = 1 + n / Σ ln(d / (d_min − ½)),   σ = (α − 1) / √n

    The one-number answer to "is this graph web-shaped?" — scale-free
    link graphs fit α ≈ 2-3; α far outside that band (or a huge σ) says
    the hub structure every skew guard in this engine exists for is
    absent or extreme.

    Scale: one degree aggregation (map-side combined) + one scalar
    aggregate over the tail; no driver collect."""
    und = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    tail = deg.where(F.col("d") >= d_min)
    return tail.agg(
        F.lit(d_min).cast("int").alias("d_min"),
        F.count("*").alias("n_tail"),
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("d") / F.lit(d_min - 0.5))),
            6,
        ).alias("alpha"),
        F.round(
            (
                F.count("*")
                / F.sum(F.log(F.col("d") / F.lit(d_min - 0.5)))
            )
            / F.sqrt(F.count("*")),
            6,
        ).alias("sigma"),
    )


def _portable_bucket(col, num_partitions: int):
    """Deterministic partition bucket from a PORTABLE hash (56-bit md5
    slice), not Spark's internal Murmur3: the number a capacity plan is
    made from must be reproducible by any engine reading the same table
    (the DuckDB oracle recomputes it bit-identically), and must not change
    under Spark version upgrades."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 14), 16, 10).cast("long")
    return F.pmod(h, F.lit(num_partitions))


def partition_stats(edges: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Hash-partition layout diagnostics for a planned edge layout of P
    partitions by hash(src) — the capacity-planning numbers you read
    BEFORE committing a 1000-executor run:

    → one row per partition:
       (partition, n_edges, n_src, max_src_deg, cut_edges, cut_frac, skew)

    - n_edges / skew (= n_edges / mean): partition balance. skew ≫ 1 on
      some partition means a hub vertex owns it → salt that key.
    - max_src_deg: the largest single-vertex edge block inside the
      partition — the thing that can't be split by adding partitions
      (hash keeps a key together); the salting threshold comes from here.
    - cut_edges / cut_frac: edges whose dst hashes to a DIFFERENT
      partition = the per-superstep shuffle volume of any gather step
      keyed by dst. 1 − 1/P is the random-layout expectation; materially
      below it means locality (e.g. a bucketed/contracted layout) is
      already paying off.

    One scan, two algebraic aggregates, no driver collect."""
    b = edges.select(
        _portable_bucket(F.col("src"), num_partitions).alias("p_src"),
        _portable_bucket(F.col("dst"), num_partitions).alias("p_dst"),
        "src",
    )
    per_src = b.groupBy("p_src", "src").agg(
        F.count("*").alias("deg"),
        F.sum(F.when(F.col("p_dst") != F.col("p_src"), 1).otherwise(0)).alias("cut"),
    )
    per_part = per_src.groupBy("p_src").agg(
        F.sum("deg").alias("n_edges"),
        F.count("*").alias("n_src"),
        F.max("deg").alias("max_src_deg"),
        F.sum("cut").alias("cut_edges"),
    )
    mean_edges = F.sum("n_edges").over(Window.partitionBy()) / F.lit(num_partitions)
    return (
        per_part.select(
            F.col("p_src").cast("int").alias("partition"),
            "n_edges",
            "n_src",
            "max_src_deg",
            "cut_edges",
            F.round(F.col("cut_edges") / F.col("n_edges"), 6).alias("cut_frac"),
            F.round(F.col("n_edges") / mean_edges, 6).alias("skew"),
        )
    )


BOWTIE_REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "OTHER", "DISC")


def bowtie(
    edges: DataFrame, max_iter: int = 200, local_cap: int | None = None
) -> DataFrame:
    """Broder bowtie decomposition of a digraph (Broder et al., "Graph
    structure in the Web", WWW'00) → (vid, region):

    - CORE    the largest SCC (ties broken by min component label)
    - IN      reaches the core, not in it
    - OUT     reachable from the core, not in it
    - TUBE    on an IN→OUT path that bypasses the core
    - TENDRIL hangs off IN (forward) or into OUT (backward), not a tube
    - OTHER   same weak component, none of the above
    - DISC    a different weak component entirely

    The shape question every web/link-graph study asks first — how much
    of the graph can reach how much — and the sanity check for crawl
    frontier design (IN mass = pages discoverable only by seeds, OUT mass
    = sinks) and for import-graph layering on code.

    Composition of the engine's BSP primitives, each O(diameter) rounds:
    one SCC run, four frame-seeded BFS fixpoints (`neighborhood.
    khop_vertices` with a seed FRAME — a web-scale core never visits the
    driver; the only collect is the 1-row core-label pick), one CC run
    for the weak components. Set algebra is left-anti/semi joins on vid.

    The simple edge set is reliably truncated ONCE up front — ~7
    downstream consumers (SCC, 4 BFS runs, WCC, the vertex scan) read the
    parquet instead of re-running the distinct — and the whole composition
    runs at adaptive shuffle width (~250k rows/partition, the same rule as
    scc._scc): on a fixture-sized digraph the wall clock is per-ACTION
    fixed cost, and a 1-partition width also arms the boundary-only
    convergence probes in `khop_vertices`."""
    from ..plans.checkpoint import EphemeralTruncator

    spark = edges.sparkSession
    t_e = EphemeralTruncator(spark, "bowtie-edges")
    t_out = EphemeralTruncator(spark, "bowtie-out")
    e = t_e.truncate(
        edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )
    n_e = e.limit(8_000_000).count()
    # single-task fast path (operators/localgraph): the composition below
    # is ~7 BSP fixpoints whose per-action fixed cost dominates on a tiny
    # graph; one executor-side task runs the identical set algebra
    from .localgraph import LOCAL_EDGE_CAP, local_bowtie

    e_cap = LOCAL_EDGE_CAP if local_cap is None else local_cap
    if e_cap > 0 and n_e <= e_cap:
        return t_out.truncate(local_bowtie(e))
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    p_state = max(1, min(conf_p, (n_e + 249_999) // 250_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(p_state))
    try:
        return t_out.truncate(_bowtie_body(e, max_iter))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(conf_p))


def _bowtie_body(e: DataFrame, max_iter: int) -> DataFrame:
    from .cc import components_of_pairs
    from .neighborhood import khop_vertices
    from .scc import run_edges as scc_run_edges

    labels = scc_run_edges(e)
    core_row = (
        labels.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("scc").asc())
        .limit(1)
        .collect()[0]
    )
    core = labels.where(F.col("scc") == int(core_row["scc"])).select(
        F.col("id").alias("vid")
    )

    def _reach(seed_df, direction):
        # exclusive reach: vertices reached FROM the seed set, minus it
        r = khop_vertices(e, seed_df, None, direction, max_iter=max_iter)
        return r.select("vid").join(seed_df, "vid", "left_anti")

    outs = _reach(core, "out")
    ins = _reach(core, "in").join(outs, "vid", "left_anti")
    classified = core.unionByName(ins).unionByName(outs)
    t_fwd = _reach(ins, "out").join(classified, "vid", "left_anti")
    t_bwd = _reach(outs, "in").join(classified, "vid", "left_anti")
    tube = t_fwd.join(t_bwd, "vid", "left_semi")
    tendril = t_fwd.unionByName(t_bwd).distinct().join(tube, "vid", "left_anti")

    wcc = components_of_pairs(e)
    core_comps = wcc.join(core.withColumnRenamed("vid", "id"), "id", "left_semi")
    same_wcc = wcc.join(
        core_comps.select("component").distinct(), "component", "left_semi"
    ).select(F.col("id").alias("vid"))

    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    tagged = (
        verts.join(core.withColumn("r0", F.lit("CORE")), "vid", "left")
        .join(ins.withColumn("r1", F.lit("IN")), "vid", "left")
        .join(outs.withColumn("r2", F.lit("OUT")), "vid", "left")
        .join(tube.withColumn("r3", F.lit("TUBE")), "vid", "left")
        .join(tendril.withColumn("r4", F.lit("TENDRIL")), "vid", "left")
        .join(same_wcc.withColumn("r5", F.lit("OTHER")), "vid", "left")
    )
    return tagged.select(
        "vid",
        F.coalesce("r0", "r1", "r2", "r3", "r4", "r5", F.lit("DISC")).alias("region"),
    )


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """Rich-club coefficient per degree threshold k (Zhou & Mondragón):

        φ(k) = 2·E_k / (N_k·(N_k − 1))

    over the undirected simple graph, where N_k = #vertices with degree
    > k and E_k = #edges with BOTH endpoints above threshold. φ(k) → 1
    says the hubs form a near-clique ("rich club") — whether a link
    graph's core is oligarchic or distributed, the shape question after
    the power-law exponent.

    One degree aggregation + one thresholds-broadcast join per side +
    one groupBy(k): |ks| is tiny (a handful of thresholds), so the edge
    table is scanned once and the k-expansion multiplies only the slim
    (edge × surviving-k) stream. → (k, n_rich, rich_edges, phi), rows
    only for k with N_k ≥ 2."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionAll(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    kdf = edges.sparkSession.createDataFrame([(int(k),) for k in ks], "k int")
    nk = (
        deg.join(F.broadcast(kdf), deg["deg"] > kdf["k"])
        .groupBy("k")
        .agg(F.count("*").alias("n_rich"))
    )
    ek = (
        und.join(deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")
        .join(
            F.broadcast(kdf),
            (F.col("da") > kdf["k"]) & (F.col("db") > kdf["k"]),
        )
        .groupBy("k")
        .agg(F.count("*").alias("rich_edges"))
    )
    return (
        nk.where(F.col("n_rich") >= 2)
        .join(ek, "k", "left")
        .select(
            "k",
            "n_rich",
            F.coalesce("rich_edges", F.lit(0)).alias("rich_edges"),
            F.round(
                2.0 * F.coalesce("rich_edges", F.lit(0))
                / (F.col("n_rich").cast("double") * (F.col("n_rich") - 1)),
                6,
            ).alias("phi"),
        )
    )


def attribute_assortativity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman's categorical assortativity coefficient over directed edges:

        r = (Σ_i e_ii − Σ_i a_i·b_i) / (1 − Σ_i a_i·b_i)

    with e_ij the fraction of edges from attribute i to attribute j,
    a_i = Σ_j e_ij, b_i = Σ_j e_ji. r = 1 is perfect homophily (every
    edge stays inside its attribute class), r ≈ 0 random mixing, r < 0
    disassortative. The standard "do pages link within their
    language/host/topic?" readout.

    ``labels``: (vid, label). Edges with an unlabeled endpoint are
    dropped. Two vid-keyed label joins + ONE groupBy((la, lb)) — the
    mixing matrix is |labels|², tiny; everything after it is driver-free
    column arithmetic on that matrix. NULL r when Σa·b = 1 (a single
    attribute class — assortativity undefined)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("lb"))
    mix = e.join(la, "src").join(lb, "dst").groupBy("la", "lb").agg(
        F.count("*").alias("n")
    )
    # integer-exact form of r (multiply the fraction identity through by
    # m²): r = (m·Σn_ii − Σ_i row_i·col_i) / (m² − Σ_i row_i·col_i).
    # Every sum is a LONG — order-invariant across partitionings and
    # engines, one double division at the end (valid to |E| < ~3·10⁹ per
    # label pair before m² hits 2⁶³; beyond that swap in the double form).
    tr = mix.where(F.col("la") == F.col("lb")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("trn")
    )
    row = mix.groupBy("la").agg(F.sum("n").alias("ri"))
    col = mix.groupBy("lb").agg(F.sum("n").alias("ci")).withColumnRenamed("lb", "la")
    sab = row.join(col, "la").agg(
        F.coalesce(F.sum(F.col("ri") * F.col("ci")), F.lit(0)).cast("long").alias("sabn")
    )
    m = mix.agg(F.sum("n").cast("long").alias("m"))
    return (
        tr.crossJoin(sab)
        .crossJoin(m)
        .select(
            F.when(
                F.col("m") * F.col("m") > F.col("sabn"),
                F.round(
                    (F.col("m") * F.col("trn") - F.col("sabn")).cast("double")
                    / (F.col("m") * F.col("m") - F.col("sabn")).cast("double"),
                    6,
                ),
            ).alias("assortativity")
        )
    )


def double_sweep_diameter(
    graph, weighted: bool = False, start: int | None = None
) -> DataFrame:
    """Directed double-sweep diameter lower bound → one row
    (start, ecc_start, far, diameter_lb): BFS/SSSP from ``start`` (default:
    min vid — deterministic), hop to the farthest reached vertex (ties:
    min vid), sweep again from there; its eccentricity is the classic
    double-sweep lower bound on the directed diameter (the seed step of
    iFUB, and usually tight on real small-world graphs — Crescenzi et al.).

    Scale: exactly two multi-source-BSP runs of operators/sssp (each cost =
    diameter rounds over a delta frontier) plus two O(1) driver scalars
    (the argmax row and the max); nothing vertex-sized leaves the cluster.
    Unreachable vertices are absent from a sweep (the engine's SSSP
    convention), so the bound is over the start's reachable set.
    """
    from . import sssp as sssp_op

    spark = graph.edges.sparkSession
    if start is None:
        start = graph.vertices.agg(F.min("vid")).collect()[0][0]
    d1 = sssp_op.run(graph, [int(start)], weighted=weighted)
    far_row = (
        d1.orderBy(F.col("dist").desc(), F.col("vid").asc())
        .select("vid", "dist")
        .first()
    )
    far, ecc1 = int(far_row["vid"]), float(far_row["dist"])
    d2 = sssp_op.run(graph, [far], weighted=weighted)
    ecc2 = float(d2.agg(F.max("dist")).collect()[0][0])
    return spark.createDataFrame(
        [(int(start), ecc1, far, max(ecc1, ecc2))],
        "start long, ecc_start double, far long, diameter_lb double",
    )
