"""Driver contract for the spark-graft builder (PySpark target).

Maps the engine's operator surface (SURVEY.md §2) onto the driver's
TPC-H-ish test tables, one queries() entry + DuckDB oracle per operator
family. Graph queries derive a deterministic link graph from the relational
tables (customer→supplier via orders⨝lineitem; nation co-region cliques)
so the full engine pipeline — build, PageRank, CC, LPA, triangles — is
value-checked against pure SQL oracles; document/embedding queries check
the training-data operators (dedup, text analysis, similarity search).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmgraphing_spark.functions import generating as gen  # noqa: E402
from osmgraphing_spark.functions import text as X  # noqa: E402
from osmgraphing_spark.operators import cc as cc_op  # noqa: E402
from osmgraphing_spark.operators import sssp as sssp_op  # noqa: E402
from osmgraphing_spark.operators import dedup as dd  # noqa: E402
from osmgraphing_spark.operators import linkpred  # noqa: E402
from osmgraphing_spark.operators import repetition as rep  # noqa: E402
from osmgraphing_spark.operators import lpa as lpa_op  # noqa: E402
from osmgraphing_spark.operators import pagerank as pr  # noqa: E402
from osmgraphing_spark.operators import similarity as sim  # noqa: E402
from osmgraphing_spark.operators import triangles as tri  # noqa: E402
from osmgraphing_spark.operators.build import build_graph  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Built graphs are memoized per (session, sf_dir, shape): the engine's
# resting hash(src) edge layout exists precisely so MANY algorithms reuse
# ONE build (the deployment shape: build once, query all day). Queries
# sharing a session therefore share the persisted layout instead of each
# re-running extract → dedup → id-assign → densify. Keyed by applicationId
# so a new session never sees a stale (unpersisted) graph; results are
# byte-identical either way — the build is deterministic.
_GRAPH_CACHE: dict = {}


def _cached_graph(spark, sf_dir, kind, builder, num_blocks):
    key = (spark.sparkContext.applicationId, sf_dir, kind, num_blocks)
    g = _GRAPH_CACHE.get(key)
    if g is None:
        g = build_graph(builder(spark, sf_dir), num_blocks=num_blocks)
        _GRAPH_CACHE[key] = g
    return g


def warm_link_graph(spark, sf_dir):
    """Build (or fetch) the memoized bipartite link graph — the one-time
    orders⨝lineitem → dedup → dense-ids → resting-layout cost that the whole
    link-analysis query family amortizes. bench.py times this as its own
    ``graph_build`` leg so algorithm drift cannot hide inside build drift
    (and vice versa); the timed pagerank5 that follows then measures only
    the 5-superstep run."""
    return _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)


# ---------------------------------------------------------------------------
# link graph derived from the relational tables
# ---------------------------------------------------------------------------

# disjoint vertex-id spaces for the bipartite graph: 1e10 is safely above
# any o_custkey at any TPC-H scale factor (1e6 collided from sf≈7 upward)
SUPP_OFFSET = 10_000_000_000


_RAW_EDGE_CACHE: dict = {}


def _bipartite_raw_edges(spark, sf_dir) -> DataFrame:
    """customer → supplier reference edges (distinct), as engine raw edges
    with zero-padded string keys so vertex-id assignment order is numeric.

    Materialized (parquet) and memoized per session: seven bench/driver
    queries start from this orders⨝lineitem distinct — one truncation
    replaces one corpus join per consumer, same values by construction."""
    key = (spark.sparkContext.applicationId, sf_dir, "bipartite_raw")
    cached = _RAW_EDGE_CACHE.get(key)
    if cached is not None:
        return cached
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    out = pairs.select(
        F.format_string("c%09d", F.col("o_custkey")).alias("src_key"),
        F.format_string("s%09d", F.col("l_suppkey")).alias("dst_key"),
        F.lit(1.0).alias("weight"),
    )
    from osmgraphing_spark.plans.checkpoint import EphemeralTruncator

    out = EphemeralTruncator(spark, "entry-rawbip").truncate(out)
    _RAW_EDGE_CACHE[key] = out
    return out


def _key_to_node_id(col):
    return F.when(
        F.substring(col, 1, 1) == "c", F.substring(col, 2, 9).cast("long")
    ).otherwise(F.substring(col, 2, 9).cast("long") + SUPP_OFFSET)


def _nation_raw_edges(spark, sf_dir) -> DataFrame:
    """Co-region nation cliques (both directions)."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r"))
    e = a.join(b, "r").where(F.col("a") != F.col("b"))
    return e.select(
        F.format_string("n%03d", F.col("a")).alias("src_key"),
        F.format_string("n%03d", F.col("b")).alias("dst_key"),
        F.lit(1.0).alias("weight"),
    )


def _vid_to_nationkey(graph, df, cols):
    """Map vid-space columns back to nationkey ints via the vertex table."""
    out = df
    for c in cols:
        vmap = graph.vertices.select(
            F.col("vid").alias(c),
            F.substring("key", 2, 3).cast("int").alias(f"{c}_nk"),
        )
        out = out.join(vmap, c, "inner").drop(c).withColumnRenamed(f"{c}_nk", c)
    return out


SQL_BIPARTITE_EDGES = """
    SELECT DISTINCT o_custkey AS src, {OFF} + l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
""".format(OFF=SUPP_OFFSET)

SQL_NATION_EDGES = """
    SELECT a.n_nationkey AS src, b.n_nationkey AS dst
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
"""


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def q_link_edges(spark, sf_dir):
    """S2/D3: edge derivation + dedup → the graph's edge table."""
    raw = _bipartite_raw_edges(spark, sf_dir)
    return raw.select(
        _key_to_node_id(F.col("src_key")).alias("src"),
        _key_to_node_id(F.col("dst_key")).alias("dst"),
    )


def q_link_degrees(spark, sf_dir):
    """A1/A6-style degree aggregation over the link graph."""
    e = q_link_edges(spark, sf_dir)
    out_d = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def _nation_ring_edges(spark, sf_dir):
    """Directed nation digraph with nontrivial SCC structure: within each
    region, nations chain in sorted order; EVEN regions close the ring
    (one SCC per even region), ODD regions stay a path (all singletons);
    region minima chain across regions (a DAG spine). Exercises trim
    (paths/spine) AND color+mark (rings)."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    ring = n.select(
        F.col("n_nationkey").alias("src"),
        F.coalesce(
            F.lead("n_nationkey").over(w),
            F.when(F.col("n_regionkey") % 2 == 0, F.first("n_nationkey").over(w)),
        ).alias("dst"),
    ).where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    mins = n.groupBy("n_regionkey").agg(F.min("n_nationkey").alias("mn"))
    cross = mins.select(
        F.col("mn").alias("src"),
        F.lead("mn").over(Window.orderBy("n_regionkey")).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return ring.unionByName(cross).distinct()


def q_scc_nations(spark, sf_dir):
    """Strongly connected components (operators/scc: BSP trim +
    forward-min coloring + backward mark) on the directed nation digraph —
    import-cycle detection on a code link graph; scc = min node id of the
    component."""
    from osmgraphing_spark.operators import scc as scc_op

    res = scc_op.run_edges(_nation_ring_edges(spark, sf_dir))
    return res.select(F.col("id").alias("node_id"), "scc")


RICH_CLUB_KS = (1, 2, 4, 8, 16, 32)


def q_link_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) over the undirected customer→supplier
    link graph (operators/graphstats.rich_club): is the high-degree core
    a near-clique? One degree aggregation + a thresholds-broadcast join —
    the edge table is scanned once for all k."""
    from osmgraphing_spark.operators import graphstats

    e = _bipartite_raw_edges(spark, sf_dir).select(
        _key_to_node_id(F.col("src_key")).alias("src"),
        _key_to_node_id(F.col("dst_key")).alias("dst"),
    )
    return graphstats.rich_club(e, list(RICH_CLUB_KS))


def q_link_attr_assort(spark, sf_dir):
    """Categorical (Newman) assortativity by region label on the mixed
    nation digraph (operators/graphstats.attribute_assortativity):
    integer-exact mixing-matrix arithmetic, one double division — the
    'do pages link within their language/host?' homophily readout."""
    from osmgraphing_spark.operators import graphstats

    labels = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("vid"), F.col("n_regionkey").alias("label")
    )
    return graphstats.attribute_assortativity(
        _nation_mixed_edges(spark, sf_dir), labels
    )


SIMRANK_C = 0.8
SIMRANK_ITERS = 3


def q_simrank_nations(spark, sf_dir):
    """SimRank structural similarity (operators/simrank): 3 exact
    iterations of the Jeh-Widom recurrence on the nation ring/spine
    digraph — nonzero (a, b, simrank) pairs, a < b. Fixed-iteration mode
    is an exact rational recurrence, replayed round-for-round by the
    DuckDB oracle."""
    from osmgraphing_spark.operators import simrank

    res = simrank.run(
        _nation_ring_edges(spark, sf_dir), c=SIMRANK_C, max_iter=SIMRANK_ITERS
    )
    return res.select(
        F.col("a").cast("int").alias("a"),
        F.col("b").cast("int").alias("b"),
        "simrank",
    )


def q_link_dist_hist(spark, sf_dir):
    """Neighborhood function / distance distribution
    (operators/neighborhood.distance_distribution, ANF/HyperANF family):
    N(t) = # ordered pairs within t hops on the directed nation ring/spine
    digraph — exact bitset tier (sparse (vid, word, bits) rows, bit_or
    map-side combine); the 100 TB path is the HLL register tier
    (neighborhood_function_hll, pinned against this tier in pytest)."""
    from osmgraphing_spark.operators import neighborhood as nb_op

    return nb_op.distance_distribution(_nation_ring_edges(spark, sf_dir))


def _nation_mixed_edges(spark, sf_dir):
    """Ring/spine digraph ∪ co-region cliques: a digraph with BOTH
    reciprocal mass (cliques) and one-way mass (spine/ring closures), and
    an undirected view with both closed triangles (cliques) and open
    wedges (spine) — nontrivial fixtures for reciprocity/clustering."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r"))
    clique = a.join(b, "r").where(F.col("src") != F.col("dst")).select("src", "dst")
    return _nation_ring_edges(spark, sf_dir).unionByName(clique).distinct()


def q_modularity_nations(spark, sf_dir):
    """Newman modularity (operators/graphstats.modularity) of the region
    partition over the mixed nation graph's undirected view — the quality
    objective LPA/Louvain communities are scored by; per-community rows,
    Q = sum(q). One canonical-edge dedup + two vid-keyed label joins + one
    algebraic groupBy(label)."""
    from osmgraphing_spark.operators import graphstats

    labels = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("vid"),
        F.col("n_regionkey").cast("long").alias("label"),
    )
    res = graphstats.modularity(_nation_mixed_edges(spark, sf_dir), labels)
    return res.select(
        F.col("label").cast("int").alias("label"),
        "intra_edges",
        "degree_sum",
        "q",
    )


def q_link_reciprocity(spark, sf_dir):
    """Graph-shape statistic (operators/graphstats.reciprocity): fraction
    of directed edges whose reverse exists — one semi-join + two counters,
    O(1) output from any |E|."""
    from osmgraphing_spark.operators import graphstats

    return graphstats.reciprocity(_nation_mixed_edges(spark, sf_dir))


def q_link_assortativity(spark, sf_dir):
    """Degree assortativity (graphstats.degree_assortativity) of the
    bipartite link graph: Pearson corr of (out-deg(src), in-deg(dst))
    across edges from ALGEBRAIC sums — one aggregation, one output row,
    exact integer sums so the SQL oracle reproduces it bit-for-bit."""
    from osmgraphing_spark.operators import graphstats

    return graphstats.degree_assortativity(q_link_edges(spark, sf_dir))


def q_link_clustering(spark, sf_dir):
    """Local clustering coefficients (graphstats.clustering_coefficients)
    over the mixed nation graph's undirected view — degree-ordered wedge
    join (hub fan-out capped), per-vertex output."""
    from osmgraphing_spark.operators import graphstats

    return graphstats.clustering_coefficients(
        _nation_mixed_edges(spark, sf_dir)
    ).select(
        F.col("vid").cast("long").alias("vid"), "degree", "triangles", "coefficient"
    )


def q_scc_build_order(spark, sf_dir):
    """Build-order layering of the import graph: SCC labels → condensation
    DAG → BSP longest-path layering (operators/scc.toposort_layers).
    layer(c) = longest chain of cross-SCC dependencies above c; equal-layer
    components are mutually independent (a parallel build schedule). The
    loop doubles as a cycle detector — it raises on a non-DAG, proving the
    condensation really is acyclic."""
    from osmgraphing_spark.operators import scc as scc_op

    e = _nation_ring_edges(spark, sf_dir)
    labels = scc_op.run_edges(e)
    cond = scc_op.condensation(e, labels)
    layers = scc_op.toposort_layers(
        cond.select(
            F.col("scc_src").alias("src"), F.col("scc_dst").alias("dst")
        ),
        vertices=labels.select(F.col("scc").alias("id")).distinct(),
    )
    return layers.select(F.col("id").cast("long").alias("scc"), "layer")


def q_link_walks(spark, sf_dir):
    """Deterministic random walks (operators/walks): 2 walks of length 3
    from every nation-digraph vertex; next-hop choice is the portable md5
    hash of (walker, step) mod out-degree, so the walk CORPUS itself is
    value-checked against the SQL oracle — the DeepWalk-style embedding
    pretraining input, reproducible across engines."""
    from osmgraphing_spark.operators import walks as walks_op

    return walks_op.random_walks(
        _nation_ring_edges(spark, sf_dir), length=3, walks_per_vertex=2
    ).select(
        "walker", "step", F.col("node").cast("long").alias("node")
    )


def q_link_snapshot_diff(spark, sf_dir):
    """Snapshot diff (operators/snapshot.edge_diff): this-week's link
    graph derived from last week's by a deterministic perturbation (drop
    (src+dst)%13==0 edges, add the reverse of src%101==5 edges) — every
    added/removed edge value-checked. The delta audit that decides when
    the warm-start path (pagerank init_ranks) pays off."""
    from osmgraphing_spark.operators import snapshot

    old = q_link_edges(spark, sf_dir)
    kept = old.where((F.col("src") + F.col("dst")) % 13 != 0)
    flipped = old.where(F.col("src") % 101 == 5).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    new = kept.unionByName(flipped)
    return snapshot.edge_diff(old, new)


def q_link_host_graph(spark, sf_dir):
    """Graph contraction (operators/contract): roll the page-level
    customer→supplier link graph up to the nation level — the page→host
    contraction every web link pipeline runs before host-rank, here the
    nation trade supergraph. mapping = vertex → nationkey (customers and
    suppliers via their nation FK); weight = Σ edge weights, n_edges =
    contracted multiplicity; intra-nation self-loops kept (domestic
    trade). One algebraic groupBy after two mapping joins."""
    from osmgraphing_spark.operators import contract as contract_op

    e = q_link_edges(spark, sf_dir).withColumn("w", F.lit(1.0))
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("vid"),
        F.col("c_nationkey").cast("long").alias("group"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey").cast("long") + F.lit(SUPP_OFFSET)).alias("vid"),
        F.col("s_nationkey").cast("long").alias("group"),
    )
    res = contract_op.contract(e, cust.unionByName(supp), weight_col="w")
    return res.select("src", "dst", "n_edges", "weight")


DOULION_P = 0.6


def q_triangles_doulion(spark, sf_dir):
    """DOULION approximate triangle count (operators/triangles
    .doulion_estimate) on the nation co-region clique graph: each edge
    kept at p=0.6 by the deterministic md5 bucket, exact count in the
    sample, scaled by 1/p³ — the 100 TB triangle path (wedge cost drops
    ~p²). Sample and estimate value-checked."""
    from osmgraphing_spark.operators.triangles import doulion_estimate

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r"))
    e = a.join(b, "r").where(F.col("src") != F.col("dst")).select("src", "dst")
    return doulion_estimate(e, p=DOULION_P)


DENSEST_EPS = 0.05
DENSEST_ROUNDS = 6


def q_link_densest(spark, sf_dir):
    """Densest subgraph (operators/densest): Charikar/BKV greedy peel at
    (1+ε)·avg-degree threshold on the symmetrized nation digraph — the
    spam-farm / mutual-citation-ring detector. Members of the best-
    density round plus the density itself, value-checked against a
    fixed-depth SQL replay of every peel round."""
    from osmgraphing_spark.operators import densest

    e = _nation_ring_edges(spark, sf_dir)
    members, stats = densest.densest_subgraph(
        e, epsilon=DENSEST_EPS, max_rounds=DENSEST_ROUNDS
    )
    return members.select(
        "vid",
        F.lit(stats["best_round"]).cast("int").alias("best_round"),
        F.lit(stats["best_density"]).alias("best_density"),
    )


def q_link_powerlaw(spark, sf_dir):
    """Power-law exponent MLE over the link graph's degree tail
    (operators/graphstats.powerlaw_fit, Clauset-Shalizi-Newman): the
    is-this-graph-web-shaped diagnostic — one degree aggregation + one
    scalar aggregate, value-checked."""
    from osmgraphing_spark.operators.graphstats import powerlaw_fit

    return powerlaw_fit(q_link_edges(spark, sf_dir), d_min=2)


WL_ROUNDS = 3


def q_link_wl_roles(spark, sf_dir):
    """Weisfeiler-Lehman structural-role colors (operators/wl) after 3
    refinement rounds on the symmetrized nation digraph: hashed-WL with a
    COMMUTATIVE neighbor-hash sum (map-side combinable — no hub color
    list ever materializes). Per-vertex colors value-checked against the
    round-for-round SQL replay."""
    from osmgraphing_spark.operators import wl as wl_op

    e = _nation_ring_edges(spark, sf_dir)
    return wl_op.wl_colors(e, rounds=WL_ROUNDS).orderBy("vid")


FEATPROP_ROUNDS = 2


def q_link_featprop(spark, sf_dir):
    """GraphSAGE-mean feature propagation (operators/featprop) on the
    symmetrized nation digraph: integer feature vectors smoothed by the
    exact round-half-up neighborhood mean for 2 rounds — every round is
    bit-replayable in SQL, so the final vectors are value-checked. The
    per-round shuffle is (dst, i, x) triples with map-side combine
    absorbing hub fan-in."""
    from osmgraphing_spark.operators import featprop

    e = _nation_ring_edges(spark, sf_dir)
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    feats = n.select(
        F.col("n_nationkey").alias("vid"),
        F.array(
            F.col("n_nationkey").cast("long"),
            (F.col("n_regionkey") * 10).cast("long"),
            (F.lit(100) - F.col("n_nationkey")).cast("long"),
        ).alias("f"),
    )
    out = featprop.propagate_features(sym, feats, rounds=FEATPROP_ROUNDS)
    return out.select(
        "vid",
        F.element_at("f", 1).alias("f0"),
        F.element_at("f", 2).alias("f1"),
        F.element_at("f", 3).alias("f2"),
    )


N2V_BIAS = (1, 2, 4)  # (ret_w, d1_w, d2_w): p = d1/ret = 2, q = d1/d2 = 0.5


def q_link_n2v_walks(spark, sf_dir):
    """node2vec-style second-order biased walks (operators/walks
    .node2vec_walks) on the symmetrized nation digraph: the
    Grover-Leskovec return/triangle/explore bias with exact INTEGER
    weights and the portable md5 draw, so the whole biased walk corpus —
    candidate weights, cumulative race, every hop — is value-checked
    against the unrolled SQL replay."""
    from osmgraphing_spark.operators import walks as walks_op

    e = _nation_ring_edges(spark, sf_dir)
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    rw, d1, d2 = N2V_BIAS
    return walks_op.node2vec_walks(
        sym, length=3, ret_w=rw, d1_w=d1, d2_w=d2, walks_per_vertex=1
    ).select("walker", "step", F.col("node").cast("long").alias("node"))


AA_CENTER_CAP = 50  # hub-center cut: the wedge self-join costs deg² per center


def q_link_adamic_adar(spark, sf_dir):
    """Link prediction (operators/linkpred): top 50 predicted (non-edge)
    pairs by shared-neighbor count over the bipartite link graph, with the
    Adamic-Adar score; hub centers (deg > 50 — here: every supplier) cut
    before the wedge self-join, the deg²-per-center 100 TB killer."""
    e = q_link_edges(spark, sf_dir)
    scored = linkpred.adamic_adar_edges(e, max_center_degree=AA_CENTER_CAP)
    return (
        scored.select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            "common",
            "adamic_adar",
        )
        .orderBy(F.desc("common"), "node_a", "node_b")
        .limit(50)
    )


def q_link_edge_sample(spark, sf_dir):
    """Deterministic 5% edge sample (operators/sampling): membership is a
    pure md5 function of (src, dst) — identical across retries,
    partitionings, and engines, so the SAMPLE itself is value-checked,
    unlike df.sample(). The reproducible debugging slice of a 100 TB
    pipeline."""
    from osmgraphing_spark.operators import sampling

    return sampling.sample_edges(q_link_edges(spark, sf_dir), 0.05)


def q_link_degree_hist(spark, sf_dir):
    """Degree-distribution histogram (decimal-magnitude buckets) over the
    link graph — the power-law shape check every link-graph pipeline runs
    first. One degree aggregate + one tiny histogram aggregate; at 100 TB
    the output is ~10 rows regardless of |V|."""
    e = q_link_edges(spark, sf_dir)
    deg = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.groupBy(
            F.length(F.col("deg").cast("string")).cast("int").alias("magnitude")
        )
        .agg(
            F.count("*").alias("n_vertices"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
    )


def q_part_type_revenue(spark, sf_dir):
    """Star join fact⨝dim with an explicitly broadcast dimension (J1/J2
    family at relational scale: at 100 TB the lineitem fact NEVER
    shuffles for a dimension attach — `broadcast(part)` pins the
    build side)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


def q_supplier_region_stats(spark, sf_dir):
    """Dimension-chain join supplier⨝nation⨝region (both dims broadcast):
    per-region supplier counts and account-balance stats."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("total_acctbal"),
            F.round(F.min("s_acctbal"), 4).alias("min_acctbal"),
            F.round(F.max("s_acctbal"), 4).alias("max_acctbal"),
        )
    )


def q_pagerank5(spark, sf_dir):
    """G7: 5 fixed PageRank supersteps through the full engine pipeline
    (build_graph → run), mapped back to original node ids."""
    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res = pr.run(g, damping=0.85, tol=0.0, max_iter=5, check_every=5)
    return (
        res.ranks.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("rank", 6).alias("rank"),
        )
    )


def q_ppr5(spark, sf_dir):
    """G7 personalized: 5 PPR supersteps with the teleport distribution
    uniform over CUSTOMER vertices (suppliers start at 0 and earn rank only
    through in-links; restart and dangling mass both land on customers)."""
    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    cust = g.vertices.where(F.col("key").startswith("c"))
    n_c = cust.count()
    reset = cust.select("vid", F.lit(1.0 / n_c).alias("p"))
    res = pr.run(
        g, damping=0.85, tol=0.0, max_iter=5, check_every=5, reset=reset
    )
    return (
        res.ranks.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("rank", 6).alias("rank"),
        )
    )


def q_link_spam_mass(spark, sf_dir):
    """Spam-mass estimate (Gyöngyi et al., TrustRank/spam mass): rank every
    vertex by uniform PageRank AND by trust-seeded personalized PageRank
    (teleport uniform over customer vertices — the 'manually vetted' set),
    then spam_mass = (pr − tr)/pr: the fraction of a vertex's rank NOT
    endorsed by the trusted region. Two 5-superstep runs over the SAME
    resting edge layout; the second run's teleport reuses ppr5's seed
    distribution."""
    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res_pr = pr.run(g, damping=0.85, tol=0.0, max_iter=5, check_every=5)
    cust = g.vertices.where(F.col("key").startswith("c"))
    n_c = cust.count()
    reset = cust.select("vid", F.lit(1.0 / n_c).alias("p"))
    res_tr = pr.run(
        g, damping=0.85, tol=0.0, max_iter=5, check_every=5, reset=reset
    )
    a = res_pr.ranks.select("vid", F.round("rank", 6).alias("pr"))
    b = res_tr.ranks.select("vid", F.round("rank", 6).alias("tr"))
    return (
        a.join(b, "vid")
        .join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            "pr",
            "tr",
            F.round((F.col("pr") - F.col("tr")) / F.col("pr"), 6).alias("spam_mass"),
        )
    )


def q_hits8(spark, sf_dir):
    """HITS hubs & authorities (beyond-reference link-graph extension): 8
    fixed mutual-reinforcement iterations, L1-normalized each half-step, on
    the customer→supplier bipartite graph (customers are pure hubs,
    suppliers pure authorities)."""
    from osmgraphing_spark.operators import hits as hits_op

    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res = hits_op.run(g, max_iter=8, tol=0.0)
    return (
        res.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )


def q_salsa8(spark, sf_dir):
    """SALSA (operators/salsa): 8 fixed degree-normalized walk iterations
    (auth ← hub/outdeg, hub ← auth/indeg), L1-normalized each half-step,
    on the customer→supplier bipartite graph — the TKC-resistant cousin of
    HITS and the ranker behind who-to-follow recommenders. Fixed
    iterations ⇒ exact chained-CTE replay oracle (mod 1e-6 rounding)."""
    from osmgraphing_spark.operators import salsa as salsa_op

    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res = salsa_op.run(g, max_iter=8, tol=0.0)
    return (
        res.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )


EIGEN_ITERS = 6


def q_eigen_links(spark, sf_dir):
    """Eigenvector centrality (operators/eigencentrality): EIGEN_ITERS
    fixed L1-normalized power iterations on the undirected view of the
    customer–supplier link graph — completes the link-analysis family
    (PageRank/PPR/HITS/Katz). Fixed iterations make the result an exact
    rational function of the adjacency, so the chained-CTE oracle replays
    it bit-for-bit (mod 1e-6 rounding)."""
    from osmgraphing_spark.operators import eigencentrality as eigen_op

    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res = eigen_op.run(g, max_iter=EIGEN_ITERS)
    return (
        res.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("score", 6).alias("score"),
        )
    )


def _eigen_sql(iters: int = EIGEN_ITERS) -> str:
    """DuckDB replica of eigencentrality.run(symmetrize=True): undirected
    A ∨ Aᵀ view, x0 = 1/|V|, per round one gather + an L1 window
    normalization (the _HITS_ITER pattern, single vector)."""
    parts = [
        "WITH e0 AS (" + SQL_BIPARTITE_EDGES + "),",
        "e AS (SELECT src, dst FROM e0 UNION "
        "SELECT dst AS src, src AS dst FROM e0),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "x0 AS (SELECT vid, CAST(1.0 AS DOUBLE)/(SELECT n FROM n) AS score FROM v)",
    ]
    tpl = """
    x{K} AS (
        SELECT vid, s / SUM(s) OVER () AS score FROM (
            SELECT v.vid, COALESCE(g.c, 0) AS s
            FROM v LEFT JOIN (
                SELECT e.dst AS vid, SUM(x{P}.score) AS c
                FROM e JOIN x{P} ON e.src = x{P}.vid GROUP BY e.dst
            ) g ON v.vid = g.vid
        )
    )"""
    for k in range(1, iters + 1):
        parts.append("," + tpl.format(K=k, P=k - 1))
    parts.append(
        f"SELECT vid AS node_id, ROUND(score, 6) AS score FROM x{iters}"
    )
    return "\n".join(parts)


def _bipartite_weighted_raw_edges(spark, sf_dir):
    """Same bipartite graph but weight = reference multiplicity (how many
    lineitems link the customer to the supplier)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
    )
    return pairs.select(
        F.format_string("c%09d", F.col("o_custkey")).alias("src_key"),
        F.format_string("s%09d", F.col("l_suppkey")).alias("dst_key"),
        F.col("w").cast("double").alias("weight"),
    )


def q_pagerank5_weighted(spark, sf_dir):
    """G7 weighted: contributions ∝ edge weight / Σ out-weights."""
    g = _cached_graph(spark, sf_dir, "bipartite_w", _bipartite_weighted_raw_edges, 8)
    res = pr.run(g, damping=0.85, tol=0.0, max_iter=5, check_every=5, weighted=True)
    return (
        res.ranks.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.round("rank", 6).alias("rank"),
        )
    )


def q_triangles_per_vertex_nations(spark, sf_dir):
    """G10 per-vertex variant on the nation co-region graph."""
    g = _cached_graph(spark, sf_dir, "nation", _nation_raw_edges, 4)
    out = _vid_to_nationkey(g, tri.per_vertex(g), ["vid"])
    return out.select(
        F.col("vid").alias("n_nationkey"), F.col("triangles").alias("triangles")
    )


def q_cc_nations(spark, sf_dir):
    """G8: connected components (small-star/large-star) on nation cliques."""
    g = _cached_graph(spark, sf_dir, "nation", _nation_raw_edges, 4)
    labels = cc_op.run(g)
    out = _vid_to_nationkey(g, labels, ["vid", "component"])
    return out.select(
        F.col("vid").alias("n_nationkey"), F.col("component").alias("component")
    )


MIS_ROUNDS = 3


def q_mis_nations(spark, sf_dir):
    """Luby maximal independent set (operators/mis) on the nation cliques:
    md5-priority rounds, each selected vertex tagged with its round. The
    chained-CTE oracle replays every round; vids are reproduced in SQL as
    the dense rank of the sorted vertex keys (the build contract)."""
    from osmgraphing_spark.operators import mis as mis_op

    g = _cached_graph(spark, sf_dir, "nation", _nation_raw_edges, 4)
    sel = mis_op.luby_mis(g, rounds=MIS_ROUNDS)
    out = _vid_to_nationkey(g, sel, ["vid"])
    return out.select(F.col("vid").alias("n_nationkey"), "rnd")


def q_lpa_nations(spark, sf_dir):
    """G9: 2 synchronous LPA supersteps, min-label ties."""
    g = _cached_graph(spark, sf_dir, "nation", _nation_raw_edges, 4)
    labels = lpa_op.run(g, max_iter=2)
    out = _vid_to_nationkey(g, labels, ["vid", "label"])
    return out.select(
        F.col("vid").alias("n_nationkey"), F.col("label").alias("label")
    )


def q_triangles_nations(spark, sf_dir):
    """G10: triangle count on the nation co-region graph."""
    g = _cached_graph(spark, sf_dir, "nation", _nation_raw_edges, 4)
    n = tri.count(g)
    return spark.createDataFrame([(n,)], "n_triangles bigint")


# ---------------------------------------------------------------------------
# relational operator queries (SURVEY §2.2-2.6)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """A2/A6/P2: grouped multi-aggregate with predicate."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_orders(spark, sf_dir):
    """O7: deterministic top-k (sort + cap)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


def q_normalize_qty(spark, sf_dir):
    """A3: normalize metric by its global mean (the reference's
    mean-normalization, building.rs:1410-1455)."""
    l = _t(spark, sf_dir, "lineitem")
    mean = l.agg(F.avg("l_quantity").alias("m"))
    return (
        l.crossJoin(F.broadcast(mean))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_quantity") / F.col("m"), 6).alias("qty_norm"),
        )
    )


def q_semi_join_customers(spark, sf_dir):
    """J1/S3: left-semi 'keep only referenced' join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


def q_anti_join_customers(spark, sf_dir):
    """J1 complement: drop referenced (unreachable-nodes analog)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_nationkey"
    )


def q_dedup_pairs(spark, sf_dir):
    """D3: distinct on a compound key."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


def q_clamped_discount(spark, sf_dir):
    """P7/F8: 1e-6 clamp + grid rounding per group."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.sum(F.greatest(F.col("l_discount"), F.lit(1e-6))), 6).alias(
            "sum_clamped_disc"
        )
    )


def q_order_ranks(spark, sf_dir):
    """O-window: deterministic ranking within partition."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))
    )


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_event_funnel(spark, sf_dir):
    """Ordered conversion funnel (operators/funnel.conversion_funnel):
    users whose first 'view' precedes a 'click' precedes a 'purchase'
    (each step strictly after the previous step's first qualifying time —
    first-touch semantics). Per-step user counts + conversion vs step 1;
    shuffles carry only per-user scalars."""
    from osmgraphing_spark.operators import funnel as funnel_op

    return funnel_op.conversion_funnel(
        _t(spark, sf_dir, "events"), FUNNEL_STEPS
    )


def q_sessionize_events(spark, sf_dir):
    """Sessionization (gap > 1800 s) via lag + running sum — the batch
    equivalent of the streaming session-window operator."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = _t(spark, sf_dir, "events")
    gaps = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w))
            / F.lit(1_000_000.0)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    return gaps.select(
        "event_id",
        "user_id",
        (F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "session_idx"
        ),
    )


def q_event_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, distinct
    actives per (cohort, day offset) — the classic engagement query. Two
    shuffles: the per-user min (algebraic) and the distinct-count rollup;
    the user→cohort join is on the grouped key, so it rides the first
    shuffle's partitioning."""
    ev = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def q_event_value_quantiles(spark, sf_dir):
    """Exact interpolated percentiles (p50/p95/p99) of event value per
    type — Spark's `percentile` and DuckDB's `quantile_cont` share the
    linear-interpolation definition, so the oracle hash-matches to 1e-6.
    At 100 TB the same query swaps in `percentile_approx` (t-digest,
    mergeable map-side); the exact tier is the oracle tier, same split as
    embed_topk vs embed_ann."""
    ev = _t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("qs"),
        F.count("*").alias("n_events"),
    )
    return q.select(
        "event_type",
        "n_events",
        F.round(F.element_at("qs", 1), 6).alias("p50"),
        F.round(F.element_at("qs", 2), 6).alias("p95"),
        F.round(F.element_at("qs", 3), 6).alias("p99"),
    )


def q_event_props_k(spark, sf_dir):
    """Semi-structured column handling: extract props.k from the JSON
    string per row (get_json_object — fused into the scan, no UDF) and
    aggregate per event type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k.cast("long")).alias("max_k"),
    )


def q_hourly_events(spark, sf_dir):
    """Time-bucketed aggregation (tumbling-window analog)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))


# ---------------------------------------------------------------------------
# documents: text analysis + dedup
# ---------------------------------------------------------------------------

def q_doc_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_ws_tokens"),
        X.bpe_ish_token_count(F.col("text")).alias("n_sub_tokens"),
    )


def q_doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(X.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        X.quality_score(F.col("text")).alias("quality"),
    )


def q_doc_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    normalized = F.array_join(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), " ")
    return d.select("doc_id", F.md5(normalized).alias("fp"))


def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition filter stats: duplicate-token fraction plus
    the most frequent bigram and its share of the document's bigrams."""
    d = _t(spark, sf_dir, "documents")
    stats = rep.top_ngram_stats(d, n=2)
    dup = d.select(
        "doc_id", X.dup_token_fraction(F.col("text")).alias("dup_tok_frac")
    )
    return dup.join(stats, "doc_id").select(
        "doc_id",
        "dup_tok_frac",
        "top_ngram",
        F.col("top_ngram_cnt").cast("long").alias("top_ngram_cnt"),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        "top_ngram_frac",
    )


def q_doc_pii(spark, sf_dir):
    """PII detection + redaction. The corpus carries no PII, so the query
    plants deterministic emails/IPs derived from doc_id (reproduced
    verbatim by the SQL oracle), then counts and masks them — verifying
    the scrubbing pass end to end, including the redacted bytes (md5)."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    email = F.concat(
        F.lit("user"), did, F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"), F.lit(".com "),
    )
    ip = F.concat(
        F.lit("10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
    )
    aug = F.concat(
        F.col("text"), F.lit(" "),
        F.repeat(email, (F.col("doc_id") % 3 + 1).cast("int")), ip,
    )
    return d.select(
        "doc_id",
        X.count_emails(aug).alias("n_emails"),
        X.count_ipv4(aug).alias("n_ipv4"),
        F.md5(X.redact_pii(aug)).alias("redacted_fp"),
    )


def q_media_image_stats(spark, sf_dir):
    """Multimodal image path, value-checked end to end: deterministic PPM
    payloads keyed on doc_id are ENCODED executor-side (mapInPandas), then
    decoded through the REAL lib-free P6 parser and reduced to per-channel
    means. The gradient pattern makes every output a closed-form integer
    average the SQL oracle reproduces — so the binary round-trip (header
    parse, raster reshape, channel split) is hash-verified, not just
    row-counted. Two chained mapInPandas stages, zero shuffle."""
    from osmgraphing_spark.functions import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.synth_images_from_ids(d, id_col="doc_id")
    return mm.image_stats(media, id_col="doc_id")


def q_media_audio_stats(spark, sf_dir):
    """Multimodal audio path: integer-sawtooth PCM16 WAVs encoded
    executor-side, decoded via the REAL stdlib ``wave`` parser, reduced to
    RMS / zero-crossing rate / duration. Pure integer signal ⇒ the oracle
    reproduces the DSP with no float-transcendental dialect risk."""
    from osmgraphing_spark.functions import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.synth_audio_from_ids(d, id_col="doc_id")
    return mm.audio_stats(media, id_col="doc_id")


def q_media_video_stats(spark, sf_dir):
    """Multimodal video path: structurally-valid MP4 skeletons encoded
    executor-side (closed-form duration/resolution/codec per doc_id),
    parsed through the REAL ISO-BMFF box walker (functions/multimodal
    .mp4_metadata) — duration, track count, resolution and codec are all
    hash-verified against the SQL oracle's arithmetic, proving the
    container parse, not just the plumbing."""
    from osmgraphing_spark.functions import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.synth_mp4_from_ids(d, id_col="doc_id")
    return mm.video_stats(media, id_col="doc_id")


def q_media_video_frames(spark, sf_dir):
    """Multimodal video FRAME path (the round-4 stub, closed): per doc_id
    a real MJPEG-in-MP4 is encoded executor-side (baseline-JPEG frames +
    actual stsz/stco sample tables), then video_frame_stats walks the
    container, slices each sample, and decodes it with the in-repo JPEG
    decoder — height/width/mean of every decoded frame hash-verified
    against the SQL oracle's closed forms (solid even-gray frames at
    quant=1 roundtrip exactly). H.264/AV1 remain the typed lib-bound
    refusal; the Spark plumbing is codec-independent."""
    from osmgraphing_spark.functions import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.synth_mjpeg_from_ids(d, id_col="doc_id")
    return mm.video_frame_stats(media, id_col="doc_id")


def q_media_image_dhash(spark, sf_dir):
    """Perceptual dHash, value-checked end to end: the deterministic
    gradient images (same closed forms as media_image_stats) are decoded
    through the REAL PPM parser and hashed by functions/multimodal
    .image_dhash; the oracle recomputes the 8×9 nearest-neighbor
    downsample, the row-gradient sign bits and the signed 32-bit packing
    arithmetically — comparing channel SUMS instead of means (division by
    3 is order-preserving), so the hash is bit-exact across engines."""
    from osmgraphing_spark.functions import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.synth_images_from_ids(d, id_col="doc_id")
    return mm.image_dhash(media, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "sig_hi", "sig_lo"
    )


def q_doc_exact_dups(spark, sf_dir):
    return dd.exact_duplicates(_t(spark, sf_dir, "documents"))


JACCARD_MAX_DF = 100  # hot-shingle cut: the df² pair-join term is the 100 TB killer


def q_doc_jaccard_pairs(spark, sf_dir):
    return dd.jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, n=3, max_df=JACCARD_MAX_DF
    )


def q_doc_prefix_jaccard(spark, sf_dir):
    """EXACT Jaccard ≥ 0.5 pairs via prefix filtering
    (operators/dedup.prefix_jaccard_pairs): the lossless scale path —
    rarest-first prefixes bound the candidate join so no max_df cut (and
    no recall loss) is needed. The oracle is the brute-force
    inverted-index join with NO frequency cut: values must match exactly
    because prefix filtering only prunes non-qualifying candidates."""
    return dd.prefix_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, n=3
    )


def q_doc_minhash(spark, sf_dir):
    return dd.minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=4, n=3)


def q_doc_lsh_candidates(spark, sf_dir):
    """MinHash-LSH candidate pairs (bands=2 over 4 hashes)."""
    return dd.lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=4, bands=2, n=3
    )


INCR_NEW_MOD = 10  # doc_id % 10 == 3 → the "this week's crawl" batch
INCR_NEW_REM = 3


def q_doc_incremental_dups(spark, sf_dir):
    """Incremental dedup (dedup.lsh_candidates_against): near-dup
    candidates of a NEW ingest batch against the EXISTING corpus — the
    production dedup shape at 100 TB (new ⨝ corpus buckets only; the
    corpus-internal quadratic term is never re-paid). Same portable
    MinHash family as doc_lsh_candidates, so persisted corpus signatures
    keep working across batches."""
    docs = _t(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % INCR_NEW_MOD) == INCR_NEW_REM
    return dd.lsh_candidates_against(
        docs.where(is_new), docs.where(~is_new), num_hashes=4, bands=2, n=3
    )


def q_doc_containment_pairs(spark, sf_dir):
    """Containment near-dups (dedup.containment_pairs): pairs where one
    doc's shingle set is ≥ 80% inside the other's — the
    long-doc-contains-short-doc case Jaccard structurally misses; same
    inverted-index + max_df discipline."""
    return dd.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, n=3, max_df=JACCARD_MAX_DF
    )


def q_doc_dup_clusters(spark, sf_dir):
    """Dedup ENDGAME: MinHash-LSH candidates (bands=2 over 4 hashes) →
    exact-Jaccard verification ≥ 0.5 → connected components over the
    verified pair graph (operators/cc.components_of_pairs, star
    contraction) → (id, cluster=min doc id of the group). Transitive:
    A≈B≈C clusters A,C together even when jaccard(A,C) < τ — the
    keep-one-per-cluster semantics of a production 100 TB dedup pass."""
    return dd.dup_clusters(
        _t(spark, sf_dir, "documents"), threshold=0.5, num_hashes=4, bands=2, n=3
    )


def q_doc_keep_best(spark, sf_dir):
    """Quality-aware dedup endgame (operators/dedup.keep_best_per_cluster):
    the same LSH → verify → connected-components clustering as
    doc_dup_clusters, but each cluster keeps its LONGEST member (n_chars,
    ties min id) instead of the arbitrary min-id one — dedup that never
    downgrades content. Integer score ⇒ the keep set is engine-exact."""
    docs = _t(spark, sf_dir, "documents")
    kept = dd.keep_best_per_cluster(
        docs, "n_chars", threshold=0.5, num_hashes=4, bands=2, n=3
    )
    return kept.select("doc_id", "n_chars")


SPAN_K = 8  # k-token window for substring-level dedup


def q_doc_dup_spans(spark, sf_dir):
    """Substring-level dedup (operators/spans.duplicated_spans): maximal
    spans of >= SPAN_K tokens shared verbatim by >= 2 documents — the
    passage/boilerplate tier whole-doc dedup misses. md5 window
    fingerprints keep the whole pipeline SQL-oracle-verifiable; the same
    max_df document-frequency cap as Jaccard guards the hot-boilerplate
    skew point."""
    from osmgraphing_spark.operators import spans as sp

    return sp.duplicated_spans(
        _t(spark, sf_dir, "documents"), k=SPAN_K, min_docs=2, max_df=JACCARD_MAX_DF
    )


BENCH_MOD = 50  # doc_id % 50 == 0 → the deterministic "benchmark" split


BLOOM_M, BLOOM_K = 39989, 7  # ≈9.6 bits/key at the sf0.01 benchmark size


def q_doc_bloom_decon(spark, sf_dir):
    """Bloom-gated decontamination (operators/bloom): the benchmark
    split's shingles compressed to a 39,989-bit filter (fixed state — the
    prefilter that still works when the exact shingle set outgrows a
    broadcast), corpus shingles probed map-side; per-doc counts of
    possibly-contaminated shingles. No false negatives, so
    n_bloom_hits = 0 proves a doc clean without the exact join; every
    filter word and probe is md5-derived and value-checked."""
    from osmgraphing_spark.operators import bloom
    from osmgraphing_spark.operators.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    bench_sh = (
        shingles(docs.where(F.col("doc_id") % BENCH_MOD == 0), n=3)
        .select("shingle")
        .distinct()
    )
    corpus_sh = shingles(docs.where(F.col("doc_id") % BENCH_MOD != 0), n=3)
    flt = bloom.bloom_build(bench_sh, "shingle", BLOOM_M, BLOOM_K)
    hits = bloom.bloom_hits(corpus_sh, "shingle", flt, BLOOM_M, BLOOM_K)
    return hits.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("sz"),
        F.sum(F.col("might_contain").cast("long")).alias("n_bloom_hits"),
    )


def q_doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/decontaminate): docs sharing
    ≥1 word-3-gram with the benchmark split (doc_id % 50 == 0), with hit
    counts and overlap fraction. The benchmark shingle set is BROADCAST —
    the corpus never shuffles for the membership test, the 100 TB-correct
    plan for a tiny-eval-set × huge-corpus join."""
    from osmgraphing_spark.operators import decontaminate as decon

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % BENCH_MOD != 0)
    return decon.contamination_stats(corpus, bench, n=3).select(
        F.col("id").alias("doc_id"), "sz", "n_hits", "overlap_frac"
    )


def q_doc_unigram_nll(spark, sf_dir):
    """CCNet-style unigram LM quality score (operators/termstats): mean
    −ln p(token) per doc under the corpus's own unigram distribution;
    vocabulary broadcast (Zipf ≪ corpus), scalar total via 1-row
    broadcast cross join — no collect in the plan."""
    from osmgraphing_spark.operators import termstats

    return termstats.unigram_logprob(_t(spark, sf_dir, "documents")).select(
        F.col("id").alias("doc_id"), "n_tokens", "avg_nll"
    )


def q_doc_tfidf_terms(spark, sf_dir):
    """Per-doc top-3 keywords by tf·idf (operators/termstats), ties broken
    by term — deterministic keyword extraction with the df table broadcast."""
    from osmgraphing_spark.operators import termstats

    return termstats.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3).select(
        F.col("id").alias("doc_id"), "term", "tf", "tfidf", F.col("rank").alias("rnk")
    )


def q_doc_bigram_nll(spark, sf_dir):
    """Bigram-LM fluency score (operators/termstats.bigram_logprob):
    mean −ln p(w₂|w₁) per doc under the corpus's own add-k smoothed
    bigram LM — word order now matters, unlike the unigram score."""
    from osmgraphing_spark.operators import termstats

    return termstats.bigram_logprob(
        _t(spark, sf_dir, "documents"), k=0.5
    ).select(F.col("id").alias("doc_id"), "n_bigrams", "avg_nll")


BPE_MERGES = 8


def q_doc_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (operators/bpe.train_bpe): the first 8
    merges learned from the corpus's own word histogram — each round one
    vocab-bounded pair count + a pure fold rewrite, ties broken
    lexicographically so the merge table is engine-reproducible. The
    oracle replays training round-for-round with sentinel-string
    replace()."""
    from osmgraphing_spark.operators import bpe as bpe_op

    merges = bpe_op.train_bpe(
        _t(spark, sf_dir, "documents"), merges=BPE_MERGES
    )
    return bpe_op.merges_df(spark, merges)


def q_doc_bpe_tokens(spark, sf_dir):
    """Per-document token counts under the trained BPE merges
    (operators/bpe.bpe_token_counts): the k-merge fold runs once per
    DISTINCT word, then broadcast-joins onto the exploded corpus."""
    from osmgraphing_spark.operators import bpe as bpe_op

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_op.train_bpe(docs, merges=BPE_MERGES)
    return bpe_op.bpe_token_counts(docs, merges).select(
        F.col("id").alias("doc_id"), "n_words", "n_tokens"
    )


def _bpe_train_ctes(rounds: int) -> str:
    """Shared chained-CTE replay of bpe.train_bpe on the documents word
    histogram: words as '<sym>'-wrapped strings; per round, adjacent-pair
    counts (LEAD over symbol positions, weighted by word freq), the
    (cnt DESC, lhs, rhs) winner, and a replace() application whose
    leftmost-nonoverlapping semantics equal the Spark fold's. CTEs are
    MATERIALIZED — inlining would re-expand each round's chain
    exponentially."""
    parts = [
        """wh AS MATERIALIZED (
            SELECT word, COUNT(*) AS freq FROM (
                SELECT unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) AS word
                FROM documents
            ) WHERE word <> '' AND regexp_matches(word, '^[a-z]+$')
            GROUP BY word
        ),
        w0 AS MATERIALIZED (
            SELECT word, freq,
                   regexp_replace(word, '(.)', '<\\1>', 'g') AS s
            FROM wh
        )"""
    ]
    round_tpl = """
        pc{r} AS MATERIALIZED (
            SELECT lhs, rhs, SUM(freq) AS cnt FROM (
                SELECT freq, sym AS lhs,
                       LEAD(sym) OVER (
                           PARTITION BY word ORDER BY ord
                       ) AS rhs
                FROM (
                    SELECT word, freq, unnest(syms) AS sym,
                           generate_subscripts(syms, 1) AS ord
                    FROM (
                        SELECT word, freq,
                               regexp_extract_all(s, '<([^>]*)>', 1) AS syms
                        FROM w{p}
                    )
                )
            ) WHERE rhs IS NOT NULL
            GROUP BY lhs, rhs
        ),
        t{r} AS MATERIALIZED (
            SELECT lhs, rhs, cnt FROM pc{r}
            ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
        ),
        w{r} AS MATERIALIZED (
            SELECT word, freq,
                   replace(s, '<' || t.lhs || '><' || t.rhs || '>',
                           '<' || t.lhs || t.rhs || '>') AS s
            FROM w{p}, t{r} t
        )"""
    for r in range(1, rounds + 1):
        parts.append(round_tpl.format(r=r, p=r - 1))
    return ",\n".join(parts)


def _bpe_merges_sql(rounds: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, lhs, rhs, lhs || rhs AS merged, cnt FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH " + _bpe_train_ctes(rounds)
        + f"""
        SELECT CAST(rank AS INTEGER) AS rank, lhs, rhs, merged,
               CAST(cnt AS BIGINT) AS pair_count
        FROM ({union})"""
    )


def _bpe_tokens_sql(rounds: int) -> str:
    return (
        "WITH " + _bpe_train_ctes(rounds)
        + f""",
        wtok AS MATERIALIZED (
            SELECT word,
                   length(s) - length(replace(s, '<', '')) AS n_tok
            FROM w{rounds}
        ),
        docw AS (
            SELECT doc_id, word FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) AS word
                FROM documents
            ) WHERE word <> '' AND regexp_matches(word, '^[a-z]+$')
        )
        SELECT d.doc_id, COUNT(*) AS n_words,
               CAST(SUM(w.n_tok) AS BIGINT) AS n_tokens
        FROM docw d JOIN wtok w USING (word)
        GROUP BY d.doc_id"""
    )


def q_doc_top_terms(spark, sf_dir):
    """Exact corpus-wide top-20 tokens (operators/heavyhitters.top_terms):
    the oracle tier of heavy hitters — algebraic groupBy, deterministic
    (cnt DESC, term ASC) tie-break."""
    from osmgraphing_spark.operators import heavyhitters as hh

    return hh.top_terms(_t(spark, sf_dir, "documents"), k=20).select(
        "term", "cnt", F.col("rank").alias("rnk")
    )


HEAVY_BIGRAM_MIN = 20


def q_doc_heavy_bigrams(spark, sf_dir):
    """Frequent bigrams via the 100 TB heavy-hitters path
    (operators/heavyhitters.frequent_terms): count-min sketch pass →
    no-false-negative candidate cut (per-occurrence broadcast lookups, the
    bigram vocabulary never shuffles) → exact verify over candidates only.
    The oracle is the trivially-correct full GROUP BY ... HAVING — the
    sketch composition must reproduce it exactly."""
    from osmgraphing_spark.operators import heavyhitters as hh

    return hh.frequent_terms(
        _t(spark, sf_dir, "documents"),
        min_count=HEAVY_BIGRAM_MIN,
        depth=4,
        width=2048,
        n=2,
    )


def q_doc_cms_sketch(spark, sf_dir):
    """The count-min sketch itself (depth=3, width=256) over the token
    stream — every cell value-checked: the portable md5 double-hash family
    (shared with MinHash) lets DuckDB rebuild the identical sketch."""
    from osmgraphing_spark.operators import heavyhitters as hh

    return hh.cms_sketch(
        _t(spark, sf_dir, "documents"), depth=3, width=256
    ).select(F.col("r").cast("int").alias("r"), F.col("c").alias("c"), "cnt")


def q_doc_distinct_tokens(spark, sf_dir):
    """Approximate distinct-token count per source (operators/cardinality):
    mergeable HyperLogLog, 2^8 registers per source — the COUNT(DISTINCT)
    replacement that survives 100 TB (fixed sketch state, one algebraic
    groupBy, registers merge by max across shards/days). Portable md5
    registers + an integer-exact register sum make both the sketch AND the
    in-plan estimate value-checkable against the SQL oracle."""
    from osmgraphing_spark.operators import cardinality as card
    from osmgraphing_spark.operators.heavyhitters import terms_of

    toks = terms_of(
        _t(spark, sf_dir, "documents"), n=1, id_col="source"
    )
    est = card.approx_distinct(toks, "term", log2m=8, by=["id"])
    return est.select(F.col("id").alias("source"), "nnz", "approx_distinct")


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic per-language quota sample (operators/sampling
    .stratified_sample): exactly min(20, |stratum|) docs per lang, the k
    smallest portable-md5 hashes of doc_id within each stratum — the
    training-mixture balancing primitive, value-checked because membership
    is a pure hash function (df.sampleBy is not reproducible)."""
    from osmgraphing_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_sample(docs, ["lang"], 20, key_cols=["doc_id"])


def q_doc_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subsample (operators/sampling
    .weighted_sample): Efraimidis-Spirakis exponential race over portable
    md5 uniforms, weight = n_chars — inclusion ∝ weight, WITHOUT
    replacement, deterministic across engines (the race key is rounded to
    9 decimals and is itself the cross-engine contract). Compiles to
    TakeOrderedAndProject — no full sort at any scale."""
    from osmgraphing_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample(docs, 25, "n_chars", key_cols=["doc_id"])


def q_doc_nb_lang(spark, sf_dir):
    """In-engine Naive Bayes (operators/nbayes): train a multinomial NB
    on the corpus's own lang labels, classify every document — the
    pipeline-labeling primitive (source/domain tagging). Pure counting +
    broadcast model table; training AND scoring replayed value-for-value
    by the oracle."""
    from osmgraphing_spark.operators import nbayes

    docs = _t(spark, sf_dir, "documents")
    priors, lik = nbayes.train_nb(docs, "lang")
    return nbayes.classify_nb(docs, priors, lik)


BM25_QUERIES = [(0, "sort merge join"), (1, "window agg scan"), (2, "customer data")]
BM25_TOPK = 10


def q_doc_bm25_topk(spark, sf_dir):
    """BM25 top-10 per seed query (operators/retrieval): postings built
    in one corpus pass, df/N/avgdl broadcast, query terms broadcast onto
    the postings — the corpus shuffles once regardless of query count.
    Lucene idf variant; scores and ranks value-checked."""
    from osmgraphing_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(BM25_QUERIES, "query_id long, text string")
    return retrieval.bm25_topk(docs, qdf, k=BM25_TOPK)


HYBRID_N_QUERIES = 3
HYBRID_TOPK = 10
HYBRID_RRF_K = 60


def q_doc_hybrid_topk(spark, sf_dir):
    """Hybrid related-document retrieval (operators/retrieval.rrf_fuse):
    reciprocal-rank fusion of (a) BM25 with each query document's own
    text as the query and (b) exact embedding-cosine neighbors of the
    same document (vec_id aligned to doc_id) — the modern lexical ⊕
    semantic combiner, rank-based so the two score scales never need
    calibration. Both rankings and the fused top-10 value-checked."""
    from osmgraphing_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    qdocs = docs.where(F.col("doc_id") < HYBRID_N_QUERIES)
    lex = retrieval.bm25_topk(
        docs, qdocs.select(F.col("doc_id").alias("query_id"), "text"),
        k=HYBRID_TOPK,
    )
    emb = _t(spark, sf_dir, "embeddings").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem = sim.brute_force_topk(
        emb, emb.where(F.col("vec_id") < HYBRID_N_QUERIES), k=HYBRID_TOPK
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rk")
    return retrieval.rrf_fuse(
        lex.select("query_id", "doc_id", "rk"), sem,
        k=HYBRID_RRF_K, topn=HYBRID_TOPK,
    )


DSIR_N = 25
DSIR_K = 0.5


def q_doc_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (operators/dsir): target LM = the
    English subset, raw LM = the whole corpus; per-doc log ratio under
    add-k smoothed unigram LMs, then Gumbel-top-n (md5 uniforms, log
    space — overflow-free) selects the sample ∝ importance weight.
    Weights AND the selected set are replayed value-for-value by the
    oracle."""
    from osmgraphing_spark.operators import dsir

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return (
        dsir.dsir_sample(docs, target, n=DSIR_N, k=DSIR_K)
        .select(F.col("id").alias("doc_id"), "n_tokens", "log_ratio", "gumbel")
    )


WINNOW_W = 4


def q_doc_winnow(spark, sf_dir):
    """Winnowing fingerprint selection (operators/spans
    .winnowed_fingerprints, the MOSS algorithm): per-doc window-min over
    the k-gram hash stream — expected density 2/(w+1) with the
    shared-substring guarantee intact. The selected set is
    value-checked fingerprint-for-fingerprint."""
    from osmgraphing_spark.operators.spans import winnowed_fingerprints

    return winnowed_fingerprints(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        k=SPAN_K, w=WINNOW_W,
    )


def q_doc_scrub_spans(spark, sf_dir):
    """Span scrubbing (operators/spans.scrub_duplicated_spans): cut every
    cross-document duplicated k-token span out of the text — the
    RefinedWeb-style boilerplate remover. Output carries before/after
    token counts and the md5 of the scrubbed text so the full rewrite is
    value-checked compactly."""
    from osmgraphing_spark.operators.spans import scrub_duplicated_spans

    out = scrub_duplicated_spans(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        k=SPAN_K, min_docs=2, max_df=JACCARD_MAX_DF,
    )
    return out.select(
        "doc_id", "n_tokens_before", "n_tokens_after",
        F.md5("text").alias("scrubbed_digest"),
    )


CHUNK_WINDOW = 24
CHUNK_STRIDE = 16


def q_doc_chunks(spark, sf_dir):
    """Long-context chunking (operators/packing.chunk_documents): token
    sliding windows (window 24, stride 16) — zero-shuffle column
    expressions fused into the corpus scan; chunk ids, token counts and
    chunk text value-checked."""
    from osmgraphing_spark.operators.packing import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"),
        window=CHUNK_WINDOW, stride=CHUNK_STRIDE,
    )


PACK_CAPACITY = 512
PACK_SHARDS = 8
PACK_SEED = 1
MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def q_doc_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle (operators/packing.epoch_shuffle):
    shard + within-shard position as a pure function of (seed, doc_id) via
    the portable md5 hash — the reproducible data-loader order primitive
    (df.orderBy(rand(seed)) changes with partitioning; this never does)."""
    from osmgraphing_spark.operators import packing

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return packing.epoch_shuffle(
        docs, seed=PACK_SEED, n_shards=PACK_SHARDS, key_cols=["doc_id"]
    ).select("doc_id", "shard", "pos")


def q_doc_pack_sequences(spark, sf_dir):
    """Greedy next-fit sequence packing (operators/packing.pack_sequences):
    documents in epoch-shard order are packed into fixed-capacity token
    sequences; every bin boundary is value-checked by a recursive-CTE
    replay of the same next-fit state machine."""
    from osmgraphing_spark.operators import packing

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_toks")
    )
    return packing.pack_sequences(
        docs,
        capacity=PACK_CAPACITY,
        seed=PACK_SEED,
        n_shards=PACK_SHARDS,
        id_col="doc_id",
        tokens_col="n_toks",
    )


def q_doc_mixture_sample(spark, sf_dir):
    """Training-mixture sampling (operators/sampling.mixture_sample):
    per-source keep rates as a pure hash function of doc_id — map-only,
    reproducible across engines, value-checked (sources outside the
    mixture are dropped)."""
    from osmgraphing_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.mixture_sample(
        docs, MIXTURE_WEIGHTS, "source", key_cols=["doc_id"]
    )


SIMHASH_MAX_HAMMING = 3  # 4 chunks × 16 bits: the scale-sane blocking width


def q_doc_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. Portable md5-derived token hashes + the
    signature carried as two 32-bit halves make the WHOLE pipeline —
    signatures, chunk blocking, Hamming verify — reproducible in DuckDB,
    so this is now value-checked (round 1 was rows-only)."""
    return dd.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------

def q_embed_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.brute_force_topk(emb, queries, k=5).select(
        "query_id",
        "neighbor_id",
        F.round("score", 4).alias("score"),
        "rk",
    )


ANN_DIM = 64  # embeddings.embedding width in the driver test tables


def q_embed_ivf(spark, sf_dir):
    """IVF ANN: data-independent integer centroids (random-projection
    coarse quantizer) → exact-integer cell argmax → nprobe probing → exact
    cosine re-score of probed cells only. Whole pipeline SQL-reproducible,
    so cells, candidate sets and top-k are value-checked."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ivf_topk_portable(emb, queries, dim=ANN_DIM, k=5, n_cells=8, nprobe=3)


KMEANS_K = 6
KMEANS_ITERS = 2


def q_embed_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means (operators/kmeans): exact-integer-grid
    centroids and means make every iteration — and therefore the final
    (cell, dist) assignment — bit-reproducible in DuckDB; the oracle
    replays both update rounds and the final assignment value-for-value."""
    from osmgraphing_spark.operators import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans.lloyd_kmeans(
        emb, dim=ANN_DIM, k=KMEANS_K, iters=KMEANS_ITERS
    )
    return assigned


TRIPLET_NEG_MAX = 0.25  # hard negatives: closest vectors still below this


def q_embed_triplets(spark, sf_dir):
    """Contrastive triplet mining (operators/similarity
    .contrastive_triplets): per anchor the nearest non-self positive and
    the hardest negative (highest cosine still < TRIPLET_NEG_MAX) — the
    training-pair generator for embedding models. Exact tier (anchors
    broadcast); value-checked."""
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 10)
    return sim.contrastive_triplets(emb, anchors, neg_max=TRIPLET_NEG_MAX)


SEMDEDUP_TAU = 0.40  # this corpus's near-dup band (max cosine ≈ 0.51)


def q_embed_semdedup(spark, sf_dir):
    """SemDeDup pairs (operators/semdedup.semantic_pairs): exact-integer
    k-means cells (same replayable Lloyd as `embed_kmeans`) → within-cell
    cosine ≥ τ. The V² cosine join becomes per-cell joins; the oracle
    replays clustering and scores value-for-value."""
    from osmgraphing_spark.operators import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    return semdedup.semantic_pairs(
        emb, dim=ANN_DIM, k=KMEANS_K, iters=KMEANS_ITERS, threshold=SEMDEDUP_TAU
    )


PQ_M = 2       # subspaces (dsub = ANN_DIM / PQ_M = 32)
PQ_K = 4       # cells per subspace codebook
PQ_ITERS = 2   # Lloyd rounds per subspace (replayed by the oracle)


def q_embed_pq(spark, sf_dir):
    """Product-quantization codes (operators/pq): per-subspace
    exact-integer Lloyd codebooks (one corpus pass per iteration for ALL
    subspaces), then the (vec_id, sub, cell, dist) code table. The whole
    pipeline — init codebooks, both update rounds per subspace, final
    assignment — is bit-reproducible in DuckDB, so codes AND distances
    are value-checked."""
    from osmgraphing_spark.operators import pq

    emb = _t(spark, sf_dir, "embeddings")
    books = pq.train_pq(emb, dim=ANN_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    return pq.pq_encode(emb, books)


def q_embed_pq_topk(spark, sf_dir):
    """ADC top-5 per query over PQ codes (operators/pq.pq_topk): distances
    come from the broadcast (query × sub × cell) lookup table joined to
    the code table — raw database vectors are never re-read. Exact
    integers end to end; value-checked against a full SQL replay."""
    from osmgraphing_spark.operators import pq

    emb = _t(spark, sf_dir, "embeddings")
    books = pq.train_pq(emb, dim=ANN_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    queries = emb.where(F.col("vec_id") < 10)
    return pq.pq_topk(emb, queries, books, k=5)


def q_embed_ann(spark, sf_dir):
    """LSH-bucketed ANN via the portable integer-quantized hyperplanes: the
    candidate set (and hence the exact top-k) is SQL-reproducible, so this
    is value-checked end to end (round 1's float-hyperplane variant was
    rows-only; it remains as sim.ann_topk with a pytest recall gate)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ann_topk_portable(emb, queries, dim=ANN_DIM, k=5)


def q_embed_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup PAIRS corpus-wide (dedup tier, not the
    query-set ANN): LSH-bucket self-join candidates → exact cosine ≥
    NEAR_DUP_THRESHOLD (this corpus has no true near-dups — max cosine
    ≈ 0.51 — so the dedup threshold sits where the pair set is non-empty
    at every SF; at production thresholds the same plan returns the empty
    set). 4 planes × 8 tables favors recall; candidates stay bucket-bound
    either way. Value-checked: buckets are exact int64 both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.near_dup_pairs(
        emb,
        dim=ANN_DIM,
        threshold=NEAR_DUP_THRESHOLD,
        n_planes=NEAR_DUP_PLANES,
        n_tables=NEAR_DUP_TABLES,
    )


# ---------------------------------------------------------------------------
# SSSP + multi-metric queries
# ---------------------------------------------------------------------------

SSSP_SOURCES = (0, 7, 13)


def _nation_weighted_raw_edges(spark, sf_dir):
    """Co-region nation digraph with deterministic non-uniform weights
    w = 1 + ((7a + b) mod 5): weighted shortest paths are genuinely
    multi-hop inside each region clique (a direct w=5 edge loses to a
    two-hop w=1+1 detour), so the relax loop is actually exercised."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r"))
    e = a.join(b, "r").where(F.col("a") != F.col("b"))
    return e.select(
        F.format_string("n%03d", F.col("a")).alias("src_key"),
        F.format_string("n%03d", F.col("b")).alias("dst_key"),
        (F.lit(1.0) + (F.col("a") * 7 + F.col("b")) % 5).cast("double").alias("weight"),
    )


def q_link_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound (operators/graphstats
    .double_sweep_diameter): weighted SSSP from the min vertex, again from
    the farthest vertex reached — the iFUB seed bound (Crescenzi et al.),
    here on the weighted nation co-region digraph (the bound covers the
    start's reachable set, i.e. its region clique). Two BSP sweeps, O(1)
    driver state, start/far reported as nationkeys."""
    from osmgraphing_spark.operators import graphstats as gs

    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    res = gs.double_sweep_diameter(g, weighted=True)
    out = _vid_to_nationkey(g, res, ["start", "far"])
    return out.select(
        F.col("start").cast("int").alias("start"),
        F.round("ecc_start", 6).alias("ecc_start"),
        F.col("far").cast("int").alias("far"),
        F.round("diameter_lb", 6).alias("diameter_lb"),
    )


def q_sssp_nations(spark, sf_dir):
    """O6/G1 capability analogue: multi-source BSP Bellman-Ford shortest
    paths (operators/sssp.py) on the weighted nation digraph; unreachable
    pairs absent."""
    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    keys = [f"n{s:03d}" for s in SSSP_SOURCES]
    vids = {
        r["key"]: r["vid"]
        for r in g.vertices.where(F.col("key").isin(keys)).collect()
    }
    res = sssp_op.run(g, sources=[vids[k] for k in keys if k in vids], weighted=True)
    out = _vid_to_nationkey(g, res, ["source", "vid"])
    return out.select(
        F.col("source").cast("int").alias("source"),
        F.col("vid").cast("int").alias("n_nationkey"),
        F.round("dist", 6).alias("dist"),
    )


def q_ch_routes_nations(spark, sf_dir):
    """G2 for REAL (operators/ch.py): contract the weighted nation
    digraph (parallel independent-set contraction, witness-free
    shortcuts), then answer batched point queries with the bidirectional
    upward-BSP CH search — sources = SSSP_SOURCES, targets = every other
    nation. The oracle is plain recursive-CTE shortest paths: CH preserves
    distances exactly, so agreement validates the whole
    construction + query stack, not just the sweep."""
    from osmgraphing_spark.operators import ch as ch_op

    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    ch_e, lv = ch_op.contract_graph(
        g.edges.select("src", "dst", F.col("weight").alias("w"))
    )
    keys = [f"n{s:03d}" for s in SSSP_SOURCES]
    vids = {
        r["key"]: r["vid"]
        for r in g.vertices.where(F.col("key").isin(keys)).collect()
    }
    pairs = (
        spark.createDataFrame(
            [(vids[k],) for k in keys if k in vids], "src long"
        )
        .crossJoin(g.vertices.select(F.col("vid").alias("dst")))
        .where(F.col("src") != F.col("dst"))
    )
    res = ch_op.ch_route_costs(ch_e, lv, pairs)
    out = _vid_to_nationkey(g, res, ["src", "dst"])
    return out.select(
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
        F.round("cost", 6).alias("cost"),
    )


LANDMARKS = (0, 4, 9, 14, 21)


def q_link_landmark_est(spark, sf_dir):
    """Landmark distance oracle (operators/sssp.landmark_estimates): a
    k-landmark sketch (2 BSP runs, O(k·|V|) rows) answers every ordered
    (src, dst) query as min_l d(src→l) + d(l→dst) — the upper-bound
    distance sketch web-scale graphs use instead of per-query traversals.
    Directed-correct: d(src→l) comes from the REVERSED-view run."""
    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    keys = [f"n{s:03d}" for s in LANDMARKS]
    vids = {
        r["key"]: r["vid"]
        for r in g.vertices.where(F.col("key").isin(keys)).collect()
    }
    lms = [vids[k] for k in keys if k in vids]
    va = g.vertices.select(F.col("vid").alias("src"))
    vb = g.vertices.select(F.col("vid").alias("dst"))
    pairs = va.crossJoin(vb).where(F.col("src") != F.col("dst"))
    res = sssp_op.landmark_estimates(g, lms, pairs, weighted=True)
    out = _vid_to_nationkey(g, res, ["src", "dst"])
    return out.select(
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
        "est_dist",
    )


def q_link_partition_stats(spark, sf_dir):
    """Capacity-planning diagnostics (operators/graphstats.partition_stats)
    for an 8-partition hash(src) layout of the customer→supplier link
    graph: per-partition edge/vertex balance, largest unsplittable
    single-source block, and the dst-side cut volume a gather superstep
    would shuffle. Portable md5 bucket, so the whole report is
    value-checked."""
    from osmgraphing_spark.operators import graphstats

    e = _bipartite_raw_edges(spark, sf_dir).select(
        _key_to_node_id(F.col("src_key")).alias("src"),
        _key_to_node_id(F.col("dst_key")).alias("dst"),
    )
    return graphstats.partition_stats(e, num_partitions=8)


def _nation_bowtie_edges(spark, sf_dir):
    """Bowtie fixture digraph over the nation table: per-region sorted
    chains; region 2's chain closes into a ring (the CORE SCC); spine
    r0.min→r1.min→r2.min feeds the core and r2.min→r3.min drains it; a
    tube edge r1.max→r3.min bypasses the core; region 4 is left unwired
    (a separate weak component). Every bowtie region except OTHER is
    non-empty: CORE=r2, IN={r0.min, r1.min}, OUT=r3, TUBE=r1∖min,
    TENDRIL=r0∖min, DISC=r4."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    chain = n.select(
        F.col("n_nationkey").alias("src"),
        F.lead("n_nationkey").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    reg = n.groupBy("n_regionkey").agg(
        F.min("n_nationkey").alias("mn"), F.max("n_nationkey").alias("mx")
    )
    ring = reg.where(F.col("n_regionkey") == 2).select(
        F.col("mx").alias("src"), F.col("mn").alias("dst")
    )
    a = reg.select(
        F.col("n_regionkey").alias("ra"),
        F.col("mn").alias("mna"), F.col("mx").alias("mxa"),
    )
    b = reg.select(F.col("n_regionkey").alias("rb"), F.col("mn").alias("mnb"))
    spine = (
        a.join(b, (F.col("rb") == F.col("ra") + 1) & (F.col("ra") < 3))
        .select(F.col("mna").alias("src"), F.col("mnb").alias("dst"))
    )
    tube = (
        a.join(b, (F.col("ra") == 1) & (F.col("rb") == 3))
        .select(F.col("mxa").alias("src"), F.col("mnb").alias("dst"))
    )
    return (
        chain.unionByName(ring).unionByName(spine).unionByName(tube).distinct()
    )


def q_link_bowtie(spark, sf_dir):
    """Broder bowtie decomposition (operators/graphstats.bowtie): CORE /
    IN / OUT / TUBE / TENDRIL / OTHER / DISC per vertex — the canonical
    'graph structure in the Web' readout, composed from the engine's SCC,
    frame-seeded BFS, and CC primitives."""
    from osmgraphing_spark.operators import graphstats

    res = graphstats.bowtie(_nation_bowtie_edges(spark, sf_dir))
    return res.select(
        F.col("vid").cast("int").alias("n_nationkey"), "region"
    )


EGO_SEED = 1  # custkey 1 exists at every SF
EGO_K = 2


def q_link_ego_net(spark, sf_dir):
    """k-hop ego-net extraction (operators/neighborhood.ego_net): the
    induced subgraph on the 2-hop undirected ball around customer 1 —
    bounded-cost hub forensics (k BFS rounds with a delta frontier, two
    ball-keyed joins; the corpus edge table is scanned once)."""
    from osmgraphing_spark.operators import neighborhood

    e = _bipartite_raw_edges(spark, sf_dir).select(
        _key_to_node_id(F.col("src_key")).alias("src"),
        _key_to_node_id(F.col("dst_key")).alias("dst"),
    )
    net = neighborhood.ego_net(e, [EGO_SEED], EGO_K, direction="both")
    return net.select(
        "src", "dst",
        F.col("src_hops").cast("int").alias("src_hops"),
        F.col("dst_hops").cast("int").alias("dst_hops"),
    )


TEMP_BUDGET = 200


def q_doc_temp_mixture(spark, sf_dir):
    """α-temperature mixture rebalancing (operators/sampling.
    temperature_sample, α = 0.5): sampling mass ∝ √n_lang flattens the
    English head and upweights tail languages — the multilingual
    rebalancing rule of large-LM pipelines, computed fully in-plan on an
    integer weight grid so the keep set is engine-reproducible."""
    from osmgraphing_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sampling.temperature_sample(
        docs, "lang", budget=TEMP_BUDGET, alpha=0.5, key_cols=["doc_id"]
    )
    return out.select("doc_id", "lang")


RAKE_ROUNDS = 3


def q_doc_rake_weights(spark, sf_dir):
    """Two-margin mixture raking (operators/raking.rake_cells): IPF over
    the (lang × source) joint with uniform targets on BOTH margins —
    equal mass per language AND per source simultaneously, which no
    single-margin temperature scaling can hit. Corpus touched once
    (the cell count); the bounded cell matrix rakes driver-side and the
    per-document weight broadcasts back. Cell masses and weights after
    RAKE_ROUNDS rounds are value-checked against an unrolled SQL replay."""
    from osmgraphing_spark.operators import raking

    docs = _t(spark, sf_dir, "documents").select("lang", "source")
    cells = raking.rake_cells(docs, "lang", "source", rounds=RAKE_ROUNDS)
    return cells.select(
        "lang",
        "source",
        "n",
        F.round("mass", 6).alias("mass"),
        F.round("weight", 6).alias("weight"),
    )


LR_ITERS = 4
LR_RATE = 1.0
#: the "curated seed" sources the classifier learns to recognize (GPT-3
#: App. A shape: seed-vs-crawl logistic filter)
LR_SEED_SOURCES = ("src0", "src1")


def q_doc_lr_quality(spark, sf_dir):
    """GPT-3-style quality classifier (operators/logreg): logistic
    regression trained IN-ENGINE (full-batch GD, LR_ITERS fixed steps,
    one map-side-combinable aggregate per step over a persisted slim
    feature frame) to separate the curated seed sources from the rest of
    the corpus on three text features (length factor, punct ratio,
    stopword ratio). Scoring is a pure column expression. Training AND
    every document's score are value-checked against an unrolled SQL
    replay of the same gradient descent."""
    from osmgraphing_spark.functions import text as tf
    from osmgraphing_spark.operators import logreg

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    feats = docs.select(
        "doc_id",
        F.least(tf.token_count(t).cast("double") / 100.0, F.lit(1.0)).alias(
            "x_len"
        ),
        tf.punct_ratio(t).alias("x_punct"),
        tf.stopword_ratio(t).alias("x_stop"),
        F.col("source").isin(*LR_SEED_SOURCES).cast("long").alias("is_seed"),
    )
    cols = ["x_len", "x_punct", "x_stop"]
    w = logreg.train(feats, cols, "is_seed", lr=LR_RATE, iters=LR_ITERS)
    return feats.select(
        "doc_id",
        F.round(logreg.score(cols, w), 6).alias("lr_score"),
        "is_seed",
    )


def q_doc_train_split(spark, sf_dir):
    """Leakage-safe train/val/test split (operators/sampling.
    leakage_safe_split): near-dup clusters (same pipeline as
    doc_dup_clusters) are the split groups, so a document and its
    near-duplicates can never straddle train and eval; singletons group as
    themselves. Deterministic md5 bucketing keeps a group's split stable
    as the corpus grows."""
    from osmgraphing_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    clusters = dd.dup_clusters(docs, threshold=0.5, num_hashes=4, bands=2, n=3)
    grouped = (
        docs.select("doc_id")
        .join(clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("cluster", "doc_id").alias("grp"))
    )
    return sampling.leakage_safe_split(
        grouped, {"train": 0.9, "val": 0.05, "test": 0.05}, "grp"
    )


def q_harmonic_nations(spark, sf_dir):
    """Inbound harmonic centrality (operators/sssp.harmonic_centrality):
    Σ 1/d(s,v) over weighted shortest paths on the nation digraph, every
    vertex a source (exact mode; at scale: landmark sample). One
    multi-source BSP run + one aggregate."""
    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    res = sssp_op.harmonic_centrality(g, weighted=True)
    out = _vid_to_nationkey(g, res, ["vid"])
    return out.select(
        F.col("vid").cast("int").alias("n_nationkey"), "harmonic"
    )


MATCHING_ORACLE_ROUNDS = 3  # fixpoint needs 2 on this graph; +1 idempotent


def q_matching_nations(spark, sf_dir):
    """Maximal matching (operators/matching: deterministic handshake
    rounds — Luby on the line graph, portable md5 edge priorities) on the
    nation co-region graph. The chained-CTE oracle replays every round
    value-for-value (priorities, per-vertex minima, mutual picks,
    removals), one spare round past the fixpoint (idempotent)."""
    from osmgraphing_spark.operators import matching as matching_op

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r"))
    e = (
        a.join(b, "r")
        .where(F.col("a") != F.col("b"))
        .select(
            F.col("a").cast("long").alias("src"),
            F.col("b").cast("long").alias("dst"),
        )
    )
    m = matching_op.maximal_matching(e, max_rounds=MATCHING_ORACLE_ROUNDS)
    return m.select(
        F.col("u").cast("int").alias("u"), F.col("v").cast("int").alias("v")
    )


def _matching_sql(rounds: int) -> str:
    """Chained-CTE replay of matching._matching_loop on the nation
    co-region graph: per round, md5(u|v|round) edge priorities, each
    vertex's (p, u, v)-minimum incident edge, mutual picks matched, their
    endpoints' edges removed."""
    ctes = [
        """live0 AS (
            SELECT LEAST(x.n_nationkey, y.n_nationkey) AS u,
                   GREATEST(x.n_nationkey, y.n_nationkey) AS v
            FROM nation x JOIN nation y
              ON x.n_regionkey = y.n_regionkey
             AND x.n_nationkey <> y.n_nationkey
            GROUP BY 1, 2
        )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""p{r} AS (
            SELECT u, v,
                   CAST(concat('0x', substr(md5(
                        CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)
                        || '|' || '{r}'), 1, 14)) AS BIGINT) AS p
            FROM live{r - 1}
        ),
        both{r} AS (
            SELECT u AS vtx, u, v, p FROM p{r}
            UNION ALL
            SELECT v AS vtx, u, v, p FROM p{r}
        ),
        pick{r} AS (
            SELECT vtx, u, v FROM (
                SELECT vtx, u, v,
                       ROW_NUMBER() OVER (
                           PARTITION BY vtx ORDER BY p, u, v
                       ) AS rn
                FROM both{r}
            ) WHERE rn = 1
        ),
        m{r} AS (
            SELECT u, v FROM pick{r} GROUP BY u, v HAVING COUNT(*) = 2
        ),
        dead{r} AS (
            SELECT u AS x FROM m{r} UNION SELECT v AS x FROM m{r}
        ),
        live{r} AS (
            SELECT u, v FROM live{r - 1}
            WHERE u NOT IN (SELECT x FROM dead{r})
              AND v NOT IN (SELECT x FROM dead{r})
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT u, v FROM m{r}" for r in range(1, rounds + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(u AS INTEGER) AS u, CAST(v AS INTEGER) AS v "
        f"FROM ({union})"
    )


COLORING_ORACLE_ROUNDS = 6  # 5-clique regions need 5 JP rounds; +1 idempotent


def q_coloring_nations(spark, sf_dir):
    """Greedy coloring (operators/coloring: Jones-Plassmann — each round
    the uncolored md5-priority local maxima take the smallest color
    absent from their colored neighborhood) on the nation co-region
    graph: five 5-cliques, so exactly 5 colors and one vertex colored
    per clique per round. The chained-CTE oracle replays every round
    value-for-value."""
    from osmgraphing_spark.operators import coloring as coloring_op

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r"))
    e = (
        a.join(b, "r")
        .where(F.col("a") != F.col("b"))
        .select(
            F.col("a").cast("long").alias("src"),
            F.col("b").cast("long").alias("dst"),
        )
    )
    c = coloring_op.greedy_coloring(e, max_rounds=COLORING_ORACLE_ROUNDS)
    return c.select(F.col("vid").cast("int").alias("n_nationkey"), "color")


def _coloring_sql(rounds: int) -> str:
    """Chained-CTE replay of coloring._jp_loop on the nation co-region
    graph: per round, winners are the uncolored vertices whose
    md5(vid)|lpad(vid) key beats every uncolored neighbor's; each winner
    takes MIN(g) over 1..26 not already used by a colored neighbor
    (26 > |V|, so it always exceeds any neighborhood color count —
    the same first-missing the Spark side's sequence(1,size+1) scan
    finds)."""
    ctes = [
        """e0 AS MATERIALIZED (
            SELECT x.n_nationkey AS src, y.n_nationkey AS dst
            FROM nation x JOIN nation y
              ON x.n_regionkey = y.n_regionkey
             AND x.n_nationkey <> y.n_nationkey
        ),
        k AS MATERIALIZED (
            SELECT n_nationkey AS vid,
                   md5(CAST(n_nationkey AS VARCHAR)) || '|' ||
                   lpad(CAST(n_nationkey AS VARCHAR), 12, '0') AS key
            FROM nation
        ),
        unc0 AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e0),
        col0 AS MATERIALIZED (SELECT NULL::INT AS vid, NULL::INT AS color WHERE FALSE)"""
    ]
    round_tpl = """
        win{r} AS MATERIALIZED (
            SELECT u.vid
            FROM unc{p} u JOIN k ON k.vid = u.vid
            LEFT JOIN (
                SELECT e.src AS vid, MAX(kd.key) AS nmax
                FROM e0 e JOIN kd_unc{p} kd ON kd.vid = e.dst
                WHERE e.src IN (SELECT vid FROM unc{p})
                GROUP BY e.src
            ) nm ON nm.vid = u.vid
            WHERE nm.nmax IS NULL OR k.key > nm.nmax
        ),
        nc{r} AS MATERIALIZED (
            SELECT e.src AS vid, c.color
            FROM e0 e
            JOIN win{r} w ON w.vid = e.src
            JOIN col{p} c ON c.vid = e.dst
            GROUP BY 1, 2
        ),
        ass{r} AS MATERIALIZED (
            SELECT w.vid,
                   CAST(COALESCE((
                       SELECT MIN(g) FROM generate_series(1, 26) t(g)
                       WHERE g NOT IN (SELECT color FROM nc{r} n
                                       WHERE n.vid = w.vid)
                   ), 1) AS INT) AS color
            FROM win{r} w
        ),
        col{r} AS MATERIALIZED (
            SELECT vid, color FROM col{p}
            UNION ALL SELECT vid, color FROM ass{r}
        ),
        unc{r} AS MATERIALIZED (
            SELECT vid FROM unc{p}
            WHERE vid NOT IN (SELECT vid FROM ass{r})
        ),
        kd_unc{r} AS MATERIALIZED (
            SELECT k.vid, k.key FROM k
            WHERE k.vid IN (SELECT vid FROM unc{r})
        )"""
    # kd_unc0 seeds the first round's neighbor-max over uncolored keys
    ctes.append(
        """kd_unc0 AS MATERIALIZED (
            SELECT k.vid, k.key FROM k
            WHERE k.vid IN (SELECT vid FROM unc0)
        )"""
    )
    for r in range(1, rounds + 1):
        ctes.append(round_tpl.format(r=r, p=r - 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(vid AS INTEGER) AS n_nationkey, color "
        f"FROM col{rounds}"
    )


KATZ_ALPHA, KATZ_ITERS = 0.1, 6


def q_katz_nations(spark, sf_dir):
    """Katz centrality (operators/katz): 6 exact iterations of
    x ← β + α·Aᵀx on the nation ring/spine digraph. Fixed-iteration Katz
    is a polynomial in A, so the oracle re-derives it as bounded-hop walk
    ENUMERATION (katz(v) = β Σ_j α^j · #walks of length j ending at v) —
    a different formulation than the Spark relax loop; agreement pins
    both."""
    from osmgraphing_spark.operators import katz as katz_op

    e = _nation_ring_edges(spark, sf_dir).select(
        F.format_string("n%03d", F.col("src")).alias("src_key"),
        F.format_string("n%03d", F.col("dst")).alias("dst_key"),
        F.lit(1.0).alias("weight"),
    )
    g = build_graph(e, num_blocks=4)
    res = katz_op.run(g, alpha=KATZ_ALPHA, beta=1.0, max_iter=KATZ_ITERS)
    out = _vid_to_nationkey(g, res, ["vid"])
    return out.select(
        F.col("vid").cast("int").alias("n_nationkey"),
        F.round("katz", 6).alias("katz"),
    )


def q_mst_nations(spark, sf_dir):
    """Minimum spanning forest (operators/mst: distributed Borůvka) of the
    weighted nation co-region graph. The MSF is unique under the total edge
    order (w, u, v), so the cycle-property SQL oracle — edge ∈ MSF iff its
    endpoints are NOT connected using only strictly-smaller edges, checked
    with a per-rank recursive-closure CTE — must agree EXACTLY (a different
    algorithm than Borůvka, so agreement pins both)."""
    from osmgraphing_spark.operators import mst as mst_op

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r"))
    b = n.select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r"))
    e = (
        a.join(b, "r")
        .where(F.col("a") != F.col("b"))
        .select(
            F.col("a").cast("long").alias("src"),
            F.col("b").cast("long").alias("dst"),
            (F.lit(1.0) + (F.col("a") * 7 + F.col("b")) % 5)
            .cast("double")
            .alias("weight"),
        )
    )
    f = mst_op.boruvka_msf(e)
    return f.select(
        F.col("u").cast("int").alias("u"),
        F.col("v").cast("int").alias("v"),
        F.round("w", 6).alias("w"),
    )


def q_betweenness_nations(spark, sf_dir):
    """Betweenness centrality (operators/betweenness: k-pivot Brandes as
    two BSP sweeps) in EXACT mode — every nation a pivot — on the directed
    ring/spine digraph. The oracle recomputes it from the pair-dependency
    identity b(v) = Σ_{s≠v≠t} σ(s,v)·σ(v,t)/σ(s,t) over triples where
    d(s,v)+d(v,t)=d(s,t), with σ counted by shortest-walk enumeration —
    an entirely different formulation than the Spark backward sweep, so
    agreement pins both the BFS σ counting and the δ accumulation."""
    from osmgraphing_spark.operators import betweenness as btw_op

    e = _nation_ring_edges(spark, sf_dir)
    sources = [
        int(r[0])
        for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    ]
    res = btw_op.betweenness(e, sources=sorted(sources))
    return res.select(
        F.col("vid").cast("int").alias("node_id"), "betweenness"
    )


def q_doc_source_stats(spark, sf_dir):
    """Per-source reputation table (operators/funnel.source_stats): doc
    count, within-source exact-dup fraction, mean tokens, mean quality —
    the source-level gate real pipelines apply before per-document work.
    One fused corpus scan + two-stage algebraic aggregation (the second
    stage sees one row per distinct content, so hot sources combine
    map-side)."""
    from osmgraphing_spark.operators import funnel

    return funnel.source_stats(_t(spark, sf_dir, "documents"))


def q_doc_filter_funnel(spark, sf_dir):
    """Quality-filter funnel (operators/funnel): the Gopher-ish default
    chain (token floor → repetition cap → stopword floor) over documents,
    with per-rule drop accounting — verdicts fuse into ONE corpus scan
    (map-only), the summary shuffles only |rules|+1 verdict counts."""
    from osmgraphing_spark.operators import funnel

    return funnel.summary(_t(spark, sf_dir, "documents"), funnel.default_rules())


COPURCHASE_MIN = 5
COPURCHASE_MAX_PD = 45


def q_link_copurchase(spark, sf_dir):
    """Bipartite projection (operators/linkpred.bipartite_project): the
    customer co-purchase graph — customer pairs sharing ≥ COPURCHASE_MIN
    distinct parts, jaccard over the full partner sets, with hot parts
    (degree > COPURCHASE_MAX_PD) cut BEFORE the deg² self-join (the
    adamic_adar/max_df hub discipline; the oracle applies the same cut)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return linkpred.bipartite_project(
        e, min_shared=COPURCHASE_MIN, max_partner_degree=COPURCHASE_MAX_PD
    )


def q_link_predictors(spark, sf_dir):
    """Full link-prediction battery (operators/linkpred
    .link_predictor_scores): common neighbors, jaccard, cosine,
    Adamic-Adar, resource allocation and preferential attachment for the
    top 50 predicted pairs, all from ONE wedge pass (the three wedge-level
    sums share a single map-side combine; jaccard/cosine/PA come from two
    slim true-degree joins). Hub centers cut at AA_CENTER_CAP before the
    deg² self-join, same as `link_adamic_adar`."""
    e = q_link_edges(spark, sf_dir)
    scored = linkpred.link_predictor_scores(e, max_center_degree=AA_CENTER_CAP)
    return (
        scored.select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            "common", "jaccard", "cosine", "adamic_adar",
            "resource_alloc", "pref_attach",
        )
        .orderBy(F.desc("common"), "node_a", "node_b")
        .limit(50)
    )


def q_link_butterflies(spark, sf_dir):
    """Per-member butterfly (bipartite 4-cycle) counts
    (operators/linkpred.butterfly_counts) on the customer × part purchase
    graph: top 30 customers by butterflies = Σ_v C(shared(u,v), 2) — the
    bipartite clustering signal. Hot parts (degree > COPURCHASE_MAX_PD)
    cut BEFORE the partner-keyed wedge self-join; the oracle applies the
    same cut."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return (
        linkpred.butterfly_counts(e, max_partner_degree=COPURCHASE_MAX_PD)
        .select(F.col("m").alias("custkey"), "butterflies", "max_shared")
        .orderBy(F.desc("butterflies"), "custkey")
        .limit(30)
    )


TRUSS_K = 4
TRUSS_ROUNDS = 2


def q_truss_nations(spark, sf_dir):
    """k-truss (operators/truss: triangle-support peel, bounded rounds so
    the DuckDB oracle is a finite CTE chain — peeling is idempotent at the
    fixpoint, so early convergence matches a bigger budget exactly) at
    k=TRUSS_K on the mixed nation graph; surviving canonical edges with
    their support inside the surviving subgraph."""
    from osmgraphing_spark.operators import truss as truss_op

    res = truss_op.truss_edges(
        _nation_mixed_edges(spark, sf_dir), k=TRUSS_K, rounds=TRUSS_ROUNDS
    )
    return res.select(
        F.col("a").cast("int").alias("a"),
        F.col("b").cast("int").alias("b"),
        "support",
    )


def q_closeness_nations(spark, sf_dir):
    """Inbound closeness centrality (operators/sssp.closeness_centrality):
    r(v)/Σd(s,v) over weighted shortest paths on the nation digraph, every
    vertex a source (exact mode; at scale: landmark sample) — the same
    single multi-source BSP run as harmonic, different final aggregate."""
    g = _cached_graph(spark, sf_dir, "nation_w", _nation_weighted_raw_edges, 4)
    res = sssp_op.closeness_centrality(g, weighted=True)
    out = _vid_to_nationkey(g, res, ["vid"])
    return out.select(
        F.col("vid").cast("int").alias("n_nationkey"), "n_reach", "closeness"
    )


KCORE_K = 10
KCORE_ROUNDS = 2

NEAR_DUP_THRESHOLD = 0.42
NEAR_DUP_PLANES = 4
NEAR_DUP_TABLES = 8


def q_kcore_links(spark, sf_dir):
    """k-core peel (beyond-reference link-graph extension,
    operators/kcore.py): KCORE_ROUNDS bounded peel rounds at k=KCORE_K on
    the undirected view of the customer–supplier link graph → surviving
    vertices with their degree inside the surviving subgraph. Bounded
    rounds keep the DuckDB oracle a finite CTE chain; peeling is
    idempotent at the fixpoint, so early convergence matches it exactly."""
    from osmgraphing_spark.operators import kcore as kcore_op

    g = _cached_graph(spark, sf_dir, "bipartite", _bipartite_raw_edges, 8)
    res = kcore_op.peel(g, k=KCORE_K, rounds=KCORE_ROUNDS)
    return (
        res.join(g.vertices, "vid")
        .select(
            _key_to_node_id(F.col("key")).alias("node_id"),
            F.col("deg").cast("long").alias("deg"),
        )
    )


def _bipartite_metric_raw_edges(spark, sf_dir):
    """Bipartite link graph with a per-edge metric VECTOR: [lineitem count,
    total quantity] — the reference's edge × metric matrix shape."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(
            F.count("*").cast("double").alias("cnt"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
        .select(
            F.format_string("c%09d", F.col("o_custkey")).alias("src_key"),
            F.format_string("s%09d", F.col("l_suppkey")).alias("dst_key"),
            F.array("cnt", "qty").alias("metrics"),
        )
    )


def _edges_with_node_ids(g, cols):
    """Join the vid-space edge endpoints back to original node ids."""
    out = g.edges
    for c in ("src", "dst"):
        vmap = g.vertices.select(
            F.col("vid").alias(c), _key_to_node_id(F.col("key")).alias(f"{c}_id")
        )
        out = out.join(vmap, c)
    return out.select(
        F.col("src_id").alias("src"), F.col("dst_id").alias("dst"), *cols
    )


def q_multi_metric_edges(spark, sf_dir):
    """Multi-metric edge state (build_graph(metric_names=...)) plus a
    config-declared `generating` derived column (calc quotient) — the
    reference's blueprint.yaml generating: vocabulary."""
    g = build_graph(
        _bipartite_metric_raw_edges(spark, sf_dir),
        num_blocks=8,
        metric_names=["cnt", "qty"],
    )
    g = gen.apply_generating(
        g,
        [{"op": "calc", "name": "avg_qty", "a": "qty", "b": "cnt", "kind": "quotient"}],
    )
    return _edges_with_node_ids(
        g,
        [
            F.round(g.metric_col("cnt"), 6).alias("m_cnt"),
            F.round(g.metric_col("qty"), 6).alias("m_qty"),
            F.round(g.metric_col("avg_qty"), 6).alias("avg_qty"),
        ],
    )


def q_normalize_metrics(spark, sf_dir):
    """Per-metric mean normalization over the metric vector (A2/A3 on the
    edge × metric matrix; the reference recomputes per-metric means at
    finalize)."""
    g = build_graph(
        _bipartite_metric_raw_edges(spark, sf_dir),
        num_blocks=8,
        metric_names=["cnt", "qty"],
    )
    nm = g.normalized_metrics()
    g2 = type(g)(
        vertices=g.vertices,
        edges=nm,
        num_vertices=g.num_vertices,
        num_edges=g.num_edges,
        num_blocks=g.num_blocks,
        metric_names=g.metric_names,
    )
    return _edges_with_node_ids(
        g2,
        [
            F.round(F.element_at(F.col("metrics"), 1), 6).alias("cnt_n"),
            F.round(F.element_at(F.col("metrics"), 2), 6).alias("qty_n"),
        ],
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full link-graph pipeline (build + 5 PageRank supersteps)."""
    return q_pagerank5(spark, "/root/testdata/sf0.001")


# The external driver value-checks the FIRST 50 keys of queries() each
# round. Cumulative hard-signal coverage closed at 132/132 in round 4,
# so rotation is now a standing regression guard (VERDICT r4 item 6):
# every round leads with the keys that have gone longest without a
# driver check. This round-5 window = the 36 keys last driver-checked
# in round 2 plus the 14 alphabetically-first round-3 keys; with it, no
# registry key is ever more than 2 rounds stale. The registry content
# is unchanged, only the iteration order.
_DRIVER_WINDOW_ORDER = [
    # -- 36 keys last driver-checked in round 2 (stalest) --
    "closeness_nations", "coloring_nations", "eigen_links", "hits8",
    "katz_nations", "kcore_links", "link_adamic_adar", "link_assortativity",
    "link_attr_assort", "link_clustering", "link_copurchase", "link_degree_hist",
    "link_densest", "link_dist_hist", "link_edge_sample", "link_featprop",
    "link_host_graph", "link_n2v_walks", "link_powerlaw", "link_predictors",
    "link_reciprocity", "link_rich_club", "link_snapshot_diff", "link_walks",
    "link_wl_roles", "matching_nations", "mis_nations", "modularity_nations",
    "mst_nations", "part_type_revenue", "ppr5", "salsa8",
    "simrank_nations", "supplier_region_stats", "triangles_doulion", "truss_nations",
    # -- 14 oldest round-3 keys (next-stalest tier) --
    "doc_bloom_decon", "doc_bm25_topk", "doc_chunks", "doc_containment_pairs",
    "doc_decontaminate", "doc_dsir_sample", "doc_dup_clusters", "doc_dup_spans",
    "doc_filter_funnel", "doc_hybrid_topk", "doc_incremental_dups", "doc_keep_best",
    "doc_lr_quality", "doc_nb_lang",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _query_registry()
    out = {k: base[k] for k in _DRIVER_WINDOW_ORDER if k in base}
    out.update({k: v for k, v in base.items() if k not in out})
    return out


def _query_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "link_edges": q_link_edges,
        "link_degrees": q_link_degrees,
        "link_adamic_adar": q_link_adamic_adar,
        "link_n2v_walks": q_link_n2v_walks,
        "link_featprop": q_link_featprop,
        "link_wl_roles": q_link_wl_roles,
        "link_powerlaw": q_link_powerlaw,
        "link_densest": q_link_densest,
        "triangles_doulion": q_triangles_doulion,
        "link_snapshot_diff": q_link_snapshot_diff,
        "link_host_graph": q_link_host_graph,
        "link_predictors": q_link_predictors,
        "link_butterflies": q_link_butterflies,
        "link_copurchase": q_link_copurchase,
        "link_degree_hist": q_link_degree_hist,
        "link_edge_sample": q_link_edge_sample,
        "part_type_revenue": q_part_type_revenue,
        "supplier_region_stats": q_supplier_region_stats,
        "pagerank5": q_pagerank5,
        "cc_nations": q_cc_nations,
        "mis_nations": q_mis_nations,
        "scc_nations": q_scc_nations,
        "simrank_nations": q_simrank_nations,
        "link_rich_club": q_link_rich_club,
        "link_attr_assort": q_link_attr_assort,
        "link_dist_hist": q_link_dist_hist,
        "modularity_nations": q_modularity_nations,
        "scc_build_order": q_scc_build_order,
        "betweenness_nations": q_betweenness_nations,
        "mst_nations": q_mst_nations,
        "katz_nations": q_katz_nations,
        "matching_nations": q_matching_nations,
        "coloring_nations": q_coloring_nations,
        "truss_nations": q_truss_nations,
        "closeness_nations": q_closeness_nations,
        "link_reciprocity": q_link_reciprocity,
        "link_assortativity": q_link_assortativity,
        "link_clustering": q_link_clustering,
        "link_walks": q_link_walks,
        "lpa_nations": q_lpa_nations,
        "triangles_nations": q_triangles_nations,
        "pagerank5_weighted": q_pagerank5_weighted,
        "ppr5": q_ppr5,
        "link_spam_mass": q_link_spam_mass,
        "hits8": q_hits8,
        "salsa8": q_salsa8,
        "eigen_links": q_eigen_links,
        "kcore_links": q_kcore_links,
        "triangles_per_vertex_nations": q_triangles_per_vertex_nations,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "normalize_qty": q_normalize_qty,
        "semi_join_customers": q_semi_join_customers,
        "anti_join_customers": q_anti_join_customers,
        "dedup_pairs": q_dedup_pairs,
        "clamped_discount": q_clamped_discount,
        "order_ranks": q_order_ranks,
        "sessionize_events": q_sessionize_events,
        "event_funnel": q_event_funnel,
        "hourly_events": q_hourly_events,
        "event_cohort_retention": q_event_cohort_retention,
        "event_value_quantiles": q_event_value_quantiles,
        "event_props_k": q_event_props_k,
        "doc_tokens": q_doc_tokens,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_repetition": q_doc_repetition,
        "doc_filter_funnel": q_doc_filter_funnel,
        "doc_source_stats": q_doc_source_stats,
        "doc_pii": q_doc_pii,
        "media_image_stats": q_media_image_stats,
        "media_video_stats": q_media_video_stats,
        "media_video_frames": q_media_video_frames,
        "media_image_dhash": q_media_image_dhash,
        "media_audio_stats": q_media_audio_stats,
        "doc_exact_dups": q_doc_exact_dups,
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "doc_prefix_jaccard": q_doc_prefix_jaccard,
        "doc_dsir_sample": q_doc_dsir_sample,
        "doc_bm25_topk": q_doc_bm25_topk,
        "doc_nb_lang": q_doc_nb_lang,
        "doc_hybrid_topk": q_doc_hybrid_topk,
        "doc_chunks": q_doc_chunks,
        "doc_scrub_spans": q_doc_scrub_spans,
        "doc_winnow": q_doc_winnow,
        "doc_minhash": q_doc_minhash,
        "doc_lsh_candidates": q_doc_lsh_candidates,
        "doc_incremental_dups": q_doc_incremental_dups,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_keep_best": q_doc_keep_best,
        "doc_dup_spans": q_doc_dup_spans,
        "doc_containment_pairs": q_doc_containment_pairs,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "embed_topk": q_embed_topk,
        "embed_ann": q_embed_ann,
        "embed_ivf": q_embed_ivf,
        "embed_kmeans": q_embed_kmeans,
        "embed_semdedup": q_embed_semdedup,
        "embed_triplets": q_embed_triplets,
        "embed_pq": q_embed_pq,
        "embed_pq_topk": q_embed_pq_topk,
        "embed_near_dups": q_embed_near_dups,
        "sssp_nations": q_sssp_nations,
        "ch_routes_nations": q_ch_routes_nations,
        "link_diameter": q_link_diameter,
        "link_landmark_est": q_link_landmark_est,
        "link_partition_stats": q_link_partition_stats,
        "link_ego_net": q_link_ego_net,
        "link_bowtie": q_link_bowtie,
        "doc_train_split": q_doc_train_split,
        "doc_temp_mixture": q_doc_temp_mixture,
        "doc_rake_weights": q_doc_rake_weights,
        "doc_lr_quality": q_doc_lr_quality,
        "multi_metric_edges": q_multi_metric_edges,
        "normalize_metrics": q_normalize_metrics,
        "harmonic_nations": q_harmonic_nations,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_bloom_decon": q_doc_bloom_decon,
        "doc_unigram_nll": q_doc_unigram_nll,
        "doc_tfidf_terms": q_doc_tfidf_terms,
        "doc_bigram_nll": q_doc_bigram_nll,
        "doc_bpe_merges": q_doc_bpe_merges,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_top_terms": q_doc_top_terms,
        "doc_heavy_bigrams": q_doc_heavy_bigrams,
        "doc_cms_sketch": q_doc_cms_sketch,
        "doc_stratified_sample": q_doc_stratified_sample,
        "doc_distinct_tokens": q_doc_distinct_tokens,
        "doc_weighted_sample": q_doc_weighted_sample,
        "doc_epoch_shuffle": q_doc_epoch_shuffle,
        "doc_pack_sequences": q_doc_pack_sequences,
        "doc_mixture_sample": q_doc_mixture_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_PR_ITER = """
    r{K} AS (
        SELECT v.vid,
               (0.15 / (SELECT n FROM n))
               + 0.85 * ((SELECT dm FROM dm{P}) / (SELECT n FROM n))
               + 0.85 * COALESCE(c.c, 0) AS rank
        FROM v
        LEFT JOIN (
            SELECT e.dst AS vid, SUM(r{P}.rank / deg.d) AS c
            FROM e
            JOIN r{P} ON e.src = r{P}.vid
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) c ON v.vid = c.vid
    ),
    dm{K} AS (
        SELECT COALESCE(SUM(r.rank), 0) AS dm
        FROM r{K} r LEFT JOIN deg ON r.vid = deg.src
        WHERE deg.src IS NULL
    )"""


_PPR_ITER = """
    r{K} AS (
        SELECT v.vid,
               p.p * (0.15 + 0.85 * (SELECT dm FROM dm{P}))
               + 0.85 * COALESCE(c.c, 0) AS rank
        FROM v
        JOIN p ON v.vid = p.vid
        LEFT JOIN (
            SELECT e.dst AS vid, SUM(r{P}.rank / deg.d) AS c
            FROM e
            JOIN r{P} ON e.src = r{P}.vid
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) c ON v.vid = c.vid
    ),
    dm{K} AS (
        SELECT COALESCE(SUM(r.rank), 0) AS dm
        FROM r{K} r LEFT JOIN deg ON r.vid = deg.src
        WHERE deg.src IS NULL
    )"""


def _ppr5_sql() -> str:
    parts = [
        "WITH e AS (" + SQL_BIPARTITE_EDGES + "),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src),",
        f"nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nc FROM v WHERE vid < {SUPP_OFFSET}),",
        # teleport: uniform over customer vertices, 0 on suppliers
        f"""p AS (
            SELECT vid,
                   CASE WHEN vid < {SUPP_OFFSET}
                        THEN CAST(1.0 AS DOUBLE) / (SELECT nc FROM nc)
                        ELSE CAST(0.0 AS DOUBLE) END AS p
            FROM v
        ),""",
        "r0 AS (SELECT vid, p AS rank FROM p),",
        """dm0 AS (
            SELECT COALESCE(SUM(r.rank), 0) AS dm
            FROM r0 r LEFT JOIN deg ON r.vid = deg.src
            WHERE deg.src IS NULL
        )""",
    ]
    for k in range(1, 6):
        parts.append("," + _PPR_ITER.format(K=k, P=k - 1))
    parts.append("SELECT vid AS node_id, ROUND(rank, 6) AS rank FROM r5")
    return "\n".join(parts)


"""HITS iteration CTEs. L1 normalization via `SUM(..) OVER ()` (window over
the whole frame), NOT a scalar subquery: a subquery would reference the
_raw CTE twice, and inlined-CTE engines expand that into 2^iterations scans
of the base join — the window keeps each CTE referenced exactly once, so
the chain stays linear."""
_HITS_ITER = """
    a{K} AS (
        SELECT vid, a / SUM(a) OVER () AS auth FROM (
            SELECT v.vid, COALESCE(s.c, 0) AS a
            FROM v LEFT JOIN (
                SELECT e.dst AS vid, SUM(h{P}.hub) AS c
                FROM e JOIN h{P} ON e.src = h{P}.vid GROUP BY e.dst
            ) s ON v.vid = s.vid
        )
    ),
    h{K} AS (
        SELECT vid, h / SUM(h) OVER () AS hub FROM (
            SELECT v.vid, COALESCE(s.c, 0) AS h
            FROM v LEFT JOIN (
                SELECT e.src AS vid, SUM(a{K}.auth) AS c
                FROM e JOIN a{K} ON e.dst = a{K}.vid GROUP BY e.src
            ) s ON v.vid = s.vid
        )
    )"""


#: one SALSA iteration: HITS's sums become walk steps (÷ outdeg forward,
#: ÷ indeg backward); od/idg CTEs are defined once in _salsa8_sql
_SALSA_ITER = """
    a{K} AS (
        SELECT vid, a / SUM(a) OVER () AS auth FROM (
            SELECT v.vid, COALESCE(s.c, 0) AS a
            FROM v LEFT JOIN (
                SELECT e.dst AS vid, SUM(h{P}.hub / od.d) AS c
                FROM e
                JOIN h{P} ON e.src = h{P}.vid
                JOIN od ON e.src = od.src
                GROUP BY e.dst
            ) s ON v.vid = s.vid
        )
    ),
    h{K} AS (
        SELECT vid, h / SUM(h) OVER () AS hub FROM (
            SELECT v.vid, COALESCE(s.c, 0) AS h
            FROM v LEFT JOIN (
                SELECT e.src AS vid, SUM(a{K}.auth / idg.d) AS c
                FROM e
                JOIN a{K} ON e.dst = a{K}.vid
                JOIN idg ON e.dst = idg.dst
                GROUP BY e.src
            ) s ON v.vid = s.vid
        )
    )"""


#: nation ring/path/spine digraph shared by the scc_nations and link_walks
#: oracles (mirrors _nation_ring_edges)
_NATION_RING_CTES = """
    ring AS (
        SELECT n_nationkey AS src, n_regionkey AS rk,
               LEAD(n_nationkey) OVER (
                   PARTITION BY n_regionkey ORDER BY n_nationkey
               ) AS nxt,
               FIRST_VALUE(n_nationkey) OVER (
                   PARTITION BY n_regionkey ORDER BY n_nationkey
               ) AS frst
        FROM nation
    ),
    e1 AS (
        SELECT src, COALESCE(nxt, CASE WHEN rk % 2 = 0 THEN frst END) AS dst
        FROM ring
    ),
    mins AS (
        SELECT n_regionkey AS rk, MIN(n_nationkey) AS mn
        FROM nation GROUP BY n_regionkey
    ),
    crosse AS (
        SELECT mn AS src, LEAD(mn) OVER (ORDER BY rk) AS dst FROM mins
    ),
    e AS (
        SELECT src, dst FROM e1 WHERE dst IS NOT NULL AND src <> dst
        UNION
        SELECT src, dst FROM crosse WHERE dst IS NOT NULL
    )
"""


_SIMRANK_ITER = """
    s{K} AS (
        SELECT v AS a, v AS b, CAST(1.0 AS DOUBLE) AS s FROM srverts
        UNION ALL
        SELECT m.na AS a, m.nb AS b, {C} * m.raw / (da.d * db.d) AS s
        FROM (
            SELECT ia.dst AS na, ib.dst AS nb, SUM(p.s) AS raw
            FROM s{P} p
            JOIN e ia ON ia.src = p.a
            JOIN e ib ON ib.src = p.b
            WHERE ia.dst <> ib.dst
            GROUP BY ia.dst, ib.dst
        ) m
        JOIN indeg da ON da.v = m.na
        JOIN indeg db ON db.v = m.nb
    )"""


def _simrank_sql() -> str:
    """Round-for-round replay of simrank.run on the nation ring/spine
    digraph. NOTE (DuckDB WITH RECURSIVE quirk): non-self-referencing CTEs
    inside WITH RECURSIVE get UNION ALL semantics regardless of the UNION
    keyword, so set CTEs here use explicit DISTINCT."""
    parts = [
        f"WITH RECURSIVE {_NATION_RING_CTES},",
        """srverts AS (
            SELECT DISTINCT v FROM (
                SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e
            ) vv
        ),""",
        "indeg AS (SELECT dst AS v, COUNT(*) AS d FROM e GROUP BY dst),",
        "s0 AS (SELECT v AS a, v AS b, CAST(1.0 AS DOUBLE) AS s FROM srverts)",
    ]
    for k in range(1, SIMRANK_ITERS + 1):
        parts.append("," + _SIMRANK_ITER.format(K=k, P=k - 1, C=SIMRANK_C))
    parts.append(f"""
        SELECT CAST(a AS INTEGER) AS a, CAST(b AS INTEGER) AS b,
               ROUND(s, 6) AS simrank
        FROM s{SIMRANK_ITERS}
        WHERE a < b AND ROUND(s, 6) > 0
    """)
    return "\n".join(parts)


def _truss_sql(k: int, rounds: int) -> str:
    """Chained-CTE replay of truss_edges(k, rounds) on the mixed nation
    graph: per round, count each canonical triangle (x<y<z, one row each —
    no orientation needed at oracle scale) into its three edges, keep
    support ≥ k−2; after the last round recount support inside the
    survivors (the operator's reporting contract)."""
    parts = [
        f"WITH {_NATION_RING_CTES},",
        """
        m AS (
            SELECT src, dst FROM e
            UNION
            SELECT a.n_nationkey, b.n_nationkey
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey
             AND a.n_nationkey <> b.n_nationkey
        ),
        live0 AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM m WHERE src <> dst
        )""",
    ]
    for r in range(rounds + 1):
        parts.append(f""",
        tri{r} AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM live{r} e1
            JOIN live{r} e2 ON e1.a = e2.a AND e1.b < e2.b
            JOIN live{r} e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        sup{r} AS (
            SELECT l.a, l.b, COALESCE(c.n, 0) AS support
            FROM live{r} l LEFT JOIN (
                SELECT a, b, COUNT(*) AS n FROM (
                    SELECT x AS a, y AS b FROM tri{r}
                    UNION ALL SELECT x, z FROM tri{r}
                    UNION ALL SELECT y, z FROM tri{r}
                ) GROUP BY a, b
            ) c ON c.a = l.a AND c.b = l.b
        ),
        live{r + 1} AS (
            SELECT a, b FROM sup{r} WHERE support >= {k - 2}
        )""")
    parts.append(f"""
        SELECT CAST(a AS INTEGER) AS a, CAST(b AS INTEGER) AS b, support
        FROM sup{rounds}
    """)
    return "".join(parts)


def _walks_sql(length: int = 3, wpv: int = 2) -> str:
    """Chained-CTE oracle for q_link_walks: step s joins step s-1 against
    the indexed adjacency with the portable md5 choice."""
    steps = []
    for s in range(1, length + 1):
        choice = (
            "CAST(concat('0x', substr(md5(concat(CAST(p.walker AS VARCHAR), "
            f"'|', '{s}')), 1, 14)) AS BIGINT) % adj.od"
        )
        steps.append(
            f"s{s} AS (SELECT p.walker, adj.dst AS node "
            f"FROM s{s - 1} p JOIN adj ON adj.src = p.node AND adj.idx = {choice})"
        )
    selects = ["SELECT walker, 0 AS step, CAST(node AS BIGINT) AS node FROM s0"] + [
        f"SELECT walker, {s} AS step, CAST(node AS BIGINT) AS node FROM s{s}"
        for s in range(1, length + 1)
    ]
    js = ", ".join(f"(CAST({j} AS BIGINT))" for j in range(wpv))
    return f"""
        WITH {_NATION_RING_CTES},
        adj AS (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
                   COUNT(*) OVER (PARTITION BY src) AS od
            FROM e
        ),
        verts AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e),
        s0 AS (
            SELECT CAST(v AS BIGINT) * {wpv} + j AS walker, v AS node
            FROM verts CROSS JOIN (VALUES {js}) t(j)
        ),
        {', '.join(steps)}
        {' UNION ALL '.join(selects)}
    """


def _densest_sql(eps: float = DENSEST_EPS, rounds: int = DENSEST_ROUNDS) -> str:
    """Fixed-depth replay of the Charikar/BKV peel on the symmetrized
    nation digraph: per round the canonical edge set de{r}, its density,
    and the (1+ε)·avg-degree survivor cut; best round by (density DESC,
    round ASC); members = vertices of that round's edge set."""
    parts = [
        """de0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM (SELECT src, dst FROM e WHERE src <> dst)
        )"""
    ]
    for r in range(rounds):
        parts.append(
            f"""d{r} AS MATERIALIZED (
                SELECT v, COUNT(*) AS d FROM (
                    SELECT a AS v FROM de{r} UNION ALL SELECT b AS v FROM de{r}
                ) GROUP BY v
            ),
            s{r} AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                       (SELECT CAST(COUNT(*) AS DOUBLE) FROM d{r}) AS n
                FROM de{r}
            ),
            k{r} AS (
                SELECT d{r}.v FROM d{r}, s{r}
                WHERE d{r}.d > 2.0 * {1.0 + eps} * (s{r}.m / s{r}.n)
            ),
            de{r + 1} AS MATERIALIZED (
                SELECT a, b FROM de{r}
                WHERE a IN (SELECT v FROM k{r}) AND b IN (SELECT v FROM k{r})
            )"""
        )
    dens_rows = " UNION ALL ".join(
        f"SELECT {r} AS rnd, m / NULLIF(n, 0) AS rho FROM s{r}"
        for r in range(rounds)
    )
    member_rows = " UNION ALL ".join(
        f"SELECT {r} AS rnd, v AS vid FROM "
        f"(SELECT a AS v FROM de{r} UNION SELECT b AS v FROM de{r})"
        for r in range(rounds)
    )
    return f"""
        WITH {_NATION_RING_CTES},
        {', '.join(parts)},
        dens AS ({dens_rows}),
        best AS (
            SELECT rnd, rho FROM dens WHERE rho IS NOT NULL
            ORDER BY rho DESC, rnd ASC LIMIT 1
        ),
        mem AS ({member_rows})
        SELECT mem.vid, CAST(best.rnd AS INT) AS best_round,
               ROUND(best.rho, 6) AS best_density
        FROM mem JOIN best ON mem.rnd = best.rnd
    """


def _wl_sql(rounds: int = WL_ROUNDS) -> str:
    """Round-for-round oracle for q_link_wl_roles (hashed 1-WL): degree
    seed color, commutative Σ h(neighbor color) mod 1e9, md5 re-color."""
    from osmgraphing_spark.operators.wl import H_MOD

    parts = [
        """deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
        c0 AS (SELECT src AS id, md5(CAST(deg AS VARCHAR)) AS color, deg
               FROM deg)"""
    ]
    for t in range(rounds):
        parts.append(
            f"""h{t} AS (
                SELECT und.src AS id,
                       CAST(concat('0x', substr(md5(c.color), 1, 12)) AS BIGINT)
                           % {H_MOD} AS hc
                FROM und JOIN c{t} c ON c.id = und.dst
            )"""
        )
        parts.append(
            f"s{t} AS (SELECT id, SUM(hc) AS s FROM h{t} GROUP BY id)"
        )
        parts.append(
            f"""c{t + 1} AS (
                SELECT c.id,
                       md5(concat(c.color, '|', CAST(s.s AS VARCHAR), '|',
                                  CAST(c.deg AS VARCHAR))) AS color,
                       c.deg
                FROM c{t} c JOIN s{t} s USING (id)
            )"""
        )
    return f"""
        WITH {_NATION_RING_CTES},
        und AS (
            SELECT src, dst FROM (
                SELECT src, dst FROM e
                UNION SELECT dst AS src, src AS dst FROM e
            ) WHERE src <> dst
        ),
        {', '.join(parts)}
        SELECT id AS vid, color FROM c{rounds}
    """


def _featprop_sql(rounds: int = FEATPROP_ROUNDS) -> str:
    """Unrolled-round oracle for q_link_featprop: per round, explode each
    inbox vector into (id, i, x), take the exact round-half-up mean per
    component, reassemble the list."""
    parts = [
        """f0 AS (
            SELECT n_nationkey AS id,
                   [CAST(n_nationkey AS BIGINT),
                    CAST(10 * n_regionkey AS BIGINT),
                    CAST(100 - n_nationkey AS BIGINT)] AS f
            FROM nation
        )"""
    ]
    for t in range(rounds):
        parts.append(
            f"""m{t} AS (
                SELECT und.dst AS id, f.f FROM und JOIN f{t} f ON f.id = und.src
                UNION ALL SELECT id, f FROM f{t}
            )"""
        )
        parts.append(
            f"""a{t} AS (
                SELECT id, i,
                       CAST(FLOOR((2 * SUM(x) + COUNT(*)) / (2.0 * COUNT(*)))
                            AS BIGINT) AS m
                FROM (SELECT id, generate_subscripts(f, 1) AS i, unnest(f) AS x
                      FROM m{t})
                GROUP BY id, i
            )"""
        )
        parts.append(
            f"f{t + 1} AS (SELECT id, list(m ORDER BY i) AS f FROM a{t} GROUP BY id)"
        )
    return f"""
        WITH {_NATION_RING_CTES},
        und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        {', '.join(parts)}
        SELECT id AS vid, f[1] AS f0, f[2] AS f1, f[3] AS f2 FROM f{rounds}
    """


def _n2v_walks_sql(length: int = 3) -> str:
    """Chained-CTE oracle for q_link_n2v_walks: step 1 is the uniform
    md5-mod-degree choice; steps ≥ 2 replay the biased race — candidate
    expansion against adj, the is-neighbor-of-prev probe, integer bias
    weights, dst-ordered cumulative sum and the H mod Σw draw."""
    rw, d1, d2 = N2V_BIAS

    def h(s):
        return (
            "CAST(concat('0x', substr(md5(concat(CAST(walker AS VARCHAR), "
            f"'|', '{s}')), 1, 14)) AS BIGINT)"
        )

    steps = [
        "s1 AS (SELECT p.walker, p.node AS prev, adj.dst AS node "
        "FROM s0 p JOIN adj ON adj.src = p.node AND adj.idx = "
        "CAST(concat('0x', substr(md5(concat(CAST(p.walker AS VARCHAR), "
        "'|', '1')), 1, 14)) AS BIGINT) % adj.od)"
    ]
    for s in range(2, length + 1):
        steps.append(
            f"""c{s} AS (
                SELECT p.walker, p.node AS cur, a.dst AS nxt, a.idx,
                       CASE WHEN a.dst = p.prev THEN {rw}
                            WHEN e2.src IS NOT NULL THEN {d1}
                            ELSE {d2} END AS w
                FROM s{s - 1} p
                JOIN adj a ON a.src = p.node
                LEFT JOIN und e2 ON e2.src = p.prev AND e2.dst = a.dst
            )"""
        )
        steps.append(
            f"""r{s} AS (
                SELECT walker, cur, nxt, w,
                       SUM(w) OVER (PARTITION BY walker ORDER BY idx) AS cum,
                       SUM(w) OVER (PARTITION BY walker) AS tot
                FROM c{s}
            )"""
        )
        steps.append(
            f"""s{s} AS (
                SELECT walker, cur AS prev, nxt AS node FROM r{s}
                WHERE {h(s)} % tot >= cum - w AND {h(s)} % tot < cum
            )"""
        )
    selects = ["SELECT walker, 0 AS step, CAST(node AS BIGINT) AS node FROM s0"] + [
        f"SELECT walker, {s} AS step, CAST(node AS BIGINT) AS node FROM s{s}"
        for s in range(1, length + 1)
    ]
    return f"""
        WITH {_NATION_RING_CTES},
        und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        adj AS (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
                   COUNT(*) OVER (PARTITION BY src) AS od
            FROM und
        ),
        verts AS (SELECT src AS v FROM und UNION SELECT dst AS v FROM und),
        s0 AS (
            SELECT CAST(v AS BIGINT) AS walker,
                   CAST(NULL AS BIGINT) AS prev, v AS node
            FROM verts
        ),
        {', '.join(steps)}
        {' UNION ALL '.join(selects)}
    """


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """DuckDB replica of operators/kcore.peel on the bipartite link graph:
    one (degree → survivors → induced-subgraph) CTE triple per peel round,
    final degree from the last induced edge set (0 via the left join when
    every neighbor peeled in the last round)."""
    parts = [
        "WITH e0d AS (" + SQL_BIPARTITE_EDGES + "),",
        "e0 AS (SELECT src, dst FROM e0d UNION "
        "SELECT dst AS src, src AS dst FROM e0d)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f", d{r} AS (SELECT src, COUNT(*) AS c FROM e{r - 1} GROUP BY src)"
            f", s{r} AS (SELECT src AS vid FROM d{r} WHERE c >= {k})"
            f", e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e"
            f" JOIN s{r} a ON e.src = a.vid JOIN s{r} b ON e.dst = b.vid)"
        )
    parts.append(
        f", fd AS (SELECT src, COUNT(*) AS deg FROM e{rounds} GROUP BY src)"
        f" SELECT s{rounds}.vid AS node_id,"
        " CAST(COALESCE(fd.deg, 0) AS BIGINT) AS deg"
        f" FROM s{rounds} LEFT JOIN fd ON s{rounds}.vid = fd.src"
    )
    return "\n".join(parts)


def _hits8_sql(iters: int = 8) -> str:
    parts = [
        "WITH e AS (" + SQL_BIPARTITE_EDGES + "),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "h0 AS (SELECT vid, CAST(1.0 AS DOUBLE)/(SELECT n FROM n) AS hub FROM v)",
    ]
    for k in range(1, iters + 1):
        parts.append("," + _HITS_ITER.format(K=k, P=k - 1))
    parts.append(
        f"SELECT h{iters}.vid AS node_id, ROUND(h{iters}.hub, 6) AS hub, "
        f"ROUND(a{iters}.auth, 6) AS authority "
        f"FROM h{iters} JOIN a{iters} ON h{iters}.vid = a{iters}.vid"
    )
    return "\n".join(parts)


def _lr_quality_sql(iters: int = 4, lr: float = 1.0) -> str:
    """Unrolled full-batch-GD replay of operators/logreg.train + score —
    mirrors q_doc_lr_quality (features, seed labels, update rule)."""
    seeds = ", ".join(f"'{s}'" for s in LR_SEED_SOURCES)
    parts = [
        f"""WITH f AS (
            SELECT doc_id,
                   LEAST(CAST({_DOC_TOKS} AS DOUBLE) / 100.0, 1.0) AS x1,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                             / length(text) END AS x2,
                   CASE WHEN {_DOC_TOKS} = 0 THEN 0.0
                        ELSE CAST({_DOC_STOP_HITS} AS DOUBLE) / {_DOC_TOKS} END AS x3,
                   CASE WHEN source IN ({seeds}) THEN 1.0 ELSE 0.0 END AS y
            FROM documents
        ),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),
        w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""
    , r{k} AS (
        SELECT f.x1, f.x2, f.x3,
               f.y - 1.0 / (1.0 + EXP(-(w.b + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) AS r
        FROM f, w{p} w
    )
    , g{k} AS (
        SELECT SUM(r) AS g0, SUM(r*x1) AS g1, SUM(r*x2) AS g2, SUM(r*x3) AS g3
        FROM r{k}
    )
    , w{k} AS (
        SELECT w.b  + {lr} * g.g0 / (SELECT n FROM nn) AS b,
               w.w1 + {lr} * g.g1 / (SELECT n FROM nn) AS w1,
               w.w2 + {lr} * g.g2 / (SELECT n FROM nn) AS w2,
               w.w3 + {lr} * g.g3 / (SELECT n FROM nn) AS w3
        FROM w{p} w, g{k} g
    )"""
        )
    parts.append(
        f"""
    SELECT f.doc_id,
           ROUND(1.0 / (1.0 + EXP(-(w.b + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))), 6) AS lr_score,
           CAST(f.y AS BIGINT) AS is_seed
    FROM f, w{iters} w"""
    )
    return "\n".join(parts)


def _rake_sql(rounds: int = 3) -> str:
    """Unrolled IPF replay: round k = row-scale (uniform per-lang target
    total/n_langs) then column-scale (uniform per-source target
    total/n_sources) — mirrors operators/raking.rake_cells."""
    parts = [
        "WITH c0 AS (SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS m,",
        "            COUNT(*) AS n FROM documents GROUP BY lang, source),",
        "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM documents),",
        "nr AS (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) AS k FROM c0),",
        "nc AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS k FROM c0)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    , r{i} AS (SELECT lang, SUM(m) AS s FROM c{i - 1} GROUP BY lang)
    , a{i} AS (
        SELECT c.lang, c.source, c.n,
               c.m * ((SELECT t FROM tot) / (SELECT k FROM nr)) / r.s AS m
        FROM c{i - 1} c JOIN r{i} r ON c.lang = r.lang
    )
    , s{i} AS (SELECT source, SUM(m) AS s FROM a{i} GROUP BY source)
    , c{i} AS (
        SELECT a.lang, a.source, a.n,
               a.m * ((SELECT t FROM tot) / (SELECT k FROM nc)) / s.s AS m
        FROM a{i} a JOIN s{i} s ON a.source = s.source
    )"""
        )
    parts.append(
        f"SELECT lang, source, n, ROUND(m, 6) AS mass, "
        f"ROUND(m / n, 6) AS weight FROM c{rounds}"
    )
    return "\n".join(parts)


def _salsa8_sql(iters: int = 8) -> str:
    parts = [
        "WITH e AS (" + SQL_BIPARTITE_EDGES + "),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src),",
        "idg AS (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY dst),",
        "h0 AS (SELECT vid, CAST(1.0 AS DOUBLE)/(SELECT n FROM n) AS hub FROM v)",
    ]
    for k in range(1, iters + 1):
        parts.append("," + _SALSA_ITER.format(K=k, P=k - 1))
    parts.append(
        f"SELECT h{iters}.vid AS node_id, ROUND(h{iters}.hub, 6) AS hub, "
        f"ROUND(a{iters}.auth, 6) AS authority "
        f"FROM h{iters} JOIN a{iters} ON h{iters}.vid = a{iters}.vid"
    )
    return "\n".join(parts)


def _pagerank5_sql() -> str:
    parts = [
        "WITH e AS (" + SQL_BIPARTITE_EDGES + "),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src),",
        "r0 AS (SELECT vid, 1.0 / (SELECT n FROM n) AS rank FROM v),",
        """dm0 AS (
            SELECT COALESCE(SUM(r.rank), 0) AS dm
            FROM r0 r LEFT JOIN deg ON r.vid = deg.src
            WHERE deg.src IS NULL
        )""",
    ]
    for k in range(1, 6):
        parts.append("," + _PR_ITER.format(K=k, P=k - 1))
    parts.append("SELECT vid AS node_id, ROUND(rank, 6) AS rank FROM r5")
    return "\n".join(parts)


_LPA_ITER = """
    l{K} AS (
        SELECT l{P}.vid, COALESCE(w.label, l{P}.label) AS label
        FROM l{P}
        LEFT JOIN (
            SELECT vid, label FROM (
                SELECT e.src AS vid, l{P}.label,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.src
                           ORDER BY COUNT(*) DESC, l{P}.label ASC
                       ) AS rk
                FROM e JOIN l{P} ON e.dst = l{P}.vid
                GROUP BY e.src, l{P}.label
            ) WHERE rk = 1
        ) w ON l{P}.vid = w.vid
    )"""


_PR_W_ITER = """
    r{K} AS (
        SELECT v.vid,
               (0.15 / (SELECT n FROM n))
               + 0.85 * ((SELECT dm FROM dm{P}) / (SELECT n FROM n))
               + 0.85 * COALESCE(c.c, 0) AS rank
        FROM v
        LEFT JOIN (
            SELECT e.dst AS vid, SUM(r{P}.rank * e.w / deg.d) AS c
            FROM e
            JOIN r{P} ON e.src = r{P}.vid
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) c ON v.vid = c.vid
    ),
    dm{K} AS (
        SELECT COALESCE(SUM(r.rank), 0) AS dm
        FROM r{K} r LEFT JOIN deg ON r.vid = deg.src
        WHERE deg.src IS NULL
    )"""

SQL_BIPARTITE_WEIGHTED_EDGES = """
    SELECT o_custkey AS src, {OFF} + l_suppkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
""".format(OFF=SUPP_OFFSET)


def _pagerank5_weighted_sql() -> str:
    parts = [
        "WITH e AS (" + SQL_BIPARTITE_WEIGHTED_EDGES + "),",
        "v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "deg AS (SELECT src, SUM(w) AS d FROM e GROUP BY src),",
        "r0 AS (SELECT vid, 1.0 / (SELECT n FROM n) AS rank FROM v),",
        """dm0 AS (
            SELECT COALESCE(SUM(r.rank), 0) AS dm
            FROM r0 r LEFT JOIN deg ON r.vid = deg.src
            WHERE deg.src IS NULL
        )""",
    ]
    for k in range(1, 6):
        parts.append("," + _PR_W_ITER.format(K=k, P=k - 1))
    parts.append("SELECT vid AS node_id, ROUND(rank, 6) AS rank FROM r5")
    return "\n".join(parts)


def _lpa2_sql() -> str:
    parts = [
        "WITH e AS (" + SQL_NATION_EDGES + "),",
        "l0 AS (SELECT n_nationkey AS vid, n_nationkey AS label FROM nation)",
        "," + _LPA_ITER.format(K=1, P=0),
        "," + _LPA_ITER.format(K=2, P=1),
        "SELECT vid AS n_nationkey, CAST(label AS INT) AS label FROM l2",
    ]
    return "\n".join(parts)


_DOC_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)
_DOC_STOP_HITS = (
    r"len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|for|was)\b'))"
)
# Kirsch-Mitzenmacher double-hash family over ONE md5 per shingle (mirrors
# dedup._portable_hash_pair): u, v = two 56-bit md5 slices; h_i = (u+i*v) mod
# (2^61-1). No overflow: u + i*v < 2^61 for i < 32.
_MH_U = "CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT)"
_MH_V = "CAST(concat('0x', substr(md5(shingle), 15, 14)) AS BIGINT)"
_PORTABLE_HASH = (
    f"(({_MH_U} + {{seed}} * {_MH_V}) % 2305843009213693951)"
)

_SHINGLES_CTE = """
    arr AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS ord
        FROM arr
    ),
    sh3 AS (
        SELECT doc_id,
               t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS shingle
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
    ),
    sh AS (SELECT DISTINCT doc_id AS id, shingle FROM sh3 WHERE shingle IS NOT NULL)
"""


def _simhash_pairs_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    """DuckDB replica of dedup.simhash64 + simhash_near_pairs: identical md5
    hash slices, identical per-bit majority, identical chunk spans. Every
    intermediate stays < 2^32 (DuckDB errors on 64-bit shift overflow)."""
    from osmgraphing_spark.operators.dedup import _chunk_spans

    n_chunks = max_hamming + 1
    sums = []
    for b in range(64):
        src, off = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        sums.append(
            f"SUM(CASE WHEN (({src} >> {off}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        )

    def half(bits):
        return " | ".join(
            f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
            for i, b in enumerate(bits)
        )

    chunk_selects = []
    for c, (start, width) in enumerate(_chunk_spans(n_chunks)):
        mask = (1 << width) - 1
        if start >= 32:
            key = f"((sig_hi >> {start - 32}) & {mask})"
        elif start + width <= 32:
            key = f"((sig_lo >> {start}) & {mask})"
        else:
            low_w = 32 - start
            key = (
                f"(((sig_lo >> {start}) & {(1 << low_w) - 1}) | "
                f"((sig_hi & {(1 << (width - low_w)) - 1}) << {low_w}))"
            )
        chunk_selects.append(
            f"SELECT id, {c} AS chunk, {key} AS key, sig_hi, sig_lo FROM sig"
        )

    return f"""
        WITH tok AS (
            SELECT doc_id AS id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents
        ),
        h AS (
            SELECT id,
                   CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h_hi,
                   CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS h_lo
            FROM tok
        ),
        sums AS (SELECT id, {", ".join(sums)} FROM h GROUP BY id),
        sig AS (
            SELECT id, {half(range(32, 64))} AS sig_hi, {half(range(32))} AS sig_lo
            FROM sums
        ),
        chunks AS ({" UNION ALL ".join(chunk_selects)}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                   a.sig_hi AS hi_a, a.sig_lo AS lo_a,
                   b.sig_hi AS hi_b, b.sig_lo AS lo_b
            FROM chunks a
            JOIN chunks b ON a.chunk = b.chunk AND a.key = b.key AND a.id < b.id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= {max_hamming}
    """


def _embed_ann_sql(dim: int = ANN_DIM, k: int = 5, n_planes: int = 8, n_tables: int = 4) -> str:
    """DuckDB replica of similarity.ann_topk_portable: the seeded integer
    hyperplanes are inlined as literal arrays; quantized projections are
    exact integers in double arithmetic, so the candidate buckets (and thus
    the exact top-k) match Spark's bit-for-bit."""
    from osmgraphing_spark.operators.similarity import int_hyperplanes

    planes = int_hyperplanes(dim, n_planes, n_tables)
    buck_selects = []
    for t in range(n_tables):
        terms = []
        for p in range(n_planes):
            lit = "[" + ", ".join(str(v) for v in planes[t][p]) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product(q, {lit}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        buck_selects.append(
            f"SELECT vec_id, {t} AS tbl, {' + '.join(terms)} AS bucket FROM qv"
        )
    return f"""
        WITH qv AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1024, 0)) AS q
            FROM embeddings
        ),
        buck AS ({" UNION ALL ".join(buck_selects)}),
        cand AS (
            SELECT DISTINCT qq.vec_id AS query_id, vv.vec_id AS neighbor_id
            FROM buck vv
            JOIN buck qq ON vv.tbl = qq.tbl AND vv.bucket = qq.bucket
            WHERE qq.vec_id < 10 AND vv.vec_id <> qq.vec_id
        ),
        q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
            FROM embeddings WHERE vec_id < 10
        ),
        v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nvec FROM embeddings),
        scored AS (
            SELECT c.query_id, c.neighbor_id,
                   list_dot_product(qvec, nvec)
                   / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(nvec, nvec))) AS s
            FROM cand c
            JOIN q ON c.query_id = q.query_id
            JOIN v ON c.neighbor_id = v.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, ROUND(s, 6) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY ROUND(s, 6) DESC, neighbor_id ASC
                   ) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def _embed_near_dups_sql(
    dim: int = ANN_DIM,
    threshold: float = NEAR_DUP_THRESHOLD,
    n_planes: int = NEAR_DUP_PLANES,
    n_tables: int = NEAR_DUP_TABLES,
) -> str:
    """DuckDB replica of similarity.near_dup_pairs: same literal integer
    hyperplanes, bucket SELF-join (id_a < id_b), exact cosine rescoring,
    rounded-score threshold — candidates and scores match bit-for-bit."""
    from osmgraphing_spark.operators.similarity import int_hyperplanes

    planes = int_hyperplanes(dim, n_planes, n_tables)
    buck_selects = []
    for t in range(n_tables):
        terms = []
        for p in range(n_planes):
            lit = "[" + ", ".join(str(v) for v in planes[t][p]) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product(q, {lit}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        buck_selects.append(
            f"SELECT vec_id, {t} AS tbl, {' + '.join(terms)} AS bucket FROM qv"
        )
    return f"""
        WITH qv AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1024, 0)) AS q
            FROM embeddings
        ),
        buck AS ({" UNION ALL ".join(buck_selects)}),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buck a
            JOIN buck b ON a.tbl = b.tbl AND a.bucket = b.bucket
            WHERE a.vec_id < b.vec_id
        ),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        scored AS (
            SELECT c.id_a, c.id_b,
                   ROUND(
                       list_dot_product(va.vec, vb.vec)
                       / (sqrt(list_dot_product(va.vec, va.vec))
                          * sqrt(list_dot_product(vb.vec, vb.vec))), 6) AS score
            FROM cand c
            JOIN v va ON c.id_a = va.vec_id
            JOIN v vb ON c.id_b = vb.vec_id
        )
        SELECT id_a, id_b, score FROM scored WHERE score >= {threshold}
    """


def _embed_ivf_sql(
    dim: int = ANN_DIM, k: int = 5, n_cells: int = 8, nprobe: int = 3
) -> str:
    """DuckDB replica of similarity.ivf_topk_portable: the data-independent
    integer centroids are inlined; cell scores are exact integers in double
    arithmetic, so cell assignment, probe set and the exact top-k match
    Spark's bit-for-bit."""
    from osmgraphing_spark.operators.similarity import int_centroids

    cents = int_centroids(dim, n_cells)
    score_exprs = []
    for c in cents:
        terms = [f"q[{d + 1}] * ({w})" for d, w in enumerate(c) if w]
        score_exprs.append(" + ".join(terms))
    cs = "[" + ", ".join(score_exprs) + "]"
    return f"""
        WITH qv AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1024, 0)) AS q
            FROM embeddings
        ),
        cs AS (SELECT vec_id, {cs} AS cs FROM qv),
        cells AS (
            SELECT vec_id, CAST(list_position(cs, list_aggregate(cs, 'max')) AS INT) AS cell
            FROM cs
        ),
        probes AS (
            SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY s DESC, cell ASC
                ) AS prk
                FROM (
                    SELECT vec_id, unnest(cs) AS s,
                           CAST(generate_subscripts(cs, 1) AS INT) AS cell
                    FROM cs WHERE vec_id < 10
                )
            ) WHERE prk <= {nprobe}
        ),
        cand AS (
            SELECT DISTINCT p.query_id, cells.vec_id AS neighbor_id
            FROM probes p JOIN cells ON cells.cell = p.cell
            WHERE cells.vec_id <> p.query_id
        ),
        q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
            FROM embeddings WHERE vec_id < 10
        ),
        v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nvec FROM embeddings),
        scored AS (
            SELECT c.query_id, c.neighbor_id,
                   list_dot_product(qvec, nvec)
                   / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(nvec, nvec))) AS s
            FROM cand c
            JOIN q ON c.query_id = q.query_id
            JOIN v ON c.neighbor_id = v.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, ROUND(s, 6) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY ROUND(s, 6) DESC, neighbor_id ASC
                   ) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def _mis_nations_sql(rounds: int = MIS_ROUNDS) -> str:
    """DuckDB replica of mis.luby_mis on the nation-clique graph: vids =
    dense rank of sorted keys; ``rounds`` chained round blocks, each
    selecting the vertices whose fixed-width md5 key beats every live
    neighbor's, then removing winners + neighborhoods."""
    parts = [
        """WITH verts AS (
            SELECT n_nationkey,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1
                        AS BIGINT) AS vid
            FROM nation
        ),
        k AS (
            SELECT vid,
                   md5(CAST(vid AS VARCHAR)) || '|' ||
                   lpad(CAST(vid AS VARCHAR), 12, '0') AS key
            FROM verts
        ),
        a0 AS (SELECT vid FROM verts),
        e0 AS (
            SELECT va.vid AS src, vb.vid AS dst
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey
             AND a.n_nationkey <> b.n_nationkey
            JOIN verts va ON va.n_nationkey = a.n_nationkey
            JOIN verts vb ON vb.n_nationkey = b.n_nationkey
        )"""
    ]
    round_tpl = """
        m{r} AS (
            SELECT a.vid, CAST({r} AS INT) AS rnd
            FROM a{p} a JOIN k ON k.vid = a.vid
            LEFT JOIN (
                SELECT e.src AS vid, MIN(kd.key) AS nmin
                FROM e{p} e JOIN k kd ON kd.vid = e.dst
                GROUP BY e.src
            ) nm ON nm.vid = a.vid
            WHERE nm.nmin IS NULL OR k.key < nm.nmin
        ),
        rm{r} AS (
            SELECT vid FROM m{r}
            UNION
            SELECT e.dst AS vid FROM e{p} e JOIN m{r} m ON e.src = m.vid
        ),
        a{r} AS (
            SELECT vid FROM a{p}
            WHERE vid NOT IN (SELECT vid FROM rm{r})
        ),
        e{r} AS (
            SELECT src, dst FROM e{p}
            WHERE src IN (SELECT vid FROM a{r})
              AND dst IN (SELECT vid FROM a{r})
        )"""
    for r in range(1, rounds + 1):
        parts.append(round_tpl.format(r=r, p=r - 1))
    unions = " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, rounds + 1))
    return f"""{",".join(parts)}
        SELECT v.n_nationkey, m.rnd
        FROM ({unions}) m JOIN verts v ON v.vid = m.vid
    """


def _kmeans_cte(dim: int = ANN_DIM, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """DuckDB replica of kmeans.lloyd_kmeans as a reusable CTE chain:
    chained CTEs replay every Lloyd iteration — assignment by exact-int
    squared L2 (lowest cell id on ties), centroid update as
    FLOOR((2·Σx + n) / 2n) per component (the same round-half-up the
    Spark side computes on Python ints), empty cells retired — ending at
    a{iters}, the final assignment under the final centroids."""
    from osmgraphing_spark.operators.kmeans import int_centroids

    cents = int_centroids(dim, k)
    vals = ", ".join(
        f"({j + 1}, CAST([{', '.join(str(float(x)) for x in c)}] AS DOUBLE[]))"
        for j, c in enumerate(cents)
    )
    parts = [
        f"""qv AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> round(x * 1024, 0)) AS q
            FROM embeddings
        ),
        c0 AS (SELECT * FROM (VALUES {vals}) AS t(cell, c))"""
    ]
    assign_tpl = """
        a{t} AS (
            SELECT vec_id, q, cell, dist FROM (
                SELECT vec_id, q, cell, dist,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY dist ASC, cell ASC
                       ) AS rk
                FROM (
                    SELECT v.vec_id, v.q, c.cell,
                           list_dot_product(v.q, v.q)
                           - 2 * list_dot_product(v.q, c.c)
                           + list_dot_product(c.c, c.c) AS dist
                    FROM qv v CROSS JOIN c{t} c
                )
            ) WHERE rk = 1
        )"""
    update_tpl = """
        u{t} AS (
            SELECT cell, i,
                   CAST(FLOOR((2 * SUM(x) + COUNT(*)) / (2.0 * COUNT(*)))
                        AS DOUBLE) AS cv
            FROM (SELECT cell, unnest(q) AS x,
                         generate_subscripts(q, 1) AS i
                  FROM a{t})
            GROUP BY cell, i
        ),
        c{t1} AS (SELECT cell, list(cv ORDER BY i) AS c FROM u{t} GROUP BY cell)"""
    for t in range(iters):
        parts.append(assign_tpl.format(t=t))
        parts.append(update_tpl.format(t=t, t1=t + 1))
    parts.append(assign_tpl.format(t=iters))
    return ",".join(parts)


def _embed_kmeans_sql(dim: int = ANN_DIM, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    return f"""WITH {_kmeans_cte(dim, k, iters)}
        SELECT vec_id, CAST(cell AS INT) AS cell, CAST(dist AS BIGINT) AS dist
        FROM a{iters}
    """


def _embed_semdedup_sql(threshold: float, iters: int = KMEANS_ITERS) -> str:
    """SemDeDup oracle: k-means replay → within-cell self-join → exact
    cosine on the raw vectors (list_dot_product folds in the same order
    as the Spark-side F.aggregate, so doubles match bit-for-bit)."""
    return f"""WITH {_kmeans_cte()},
        cells AS (SELECT vec_id, CAST(cell AS INT) AS cell FROM a{iters}),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        cand AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell
            FROM cells a JOIN cells b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT c.id_a, c.id_b, c.cell,
               ROUND(
                   list_dot_product(va.vec, vb.vec)
                   / (sqrt(list_dot_product(va.vec, va.vec))
                      * sqrt(list_dot_product(vb.vec, vb.vec))), 6) AS score
        FROM cand c
        JOIN v va ON c.id_a = va.vec_id
        JOIN v vb ON c.id_b = vb.vec_id
        WHERE ROUND(
                  list_dot_product(va.vec, vb.vec)
                  / (sqrt(list_dot_product(va.vec, va.vec))
                     * sqrt(list_dot_product(vb.vec, vb.vec))), 6) >= {threshold}
    """


def _pq_cte(dim: int = ANN_DIM, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS) -> str:
    """Shared CTE body replaying operators/pq end to end in DuckDB:
    subvector split, per-subspace exact-int Lloyd (round-half-up means,
    lowest-cell ties, retired empties), final per-sub assignment a{iters}
    and final codebooks c{iters}. Same integer algebra as
    _embed_kmeans_sql, vectorized over the (sub) dimension."""
    from osmgraphing_spark.operators import pq as pqmod

    dsub = dim // m
    books = pqmod.init_codebooks(dim, m, k)
    vals = ", ".join(
        f"({s}, {cid}, CAST([{', '.join(str(float(x)) for x in comps)}] AS DOUBLE[]))"
        for s, book in enumerate(books)
        for cid, comps in book
    )
    slices = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub, q[{s * dsub + 1}:{(s + 1) * dsub}] AS qs FROM qv"
        for s in range(m)
    )
    parts = [
        f"""qv AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> round(x * 1024, 0)) AS q
            FROM embeddings
        ),
        sv AS ({slices}),
        c0 AS (SELECT * FROM (VALUES {vals}) AS t(sub, cell, c))"""
    ]
    assign_tpl = """
        a{t} AS (
            SELECT vec_id, sub, qs, cell, dist FROM (
                SELECT vec_id, sub, qs, cell, dist,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id, sub
                           ORDER BY dist ASC, cell ASC
                       ) AS rk
                FROM (
                    SELECT v.vec_id, v.sub, v.qs, c.cell,
                           list_dot_product(v.qs, v.qs)
                           - 2 * list_dot_product(v.qs, c.c)
                           + list_dot_product(c.c, c.c) AS dist
                    FROM sv v JOIN c{t} c ON v.sub = c.sub
                )
            ) WHERE rk = 1
        )"""
    update_tpl = """
        u{t} AS (
            SELECT sub, cell, i,
                   CAST(FLOOR((2 * SUM(x) + COUNT(*)) / (2.0 * COUNT(*)))
                        AS DOUBLE) AS cv
            FROM (SELECT sub, cell, unnest(qs) AS x,
                         generate_subscripts(qs, 1) AS i
                  FROM a{t})
            GROUP BY sub, cell, i
        ),
        c{t1} AS (SELECT sub, cell, list(cv ORDER BY i) AS c
                  FROM u{t} GROUP BY sub, cell)"""
    for t in range(iters):
        parts.append(assign_tpl.format(t=t))
        parts.append(update_tpl.format(t=t, t1=t + 1))
    parts.append(assign_tpl.format(t=iters))
    return ",".join(parts)


def _embed_pq_sql() -> str:
    return f"""WITH {_pq_cte()}
        SELECT vec_id, CAST(sub AS INT) AS sub, CAST(cell AS INT) AS cell,
               CAST(dist AS BIGINT) AS dist
        FROM a{PQ_ITERS}
    """


def _embed_pq_topk_sql() -> str:
    return f"""WITH {_pq_cte()},
        codes AS (SELECT vec_id AS neighbor_id, sub, cell FROM a{PQ_ITERS}),
        queries AS (SELECT vec_id AS query_id, sub, qs FROM sv WHERE vec_id < 10),
        lut AS (
            SELECT q.query_id, q.sub, c.cell,
                   list_dot_product(q.qs, q.qs)
                   - 2 * list_dot_product(q.qs, c.c)
                   + list_dot_product(c.c, c.c) AS d
            FROM queries q JOIN c{PQ_ITERS} c ON q.sub = c.sub
        ),
        adc AS (
            SELECT l.query_id, codes.neighbor_id, SUM(l.d) AS adc_dist
            FROM codes JOIN lut l
              ON codes.sub = l.sub AND codes.cell = l.cell
            GROUP BY l.query_id, codes.neighbor_id
        )
        SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
               CAST(rk AS INT) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC
            ) AS rk FROM adc
        ) WHERE rk <= 5
    """


def oracle_sql() -> dict[str, str]:
    langcases = []
    for lg, markers in X.LANG_MARKERS.items():
        pat = "|".join(markers)
        langcases.append(
            rf"len(regexp_extract_all(lower(text), '\b({pat})\b')) AS h_{lg}"
        )
    lang_hits = ", ".join(langcases)

    return {
        "link_edges": f"SELECT src, dst FROM ({SQL_BIPARTITE_EDGES}) t",
        "link_degrees": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            o AS (SELECT src AS vid, COUNT(*) AS out_deg FROM e GROUP BY src),
            i AS (SELECT dst AS vid, COUNT(*) AS in_deg FROM e GROUP BY dst)
            SELECT COALESCE(o.vid, i.vid) AS vid,
                   COALESCE(out_deg, 0) AS out_deg,
                   COALESCE(in_deg, 0) AS in_deg
            FROM o FULL OUTER JOIN i ON o.vid = i.vid
        """,
        "part_type_revenue": """
            SELECT p_type, COUNT(*) AS n_items,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type
        """,
        "supplier_region_stats": """
            SELECT r_name, COUNT(*) AS n_suppliers,
                   ROUND(SUM(s_acctbal), 4) AS total_acctbal,
                   ROUND(MIN(s_acctbal), 4) AS min_acctbal,
                   ROUND(MAX(s_acctbal), 4) AS max_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "link_edge_sample": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES})
            SELECT src, dst FROM e
            WHERE CAST(concat('0x', substr(md5(concat(CAST(src AS VARCHAR), '|',
                                                      CAST(dst AS VARCHAR))), 1, 14))
                       AS BIGINT) % 1000000 < 50000
        """,
        "link_degree_hist": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            deg AS (
                SELECT vid, COUNT(*) AS deg FROM (
                    SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e
                ) GROUP BY vid
            )
            SELECT CAST(length(CAST(deg AS VARCHAR)) AS INT) AS magnitude,
                   COUNT(*) AS n_vertices, MIN(deg) AS min_deg, MAX(deg) AS max_deg
            FROM deg GROUP BY 1
        """,
        "link_copurchase": f"""
            WITH e AS (
                SELECT DISTINCT o_custkey AS m, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ),
            pd AS (
                SELECT p FROM e GROUP BY p
                HAVING COUNT(*) <= {COPURCHASE_MAX_PD}
            ),
            nb AS (SELECT e.m, e.p FROM e JOIN pd ON e.p = pd.p),
            sh AS (
                SELECT a.m AS u, b.m AS v, COUNT(*) AS shared
                FROM nb a JOIN nb b ON a.p = b.p AND a.m < b.m
                GROUP BY a.m, b.m
                HAVING COUNT(*) >= {COPURCHASE_MIN}
            ),
            md AS (SELECT m, COUNT(*) AS d FROM e GROUP BY m)
            SELECT sh.u, sh.v, sh.shared,
                   ROUND(CAST(sh.shared AS DOUBLE)
                         / (du.d + dv.d - sh.shared), 6) AS jaccard
            FROM sh JOIN md du ON du.m = sh.u JOIN md dv ON dv.m = sh.v
        """,
        "link_adamic_adar": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            und AS (
                SELECT src, dst FROM e
                UNION
                SELECT dst AS src, src AS dst FROM e
            ),
            deg AS (
                SELECT src AS w, COUNT(*) AS d FROM und GROUP BY src
                HAVING COUNT(*) <= {AA_CENTER_CAP}
            ),
            nb AS (
                SELECT und.src AS w, und.dst AS nbr, deg.d
                FROM und JOIN deg ON deg.w = und.src
            ),
            wedge AS (
                SELECT a.w, a.nbr AS u, b.nbr AS v, a.d
                FROM nb a JOIN nb b ON a.w = b.w AND a.nbr < b.nbr
            ),
            scored AS (
                SELECT u, v, COUNT(*) AS common,
                       ROUND(SUM(1.0 / ln(d)), 6) AS adamic_adar
                FROM wedge GROUP BY u, v
            ),
            predicted AS (
                SELECT s.* FROM scored s
                LEFT JOIN und ON und.src = s.u AND und.dst = s.v
                WHERE und.src IS NULL
            )
            SELECT u AS node_a, v AS node_b, common, adamic_adar
            FROM predicted
            ORDER BY common DESC, node_a, node_b
            LIMIT 50
        """,
        "link_predictors": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            und AS (
                SELECT src, dst FROM e
                UNION
                SELECT dst AS src, src AS dst FROM e
            ),
            deg AS (SELECT src AS w, COUNT(*) AS d FROM und GROUP BY src),
            cdeg AS (SELECT w, d FROM deg WHERE d <= {AA_CENTER_CAP}),
            nb AS (
                SELECT und.src AS w, und.dst AS nbr, cdeg.d
                FROM und JOIN cdeg ON cdeg.w = und.src
            ),
            wedge AS (
                SELECT a.w, a.nbr AS u, b.nbr AS v, a.d
                FROM nb a JOIN nb b ON a.w = b.w AND a.nbr < b.nbr
            ),
            scored AS (
                SELECT u, v, COUNT(*) AS common,
                       SUM(1.0 / ln(d)) AS aa,
                       SUM(1.0 / d) AS ra
                FROM wedge GROUP BY u, v
            ),
            predicted AS (
                SELECT s.* FROM scored s
                LEFT JOIN und ON und.src = s.u AND und.dst = s.v
                WHERE und.src IS NULL
            )
            SELECT p.u AS node_a, p.v AS node_b, p.common,
                   ROUND(CAST(p.common AS DOUBLE)
                         / (du.d + dv.d - p.common), 6) AS jaccard,
                   ROUND(CAST(p.common AS DOUBLE)
                         / sqrt(CAST(du.d AS DOUBLE) * dv.d), 6) AS cosine,
                   ROUND(p.aa, 6) AS adamic_adar,
                   ROUND(p.ra, 6) AS resource_alloc,
                   CAST(du.d * dv.d AS BIGINT) AS pref_attach
            FROM predicted p
            JOIN deg du ON du.w = p.u
            JOIN deg dv ON dv.w = p.v
            ORDER BY p.common DESC, node_a, node_b
            LIMIT 50
        """,
        "link_butterflies": f"""
            WITH e AS (
                SELECT DISTINCT o_custkey AS m, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ),
            pd AS (
                SELECT p FROM e GROUP BY p
                HAVING COUNT(*) <= {COPURCHASE_MAX_PD}
            ),
            nb AS (SELECT e.m, e.p FROM e JOIN pd ON e.p = pd.p),
            sh AS (
                SELECT a.m AS u, b.m AS v, COUNT(*) AS s
                FROM nb a JOIN nb b ON a.p = b.p AND a.m < b.m
                GROUP BY a.m, b.m
                HAVING COUNT(*) >= 2
            ),
            per_pair AS (
                SELECT u, v, CAST(s * (s - 1) / 2 AS BIGINT) AS bf, s FROM sh
            ),
            credits AS (
                SELECT u AS m, bf, s FROM per_pair
                UNION ALL
                SELECT v AS m, bf, s FROM per_pair
            )
            SELECT m AS custkey, CAST(SUM(bf) AS BIGINT) AS butterflies,
                   MAX(s) AS max_shared
            FROM credits GROUP BY m
            ORDER BY butterflies DESC, custkey
            LIMIT 30
        """,
        "pagerank5": _pagerank5_sql(),
        "pagerank5_weighted": _pagerank5_weighted_sql(),
        "ppr5": _ppr5_sql(),
        # spam mass from the two rank chains above, on the 6-dp grid both
        # engines agree on (the unrounded last-ulp may differ; the grid is
        # the contract)
        "link_spam_mass": f"""
            SELECT a.node_id, a.rank AS pr, b.rank AS tr,
                   ROUND((a.rank - b.rank) / a.rank, 6) AS spam_mass
            FROM ({_pagerank5_sql()}) a
            JOIN ({_ppr5_sql()}) b ON a.node_id = b.node_id
        """,
        "hits8": _hits8_sql(),
        "salsa8": _salsa8_sql(),
        "eigen_links": _eigen_sql(),
        "kcore_links": _kcore_sql(),
        "triangles_per_vertex_nations": """
            SELECT a.n_nationkey, CAST(COUNT(*) AS BIGINT) AS triangles
            FROM nation a
            JOIN nation b ON a.n_regionkey = b.n_regionkey
                         AND b.n_nationkey <> a.n_nationkey
            JOIN nation c ON b.n_regionkey = c.n_regionkey
                         AND c.n_nationkey > b.n_nationkey
                         AND c.n_nationkey <> a.n_nationkey
            GROUP BY a.n_nationkey
        """,
        "cc_nations": """
            SELECT n_nationkey,
                   MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS component
            FROM nation
        """,
        "modularity_nations": f"""
            WITH {_NATION_RING_CTES},
            mx AS (
                SELECT src, dst FROM e
                UNION
                SELECT a.n_nationkey, b.n_nationkey
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            ue AS (
                SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM mx WHERE src <> dst
            ),
            lab AS (
                SELECT na.n_regionkey AS la, nb.n_regionkey AS lb
                FROM ue u
                JOIN nation na ON na.n_nationkey = u.a
                JOIN nation nb ON nb.n_nationkey = u.b
            ),
            mc AS (SELECT COUNT(*) AS n FROM lab),
            ends AS (
                SELECT la AS label FROM lab
                UNION ALL
                SELECT lb AS label FROM lab
            ),
            deg AS (SELECT label, COUNT(*) AS degree_sum FROM ends GROUP BY label),
            intra AS (
                SELECT la AS label, COUNT(*) AS c FROM lab WHERE la = lb GROUP BY la
            )
            SELECT deg.label,
                   COALESCE(intra.c, 0) AS intra_edges,
                   deg.degree_sum,
                   ROUND(
                       COALESCE(intra.c, 0) / CAST((SELECT n FROM mc) AS DOUBLE)
                       - POW(deg.degree_sum / (2.0 * (SELECT n FROM mc)), 2),
                       6
                   ) AS q
            FROM deg LEFT JOIN intra ON deg.label = intra.label
        """,
        "link_dist_hist": f"""
            WITH RECURSIVE {_NATION_RING_CTES},
            steps AS (
                SELECT src AS a, dst AS b, 1 AS d FROM e
                UNION
                SELECT s.a, e.dst, s.d + 1
                FROM steps s JOIN e ON e.src = s.b
                WHERE s.d < 40
            ),
            mind AS (
                SELECT a, b, MIN(d) AS d FROM steps WHERE a <> b GROUP BY a, b
            ),
            nv AS (
                SELECT COUNT(*) AS n FROM (
                    SELECT src AS v FROM e UNION SELECT dst AS v FROM e
                )
            ),
            ts AS (
                SELECT unnest(generate_series(0, (SELECT MAX(d) FROM mind))) AS tt
            )
            SELECT CAST(tt AS INT) AS t,
                   (SELECT n FROM nv)
                   + (SELECT COUNT(*) FROM mind WHERE d <= tt) AS pairs
            FROM ts
        """,
        "scc_nations": f"""
            WITH RECURSIVE {_NATION_RING_CTES},
            reach AS (
                SELECT src AS a, dst AS b FROM e
                UNION
                SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            ),
            verts AS (
                SELECT src AS v FROM e UNION SELECT dst AS v FROM e
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS w
                FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            )
            SELECT verts.v AS node_id, LEAST(verts.v, COALESCE(MIN(w), verts.v)) AS scc
            FROM verts LEFT JOIN mutual ON mutual.v = verts.v
            GROUP BY verts.v
        """,
        # SimRank replayed round-for-round (chained CTEs; the diagonal is
        # re-injected each round exactly like the Spark loop)
        "simrank_nations": _simrank_sql(),
        "link_rich_club": f"""
            WITH und AS (
                SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM ({SQL_BIPARTITE_EDGES}) e WHERE src <> dst
            ),
            deg AS (
                SELECT vid, COUNT(*) AS deg FROM (
                    SELECT a AS vid FROM und UNION ALL SELECT b AS vid FROM und
                ) u GROUP BY vid
            ),
            ks AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in RICH_CLUB_KS)}) t(k)),
            nk AS (
                SELECT k, COUNT(*) AS n_rich FROM deg JOIN ks ON deg.deg > ks.k
                GROUP BY k
            ),
            ek AS (
                SELECT k, COUNT(*) AS rich_edges
                FROM und
                JOIN deg da ON da.vid = und.a
                JOIN deg db ON db.vid = und.b
                JOIN ks ON da.deg > ks.k AND db.deg > ks.k
                GROUP BY k
            )
            SELECT CAST(nk.k AS INTEGER) AS k, nk.n_rich,
                   COALESCE(ek.rich_edges, 0) AS rich_edges,
                   ROUND(2.0 * COALESCE(ek.rich_edges, 0)
                         / (CAST(nk.n_rich AS DOUBLE) * (nk.n_rich - 1)), 6) AS phi
            FROM nk LEFT JOIN ek ON nk.k = ek.k
            WHERE nk.n_rich >= 2
        """,
        "link_attr_assort": f"""
            WITH {_NATION_RING_CTES},
            m AS (
                SELECT src, dst FROM e
                UNION
                SELECT a.n_nationkey, b.n_nationkey
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            mix AS (
                SELECT la.n_regionkey AS la, lb.n_regionkey AS lb, COUNT(*) AS n
                FROM m
                JOIN nation la ON la.n_nationkey = m.src
                JOIN nation lb ON lb.n_nationkey = m.dst
                GROUP BY la.n_regionkey, lb.n_regionkey
            ),
            tr AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS trn
                   FROM mix WHERE la = lb),
            rowc AS (SELECT la, CAST(SUM(n) AS BIGINT) AS ri FROM mix GROUP BY la),
            colc AS (SELECT lb AS la, CAST(SUM(n) AS BIGINT) AS ci FROM mix GROUP BY lb),
            sab AS (SELECT CAST(COALESCE(SUM(ri * ci), 0) AS BIGINT) AS sabn
                    FROM rowc JOIN colc USING (la)),
            mm AS (SELECT CAST(SUM(n) AS BIGINT) AS m FROM mix)
            SELECT CASE WHEN m * m > sabn THEN
                       ROUND(CAST(m * trn - sabn AS DOUBLE)
                             / CAST(m * m - sabn AS DOUBLE), 6)
                   END AS assortativity
            FROM tr, sab, mm
        """,
        # maximal matching replayed round-for-round (chained CTEs)
        "matching_nations": _matching_sql(MATCHING_ORACLE_ROUNDS),
        # Jones-Plassmann coloring replayed round-for-round (chained CTEs)
        "coloring_nations": _coloring_sql(COLORING_ORACLE_ROUNDS),
        # fixed-iteration Katz as bounded-hop walk enumeration: a row of
        # walk(vid, hops=j) is one distinct walk of length j ending at vid
        # (UNION ALL keeps multiplicity), so SUM(beta * alpha^hops) per vid
        # is exactly beta * sum_j alpha^j * W_j(v)
        "katz_nations": f"""
            WITH RECURSIVE {_NATION_RING_CTES},
            walk(vid, hops) AS (
                SELECT n_nationkey, 0 FROM nation
                UNION ALL
                SELECT e.dst, w.hops + 1
                FROM walk w JOIN e ON e.src = w.vid
                WHERE w.hops < {KATZ_ITERS}
            )
            SELECT CAST(vid AS INTEGER) AS n_nationkey,
                   ROUND(SUM(POWER({KATZ_ALPHA}, hops)), 6) AS katz
            FROM walk GROUP BY vid
        """,
        # MSF cycle property: edge ∈ MSF iff its endpoints are not connected
        # using only edges of strictly smaller (w, u, v) rank. reach(r, a, b)
        # is the connectivity closure of the sub-graph of edges ranked < r —
        # Kruskal re-derived in SQL, a different algorithm than the Spark
        # side's Borůvka contraction; the (w, u, v) total order makes the
        # forest unique so the two must agree exactly.
        "mst_nations": """
            WITH RECURSIVE ce AS (
                SELECT LEAST(a.n_nationkey, b.n_nationkey) AS u,
                       GREATEST(a.n_nationkey, b.n_nationkey) AS v,
                       MIN(CAST(1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5)
                           AS DOUBLE)) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
                GROUP BY 1, 2
            ),
            rk AS (
                SELECT u, v, w, ROW_NUMBER() OVER (ORDER BY w, u, v) AS r
                FROM ce
            ),
            sym AS (
                SELECT r, u AS a, v AS b FROM rk
                UNION ALL
                SELECT r, v AS a, u AS b FROM rk
            ),
            reach(r, a, b) AS (
                SELECT h.r, s.a, s.b FROM sym s JOIN rk h ON s.r < h.r
                UNION
                SELECT re.r, re.a, s.b
                FROM reach re JOIN sym s ON s.r < re.r AND s.a = re.b
            )
            SELECT CAST(k.u AS INTEGER) AS u, CAST(k.v AS INTEGER) AS v,
                   CAST(ROUND(k.w, 6) AS DOUBLE) AS w
            FROM rk k
            WHERE NOT EXISTS (
                SELECT 1 FROM reach re
                WHERE re.r = k.r AND re.a = k.u AND re.b = k.v
            )
        """,
        # Betweenness via the pair-dependency identity (Brandes 2001, eq. σ_st(v)
        # = σ_sv·σ_vt when d(s,v)+d(v,t)=d(s,t)): enumerate shortest walks to
        # get d and σ, then one triple self-join — independent of the Spark
        # side's forward/backward sweep formulation. Walk cap 40 ≥ diameter.
        "betweenness_nations": f"""
            WITH RECURSIVE {_NATION_RING_CTES},
            walk(source, vid, hops) AS (
                SELECT n_nationkey, n_nationkey, 0 FROM nation
                UNION ALL
                SELECT p.source, e.dst, p.hops + 1
                FROM walk p JOIN e ON e.src = p.vid
                WHERE p.hops < 40
            ),
            d AS (
                SELECT source, vid, MIN(hops) AS dist
                FROM walk GROUP BY source, vid
            ),
            sig AS (
                SELECT w.source, w.vid, d.dist,
                       CAST(COUNT(*) AS DOUBLE) AS sigma
                FROM walk w
                JOIN d ON w.source = d.source AND w.vid = d.vid
                      AND w.hops = d.dist
                GROUP BY w.source, w.vid, d.dist
            )
            SELECT CAST(sv.vid AS INTEGER) AS node_id,
                   ROUND(SUM(sv.sigma * vt.sigma / st.sigma), 6) AS betweenness
            FROM sig sv
            JOIN sig vt ON vt.source = sv.vid
            JOIN sig st ON st.source = sv.source AND st.vid = vt.vid
            WHERE sv.source <> sv.vid
              AND vt.source <> vt.vid
              AND sv.source <> vt.vid
              AND sv.dist + vt.dist = st.dist
            GROUP BY sv.vid
            HAVING SUM(sv.sigma * vt.sigma / st.sigma) > 0
        """,
        "link_reciprocity": f"""
            WITH {_NATION_RING_CTES},
            m AS (
                SELECT src, dst FROM e
                UNION
                SELECT a.n_nationkey, b.n_nationkey
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            )
            SELECT
                (SELECT COUNT(*) FROM m) AS n_edges,
                (SELECT COUNT(*) FROM m
                 WHERE EXISTS (SELECT 1 FROM m r
                               WHERE r.src = m.dst AND r.dst = m.src))
                    AS n_reciprocal,
                ROUND(
                    (SELECT COUNT(*) FROM m
                     WHERE EXISTS (SELECT 1 FROM m r
                                   WHERE r.src = m.dst AND r.dst = m.src))
                    / CAST((SELECT COUNT(*) FROM m) AS DOUBLE), 6
                ) AS reciprocity
        """,
        "link_assortativity": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            od AS (SELECT src, COUNT(*) AS sd FROM e GROUP BY src),
            idg AS (SELECT dst, COUNT(*) AS dd FROM e GROUP BY dst),
            j AS (
                SELECT CAST(sd AS DOUBLE) AS x, CAST(dd AS DOUBLE) AS y
                FROM e JOIN od USING (src) JOIN idg USING (dst)
            ),
            s AS (
                SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                       SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
                FROM j
            )
            SELECT n AS n_edges,
                   CASE WHEN (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
                        THEN ROUND((sxy - sx * sy / n)
                                   / sqrt((sxx - sx * sx / n)
                                          * (syy - sy * sy / n)), 6)
                   END AS assortativity
            FROM s
        """,
        "link_clustering": f"""
            WITH {_NATION_RING_CTES},
            m AS (
                SELECT src, dst FROM e
                UNION
                SELECT a.n_nationkey, b.n_nationkey
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            und AS (
                SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM m WHERE src <> dst
            ),
            deg AS (
                SELECT v AS vid, COUNT(*) AS degree
                FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
                GROUP BY v
            ),
            tri AS (
                SELECT x.a AS v1, x.b AS v2, y.b AS v3
                FROM und x
                JOIN und y ON y.a = x.b
                JOIN und z ON z.a = x.a AND z.b = y.b
            ),
            tcnt AS (
                SELECT v AS vid, COUNT(*) AS triangles
                FROM (SELECT v1 AS v FROM tri UNION ALL SELECT v2 FROM tri
                      UNION ALL SELECT v3 FROM tri)
                GROUP BY v
            )
            SELECT CAST(deg.vid AS BIGINT) AS vid, deg.degree,
                   COALESCE(tcnt.triangles, 0) AS triangles,
                   CASE WHEN deg.degree >= 2
                        THEN ROUND(COALESCE(tcnt.triangles, 0)
                                   / (deg.degree * (deg.degree - 1) / 2.0), 6)
                        ELSE 0.0
                   END AS coefficient
            FROM deg LEFT JOIN tcnt ON tcnt.vid = deg.vid
        """,
        "scc_build_order": f"""
            WITH RECURSIVE {_NATION_RING_CTES},
            reach AS (
                SELECT src AS a, dst AS b FROM e
                UNION
                SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            ),
            verts AS (
                SELECT src AS v FROM e UNION SELECT dst AS v FROM e
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS w
                FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            ),
            scc AS (
                SELECT verts.v AS node_id,
                       LEAST(verts.v, COALESCE(MIN(w), verts.v)) AS scc
                FROM verts LEFT JOIN mutual ON mutual.v = verts.v
                GROUP BY verts.v
            ),
            cond AS (
                SELECT DISTINCT s1.scc AS src, s2.scc AS dst
                FROM e
                JOIN scc s1 ON s1.node_id = e.src
                JOIN scc s2 ON s2.node_id = e.dst
                WHERE s1.scc <> s2.scc
            ),
            paths(v, layer) AS (
                SELECT DISTINCT scc, 0 FROM scc
                UNION
                SELECT cond.dst, p.layer + 1
                FROM paths p JOIN cond ON cond.src = p.v
            )
            SELECT CAST(v AS BIGINT) AS scc, CAST(MAX(layer) AS BIGINT) AS layer
            FROM paths GROUP BY v
        """,
        "link_walks": _walks_sql(),
        "link_n2v_walks": _n2v_walks_sql(),
        "link_featprop": _featprop_sql(),
        "link_wl_roles": _wl_sql(),
        "link_densest": _densest_sql(),
        "link_host_graph": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES})
            SELECT c.c_nationkey::BIGINT AS src,
                   s.s_nationkey::BIGINT AS dst,
                   COUNT(*) AS n_edges,
                   ROUND(CAST(SUM(1.0) AS DOUBLE), 6) AS weight
            FROM e
            JOIN customer c ON c.c_custkey = e.src
            JOIN supplier s ON s.s_suppkey + {SUPP_OFFSET} = e.dst
            GROUP BY 1, 2
        """,
        "link_snapshot_diff": f"""
            WITH old AS (SELECT DISTINCT src, dst FROM ({SQL_BIPARTITE_EDGES}) t),
            nw AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM old WHERE (src + dst) % 13 <> 0
                    UNION ALL
                    SELECT dst AS src, src AS dst FROM old WHERE src % 101 = 5
                )
            )
            SELECT n.src, n.dst, 'added' AS change
            FROM nw n ANTI JOIN old o ON n.src = o.src AND n.dst = o.dst
            UNION ALL
            SELECT o.src, o.dst, 'removed' AS change
            FROM old o ANTI JOIN nw n ON o.src = n.src AND o.dst = n.dst
        """,
        "triangles_doulion": f"""
            WITH und AS (
                SELECT DISTINCT LEAST(a.n_nationkey, b.n_nationkey) AS a,
                       GREATEST(a.n_nationkey, b.n_nationkey) AS b
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            sampled AS MATERIALIZED (
                SELECT a, b FROM und
                WHERE CAST(concat('0x', substr(md5(concat(
                          CAST(a AS VARCHAR), '|', CAST(b AS VARCHAR))), 1, 14))
                          AS BIGINT) % 1000000 < {round(DOULION_P * 1000000)}
            ),
            deg AS (
                SELECT v, COUNT(*) AS d FROM (
                    SELECT a AS v FROM sampled UNION ALL SELECT b AS v FROM sampled
                ) GROUP BY v
            ),
            o AS MATERIALIZED (
                SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND s.a < s.b)
                            THEN s.a ELSE s.b END AS src,
                       CASE WHEN da.d < db.d OR (da.d = db.d AND s.a < s.b)
                            THEN s.b ELSE s.a END AS dst
                FROM sampled s
                JOIN deg da ON da.v = s.a
                JOIN deg db ON db.v = s.b
            ),
            tri AS (
                SELECT COUNT(*) AS tri_sampled FROM (
                    SELECT e1.dst AS y, e2.dst AS z
                    FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst
                ) w
                WHERE EXISTS (
                    SELECT 1 FROM o
                    WHERE LEAST(o.src, o.dst) = w.y
                      AND GREATEST(o.src, o.dst) = w.z
                )
            )
            SELECT CAST({DOULION_P} AS DOUBLE) AS p,
                   (SELECT COUNT(*) FROM und) AS n_edges,
                   (SELECT COUNT(*) FROM sampled) AS n_sampled,
                   tri_sampled,
                   ROUND(tri_sampled / {DOULION_P ** 3}, 4) AS estimate
            FROM tri
        """,
        "link_powerlaw": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            und AS (
                SELECT src, dst FROM (
                    SELECT src, dst FROM e
                    UNION SELECT dst AS src, src AS dst FROM e
                ) WHERE src <> dst
            ),
            deg AS (SELECT src, COUNT(*) AS d FROM und GROUP BY src),
            tail AS (SELECT d FROM deg WHERE d >= 2)
            SELECT CAST(2 AS INT) AS d_min,
                   COUNT(*) AS n_tail,
                   ROUND(1.0 + COUNT(*) / SUM(ln(d / 1.5)), 6) AS alpha,
                   ROUND((COUNT(*) / SUM(ln(d / 1.5))) / sqrt(COUNT(*)), 6)
                       AS sigma
            FROM tail
        """,
        "lpa_nations": _lpa2_sql(),
        "triangles_nations": """
            SELECT COUNT(*) AS n_triangles
            FROM nation a
            JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
            JOIN nation c ON b.n_regionkey = c.n_regionkey AND b.n_nationkey < c.n_nationkey
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_quantity > 0
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "normalize_qty": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_quantity / (SELECT AVG(l_quantity) FROM lineitem), 6) AS qty_norm
            FROM lineitem
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_nationkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "dedup_pairs": "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
        "clamped_discount": """
            SELECT l_returnflag,
                   ROUND(SUM(GREATEST(l_discount, 0.000001)), 6) AS sum_clamped_disc
            FROM lineitem GROUP BY l_returnflag
        """,
        "order_ranks": """
            SELECT o_orderkey, o_custkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ) AS rn
            FROM orders
        """,
        "event_funnel": """
            WITH s1 AS (
                SELECT user_id AS u, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id AS u, MIN(e.ts) AS t
                FROM events e JOIN s1 ON s1.u = e.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id AS u, MIN(e.ts) AS t
                FROM events e JOIN s2 ON s2.u = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t
                GROUP BY e.user_id
            ),
            n AS (
                SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS users FROM s1
                UNION ALL
                SELECT 2, 'click', COUNT(*) FROM s2
                UNION ALL
                SELECT 3, 'purchase', COUNT(*) FROM s3
            )
            SELECT step, event_type, users,
                   ROUND(CASE WHEN (SELECT users FROM n WHERE step = 1) > 0
                         THEN CAST(users AS DOUBLE)
                              / (SELECT users FROM n WHERE step = 1)
                         ELSE 0.0 END, 6) AS conversion
            FROM n
        """,
        "sessionize_events": """
            SELECT event_id, user_id,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_idx
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ) > 1800 THEN 1 ELSE 0 END AS new_sess
                FROM events
            )
        """,
        "event_cohort_retention": """
            WITH f AS (
                SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
                FROM events GROUP BY user_id
            )
            SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS INTEGER)
                       AS day_offset,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
            FROM events e JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "event_value_quantiles": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(quantile_cont(value, 0.5), 6) AS p50,
                   ROUND(quantile_cont(value, 0.95), 6) AS p95,
                   ROUND(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type
        """,
        "event_props_k": """
            WITH x AS (
                SELECT event_type,
                       CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS DOUBLE) AS k
                FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(AVG(k), 6) AS avg_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM x GROUP BY event_type
        """,
        "hourly_events": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "doc_tokens": f"""
            SELECT doc_id,
                   CAST({_DOC_TOKS} AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])')) AS BIGINT) AS n_sub_tokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   ROUND(CASE WHEN length(text) = 0 THEN 0.0
                         ELSE CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                              / length(text) END, 6) AS punct_ratio,
                   ROUND(
                       LEAST(CAST({_DOC_TOKS} AS DOUBLE) / 100.0, 1.0)
                       * (1.0 - LEAST(
                             (CASE WHEN length(text) = 0 THEN 0.0
                              ELSE CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                   / length(text) END) * 5.0, 1.0))
                       * (0.5 + 0.5 * LEAST(
                             (CASE WHEN {_DOC_TOKS} = 0 THEN 0.0
                              ELSE CAST({_DOC_STOP_HITS} AS DOUBLE) / {_DOC_TOKS} END) * 5.0,
                             1.0)),
                   6) AS quality
            FROM documents
        """,
        "doc_langid": f"""
            WITH h AS (SELECT doc_id, {lang_hits} FROM documents)
            SELECT doc_id,
                   CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                        WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es) THEN 'en'
                        WHEN h_de = GREATEST(h_en, h_de, h_fr, h_es) THEN 'de'
                        WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM h
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(regexp_split_to_array(lower(trim(text)), '\\s+'), ' ')) AS fp
            FROM documents
        """,
        "doc_source_stats": f"""
            WITH pd AS (
                SELECT source, md5(text) AS digest, {_DOC_TOKS} AS ntok,
                       ROUND(
                           LEAST(CAST({_DOC_TOKS} AS DOUBLE) / 100.0, 1.0)
                           * (1.0 - LEAST(
                                 (CASE WHEN length(text) = 0 THEN 0.0
                                  ELSE CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                       / length(text) END) * 5.0, 1.0))
                           * (0.5 + 0.5 * LEAST(
                                 (CASE WHEN {_DOC_TOKS} = 0 THEN 0.0
                                  ELSE CAST({_DOC_STOP_HITS} AS DOUBLE) / {_DOC_TOKS} END) * 5.0,
                                 1.0)),
                       6) AS q
                FROM documents
            ),
            pc AS (
                SELECT source, digest, CAST(COUNT(*) AS BIGINT) AS c,
                       SUM(ntok) AS toksum, SUM(q) AS qsum
                FROM pd GROUP BY source, digest
            )
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
                   ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                         / SUM(c), 6) AS dup_frac,
                   ROUND(CAST(SUM(toksum) AS DOUBLE) / SUM(c), 6) AS avg_tokens,
                   ROUND(SUM(qsum) / SUM(c), 6) AS avg_quality
            FROM pc GROUP BY source
        """,
        # funnel: verdict = FIRST failing keep-rule (CASE chain, same order
        # as funnel.default_rules); drop accounting over the verdict counts.
        # Thresholds compare UNROUNDED doubles, identical IEEE ops both sides.
        "doc_filter_funnel": f"""
            WITH m AS (
                SELECT doc_id,
                       {_DOC_TOKS} AS ntok,
                       CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) <= 0
                            THEN 0.0
                            ELSE 1.0 - CAST(len(list_distinct(
                                     regexp_split_to_array(lower(trim(text)), '\\s+')
                                 )) AS DOUBLE)
                                 / len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       END AS dupfrac,
                       CASE WHEN {_DOC_TOKS} = 0 THEN 0.0
                            ELSE CAST({_DOC_STOP_HITS} AS DOUBLE) / {_DOC_TOKS}
                       END AS stopr
                FROM documents
            ),
            v AS (
                SELECT CASE
                    WHEN NOT (ntok >= 20) THEN 'min_tokens'
                    WHEN NOT (dupfrac <= 0.65) THEN 'max_repetition'
                    WHEN NOT (stopr >= 0.01) THEN 'min_stopwords'
                    ELSE 'kept' END AS verdict
                FROM m
            ),
            c AS (SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY verdict),
            r(rule_order, rule) AS (
                VALUES (0, 'min_tokens'), (1, 'max_repetition'), (2, 'min_stopwords')
            ),
            pr AS (
                SELECT r.rule_order, r.rule,
                       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_dropped
                FROM r LEFT JOIN c ON c.verdict = r.rule
            ),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
            acc AS (
                SELECT rule_order, rule, n_dropped,
                       CAST((SELECT total FROM t)
                            - COALESCE(SUM(n_dropped) OVER (
                                  ORDER BY rule_order
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                              ), 0) AS BIGINT) AS n_in
                FROM pr
            )
            SELECT rule_order, rule, n_in, n_dropped,
                   CASE WHEN n_in = 0 THEN 0.0
                        ELSE ROUND(CAST(n_dropped AS DOUBLE) / n_in, 6)
                   END AS drop_frac
            FROM acc
        """,
        "doc_repetition": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), idx AS (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2
            ), bi AS (
                SELECT doc_id, t[i] || ' ' || t[i + 1] AS g FROM idx
            ), cnt AS (
                SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g
            ), top AS (
                SELECT doc_id, g, c,
                       SUM(c) OVER (PARTITION BY doc_id) AS total,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY c DESC, g ASC
                       ) AS rn
                FROM cnt
            ), dup AS (
                SELECT doc_id,
                       CASE WHEN len(t) <= 0 THEN 0.0
                            ELSE ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                                             / len(t), 6) END AS dup_tok_frac
                FROM toks
            )
            SELECT d.doc_id, d.dup_tok_frac,
                   top.g AS top_ngram,
                   CAST(top.c AS BIGINT) AS top_ngram_cnt,
                   CAST(top.total AS BIGINT) AS n_ngrams,
                   ROUND(CAST(top.c AS DOUBLE) / top.total, 6) AS top_ngram_frac
            FROM dup d JOIN top ON d.doc_id = top.doc_id AND top.rn = 1
        """,
        "doc_pii": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' ' ||
                       repeat('user' || CAST(doc_id AS VARCHAR) || '@ex'
                              || CAST(doc_id % 7 AS VARCHAR) || '.com ',
                              CAST(doc_id % 3 + 1 AS INT)) ||
                       '10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS t
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                       AS n_emails,
                   CAST(len(regexp_extract_all(t,
                        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
                       AS n_ipv4,
                   md5(regexp_replace(regexp_replace(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'))
                       AS redacted_fp
            FROM aug
        """,
        "media_image_dhash": """
            WITH dims AS (
                SELECT doc_id,
                       CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS w,
                       CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS h,
                       doc_id % 7 + 1 AS kr,
                       doc_id % 11 + 2 AS kg
                FROM documents
            ),
            grid AS (
                SELECT d.doc_id, i.i AS gi, j.j AS gj,
                       ((((j.j * d.w) // 9) * d.kr) % 256)
                     + ((((i.i * d.h) // 8) * d.kg) % 256)
                     + ((d.doc_id + ((i.i * d.h) // 8) * d.w
                         + ((j.j * d.w) // 9)) % 256) AS s
                FROM dims d
                CROSS JOIN (SELECT unnest(range(8)) AS i) i
                CROSS JOIN (SELECT unnest(range(9)) AS j) j
            ),
            bits AS (
                SELECT a.doc_id, a.gi * 8 + a.gj AS idx,
                       CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.gi = b.gi
                           AND b.gj = a.gj + 1
                WHERE a.gj < 8
            ),
            packed AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN idx < 32
                                THEN bit * (CAST(1 AS BIGINT) << (31 - idx))
                                ELSE 0 END) AS BIGINT) AS uhi,
                       CAST(SUM(CASE WHEN idx >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (63 - idx))
                                ELSE 0 END) AS BIGINT) AS ulo
                FROM bits GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(CASE WHEN uhi >= 2147483648
                        THEN uhi - 4294967296 ELSE uhi END AS BIGINT) AS sig_hi,
                   CAST(CASE WHEN ulo >= 2147483648
                        THEN ulo - 4294967296 ELSE ulo END AS BIGINT) AS sig_lo
            FROM packed
        """,
        "media_video_stats": """
            SELECT doc_id,
                   (doc_id % 97 + 1) / 4.0 AS duration_s,
                   CAST(1 AS INT) AS n_tracks,
                   CAST(320 + (doc_id % 5) * 160 AS INT) AS width,
                   CAST(240 + (doc_id % 3) * 120 AS INT) AS height,
                   CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                        ELSE 'av01' END AS codec
            FROM documents
        """,
        "media_video_frames": """
            SELECT d.doc_id,
                   CAST(t.f AS INT) AS frame_idx,
                   CAST(16 AS INT) AS height,
                   CAST(16 AS INT) AS width,
                   CAST(2 * ((d.doc_id * 31 + t.f * 17) % 120) + 8 AS DOUBLE)
                       AS mean_px
            FROM documents d
            JOIN (SELECT unnest(generate_series(0, 6)) AS f) t
              ON t.f < 3 + d.doc_id % 4
        """,
        "media_image_stats": """
            WITH dims AS (
                SELECT doc_id,
                       CAST(8 + (doc_id % 5) * 4 AS INT) AS w,
                       CAST(8 + (doc_id % 3) * 4 AS INT) AS h,
                       doc_id % 7 + 1 AS kr,
                       doc_id % 11 + 2 AS kg
                FROM documents
            ), mr AS (
                SELECT doc_id, ROUND(AVG((x * kr) % 256), 6) AS mean_r
                FROM (SELECT doc_id, kr,
                             unnest(generate_series(0, w - 1)) AS x FROM dims)
                GROUP BY doc_id
            ), mg AS (
                SELECT doc_id, ROUND(AVG((y * kg) % 256), 6) AS mean_g
                FROM (SELECT doc_id, kg,
                             unnest(generate_series(0, h - 1)) AS y FROM dims)
                GROUP BY doc_id
            ), mb AS (
                SELECT doc_id, ROUND(AVG((doc_id + t) % 256), 6) AS mean_b
                FROM (SELECT doc_id,
                             unnest(generate_series(0, w * h - 1)) AS t FROM dims)
                GROUP BY doc_id
            )
            SELECT d.doc_id, d.w AS width, d.h AS height,
                   CAST(d.w * d.h AS BIGINT) AS n_px,
                   mr.mean_r, mg.mean_g, mb.mean_b
            FROM dims d
            JOIN mr USING (doc_id) JOIN mg USING (doc_id) JOIN mb USING (doc_id)
        """,
        "media_audio_stats": """
            WITH samp AS (
                SELECT doc_id, t,
                       ((doc_id * 7 + t * 13) % 4096) - 2048 AS pcm
                FROM (SELECT doc_id,
                             unnest(generate_series(0, 3999)) AS t
                      FROM documents)
            ), lagd AS (
                SELECT doc_id, pcm,
                       LAG(pcm) OVER (PARTITION BY doc_id ORDER BY t) AS prev
                FROM samp
            )
            SELECT doc_id,
                   ROUND(sqrt(AVG((pcm / 32768.0) * (pcm / 32768.0))), 6) AS rms,
                   ROUND(AVG(CASE WHEN (pcm < 0) <> (prev < 0)
                                  THEN 1.0 ELSE 0.0 END)
                         FILTER (WHERE prev IS NOT NULL), 6) AS zcr,
                   COUNT(*) / 16000.0 AS duration_s
            FROM lagd GROUP BY doc_id
        """,
        "doc_dup_spans": f"""
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            wins AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       md5(array_to_string(t[i:i+{SPAN_K - 1}], ' ')) AS fp
                FROM toks, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS u(i)
                WHERE len(t) >= {SPAN_K}
            ),
            dups AS (
                SELECT fp, COUNT(DISTINCT doc_id) AS n_docs
                FROM wins GROUP BY fp
                HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {JACCARD_MAX_DF}
            ),
            hits AS (
                SELECT w.doc_id, w.pos, d.n_docs
                FROM wins w JOIN dups d USING (fp)
            ),
            g AS (
                SELECT doc_id, pos, n_docs,
                       CASE WHEN pos - LAG(pos) OVER
                                 (PARTITION BY doc_id ORDER BY pos) <= {SPAN_K}
                            THEN 0 ELSE 1 END AS brk
                FROM hits
            ),
            r AS (
                SELECT doc_id, pos, n_docs,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS run
                FROM g
            )
            SELECT doc_id,
                   MIN(pos) AS start_tok,
                   MAX(pos) + {SPAN_K - 1} AS end_tok,
                   COUNT(*) AS n_windows,
                   MAX(n_docs) AS max_docs
            FROM r GROUP BY doc_id, run
        """,
        "doc_winnow": f"""
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            wins AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       md5(array_to_string(t[i:i+{SPAN_K - 1}], ' ')) AS fp
                FROM toks, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS u(i)
                WHERE len(t) >= {SPAN_K}
            ),
            sel AS (
                SELECT doc_id,
                       MIN(struct_pack(fp := fp, np := -pos)) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
                       ) AS m
                FROM wins
            )
            SELECT DISTINCT doc_id, -(m.np) AS pos, m.fp AS fp FROM sel
        """,
        "doc_scrub_spans": f"""
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            wins AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       md5(array_to_string(t[i:i+{SPAN_K - 1}], ' ')) AS fp
                FROM toks, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS u(i)
                WHERE len(t) >= {SPAN_K}
            ),
            dups AS (
                SELECT fp FROM wins GROUP BY fp
                HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {JACCARD_MAX_DF}
            ),
            hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dups USING (fp)),
            g AS (
                SELECT doc_id, pos,
                       CASE WHEN pos - LAG(pos) OVER
                                 (PARTITION BY doc_id ORDER BY pos) <= {SPAN_K}
                            THEN 0 ELSE 1 END AS brk
                FROM hits
            ),
            r AS (
                SELECT doc_id, pos,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS run
                FROM g
            ),
            spans AS (
                SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SPAN_K - 1} AS e
                FROM r GROUP BY doc_id, run
            ),
            tokidx AS (
                SELECT doc_id, unnest(t) AS tok,
                       generate_subscripts(t, 1) AS i, len(t) AS n
                FROM toks
            ),
            kept AS (
                SELECT ti.doc_id, ti.tok, ti.i, ti.n
                FROM tokidx ti
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans sp
                    WHERE sp.doc_id = ti.doc_id AND ti.i BETWEEN sp.s AND sp.e
                )
            )
            SELECT t.doc_id,
                   CAST(len(t.t) AS INT) AS n_tokens_before,
                   CAST(COALESCE(kc.n_after, 0) AS INT) AS n_tokens_after,
                   md5(COALESCE(kc.txt, '')) AS scrubbed_digest
            FROM toks t
            LEFT JOIN (
                SELECT doc_id, COUNT(*) AS n_after,
                       string_agg(tok, ' ' ORDER BY i) AS txt
                FROM kept GROUP BY doc_id
            ) kc USING (doc_id)
        """,
        "doc_exact_dups": """
            SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
        """,
        "doc_jaccard_pairs": f"""
            WITH {_SHINGLES_CTE},
            keep AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) <= {JACCARD_MAX_DF}
            ),
            shf AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, COUNT(*) AS sz FROM shf GROUP BY id),
            common AS (
                SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
                FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT id_a, id_b,
                   ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON common.id_a = sa.id
            JOIN sizes sb ON common.id_b = sb.id
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5
        """,
        "doc_prefix_jaccard": f"""
            WITH {_SHINGLES_CTE},
            sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
            common AS (
                SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT id_a, id_b,
                   ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON common.id_a = sa.id
            JOIN sizes sb ON common.id_b = sb.id
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5
        """,
        "doc_containment_pairs": f"""
            WITH {_SHINGLES_CTE},
            keep AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) <= {JACCARD_MAX_DF}
            ),
            shf AS (SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)),
            sizes AS (SELECT id, COUNT(*) AS sz FROM shf GROUP BY id),
            common AS (
                SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
                FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT id_a, id_b,
                   ROUND(GREATEST(CAST(c AS DOUBLE) / sa.sz,
                                  CAST(c AS DOUBLE) / sb.sz), 6) AS containment,
                   ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON common.id_a = sa.id
            JOIN sizes sb ON common.id_b = sb.id
            WHERE GREATEST(CAST(c AS DOUBLE) / sa.sz, CAST(c AS DOUBLE) / sb.sz) >= 0.8
        """,
        "doc_minhash": f"""
            WITH {_SHINGLES_CTE}
            SELECT id,
                   MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                   MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                   MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                   MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
            FROM sh GROUP BY id
        """,
        "doc_lsh_candidates": f"""
            WITH {_SHINGLES_CTE},
            sig AS (
                SELECT id,
                       MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                       MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                       MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                       MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
                FROM sh GROUP BY id
            ),
            buckets AS (
                SELECT id, 0 AS band,
                       md5(concat(CAST(mh_0 AS VARCHAR), '|', CAST(mh_1 AS VARCHAR))) AS bucket
                FROM sig
                UNION ALL
                SELECT id, 1 AS band,
                       md5(concat(CAST(mh_2 AS VARCHAR), '|', CAST(mh_3 AS VARCHAR))) AS bucket
                FROM sig
            )
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM buckets a
            JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
        """,
        "doc_incremental_dups": f"""
            WITH {_SHINGLES_CTE},
            sig AS (
                SELECT id,
                       MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                       MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                       MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                       MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
                FROM sh GROUP BY id
            ),
            buckets AS (
                SELECT id, 0 AS band,
                       md5(concat(CAST(mh_0 AS VARCHAR), '|', CAST(mh_1 AS VARCHAR))) AS bucket
                FROM sig
                UNION ALL
                SELECT id, 1 AS band,
                       md5(concat(CAST(mh_2 AS VARCHAR), '|', CAST(mh_3 AS VARCHAR))) AS bucket
                FROM sig
            )
            SELECT DISTINCT a.id, b.id AS corpus_id
            FROM buckets a
            JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.id % {INCR_NEW_MOD} = {INCR_NEW_REM}
              AND b.id % {INCR_NEW_MOD} <> {INCR_NEW_REM}
        """,
        "embed_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            v AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
            scored AS (
                SELECT query_id, neighbor_id,
                       list_dot_product(CAST(qv AS DOUBLE[]), CAST(nv AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))
                          * sqrt(list_dot_product(CAST(nv AS DOUBLE[]), CAST(nv AS DOUBLE[])))) AS s
                FROM v CROSS JOIN q WHERE neighbor_id <> query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, ROUND(ROUND(s, 6), 4) AS score,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY ROUND(s, 6) DESC, neighbor_id ASC
                       ) AS rk
                FROM scored
            )
            SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
            FROM ranked WHERE rk <= 5
        """,
        "doc_dup_clusters": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            sig AS (
                SELECT id,
                       MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                       MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                       MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                       MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
                FROM sh GROUP BY id
            ),
            buckets AS (
                SELECT id, 0 AS band,
                       md5(concat(CAST(mh_0 AS VARCHAR), '|', CAST(mh_1 AS VARCHAR))) AS bucket
                FROM sig
                UNION ALL
                SELECT id, 1 AS band,
                       md5(concat(CAST(mh_2 AS VARCHAR), '|', CAST(mh_3 AS VARCHAR))) AS bucket
                FROM sig
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM buckets a
                JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
            ),
            sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
            common AS (
                SELECT cd.id_a, cd.id_b, COUNT(*) AS c
                FROM cand cd
                JOIN sh sa ON sa.id = cd.id_a
                JOIN sh sb ON sb.id = cd.id_b AND sb.shingle = sa.shingle
                GROUP BY cd.id_a, cd.id_b
            ),
            verified AS (
                SELECT common.id_a, common.id_b
                FROM common
                JOIN sizes za ON common.id_a = za.id
                JOIN sizes zb ON common.id_b = zb.id
                WHERE CAST(c AS DOUBLE) / (za.sz + zb.sz - c) >= 0.5
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM verified
                UNION
                SELECT id_b AS a, id_a AS b FROM verified
            ),
            reach AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT a AS id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a
        """,
        "doc_keep_best": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            sig AS (
                SELECT id,
                       MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                       MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                       MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                       MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
                FROM sh GROUP BY id
            ),
            buckets AS (
                SELECT id, 0 AS band,
                       md5(concat(CAST(mh_0 AS VARCHAR), '|', CAST(mh_1 AS VARCHAR))) AS bucket
                FROM sig
                UNION ALL
                SELECT id, 1 AS band,
                       md5(concat(CAST(mh_2 AS VARCHAR), '|', CAST(mh_3 AS VARCHAR))) AS bucket
                FROM sig
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM buckets a
                JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
            ),
            sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
            common AS (
                SELECT cd.id_a, cd.id_b, COUNT(*) AS c
                FROM cand cd
                JOIN sh sa ON sa.id = cd.id_a
                JOIN sh sb ON sb.id = cd.id_b AND sb.shingle = sa.shingle
                GROUP BY cd.id_a, cd.id_b
            ),
            verified AS (
                SELECT common.id_a, common.id_b
                FROM common
                JOIN sizes za ON common.id_a = za.id
                JOIN sizes zb ON common.id_b = zb.id
                WHERE CAST(c AS DOUBLE) / (za.sz + zb.sz - c) >= 0.5
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM verified
                UNION
                SELECT id_b AS a, id_a AS b FROM verified
            ),
            reach AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ),
            clus AS (
                SELECT a AS id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a
            ),
            best AS (
                SELECT doc_id FROM (
                    SELECT d.doc_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY c.cluster
                               ORDER BY d.n_chars DESC, d.doc_id ASC
                           ) AS rk
                    FROM documents d JOIN clus c ON c.id = d.doc_id
                ) WHERE rk = 1
            ),
            losers AS (
                SELECT id AS doc_id FROM clus
                WHERE id NOT IN (SELECT doc_id FROM best)
            )
            SELECT d.doc_id, d.n_chars FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
        """,
        "doc_train_split": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            sig AS (
                SELECT id,
                       MIN({_PORTABLE_HASH.format(seed=0)}) AS mh_0,
                       MIN({_PORTABLE_HASH.format(seed=1)}) AS mh_1,
                       MIN({_PORTABLE_HASH.format(seed=2)}) AS mh_2,
                       MIN({_PORTABLE_HASH.format(seed=3)}) AS mh_3
                FROM sh GROUP BY id
            ),
            buckets AS (
                SELECT id, 0 AS band,
                       md5(concat(CAST(mh_0 AS VARCHAR), '|', CAST(mh_1 AS VARCHAR))) AS bucket
                FROM sig
                UNION ALL
                SELECT id, 1 AS band,
                       md5(concat(CAST(mh_2 AS VARCHAR), '|', CAST(mh_3 AS VARCHAR))) AS bucket
                FROM sig
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM buckets a
                JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
            ),
            sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
            common AS (
                SELECT cd.id_a, cd.id_b, COUNT(*) AS c
                FROM cand cd
                JOIN sh sa ON sa.id = cd.id_a
                JOIN sh sb ON sb.id = cd.id_b AND sb.shingle = sa.shingle
                GROUP BY cd.id_a, cd.id_b
            ),
            verified AS (
                SELECT common.id_a, common.id_b
                FROM common
                JOIN sizes za ON common.id_a = za.id
                JOIN sizes zb ON common.id_b = zb.id
                WHERE CAST(c AS DOUBLE) / (za.sz + zb.sz - c) >= 0.5
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM verified
                UNION
                SELECT id_b AS a, id_a AS b FROM verified
            ),
            reach AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ),
            clus AS (
                SELECT a AS id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a
            ),
            g AS (
                SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS grp
                FROM documents d LEFT JOIN clus c ON c.id = d.doc_id
            ),
            u AS (
                SELECT doc_id, grp,
                       CAST(concat('0x', substr(md5(CAST(grp AS VARCHAR)), 1, 14)) AS BIGINT)
                           % 1000000 AS b
                FROM g
            )
            SELECT doc_id, grp,
                   CASE WHEN b < 900000 THEN 'train'
                        WHEN b < 950000 THEN 'val'
                        ELSE 'test' END AS split
            FROM u
        """,
        "doc_simhash_pairs": _simhash_pairs_sql(),
        "embed_ann": _embed_ann_sql(),
        "embed_ivf": _embed_ivf_sql(),
        "embed_kmeans": _embed_kmeans_sql(),
        "embed_semdedup": _embed_semdedup_sql(SEMDEDUP_TAU),
        "embed_triplets": f"""
            WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
                FROM embeddings
            ),
            scored AS (
                SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
                       ROUND(
                           list_dot_product(a.vec, c.vec)
                           / (sqrt(list_dot_product(a.vec, a.vec))
                              * sqrt(list_dot_product(c.vec, c.vec))), 6)
                           AS score
                FROM v a JOIN v c ON c.vec_id <> a.vec_id
                WHERE a.vec_id < 10
            ),
            pos AS (
                SELECT anchor_id, cand_id AS pos_id, score AS pos_score
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY anchor_id
                          ORDER BY score DESC, cand_id ASC) AS rk
                      FROM scored)
                WHERE rk = 1
            ),
            neg AS (
                SELECT anchor_id, cand_id AS neg_id, score AS neg_score
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY anchor_id
                          ORDER BY score DESC, cand_id ASC) AS rk
                      FROM scored WHERE score < {TRIPLET_NEG_MAX})
                WHERE rk = 1
            )
            SELECT pos.anchor_id, pos_id, pos_score, neg_id, neg_score
            FROM pos JOIN neg USING (anchor_id)
        """,
        "embed_pq": _embed_pq_sql(),
        "embed_pq_topk": _embed_pq_topk_sql(),
        "mis_nations": _mis_nations_sql(),
        "embed_near_dups": _embed_near_dups_sql(),
        "link_diameter": """
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            s0 AS (SELECT MIN(n_nationkey) AS v FROM nation),
            w1(vid, dist, hops) AS (
                SELECT v, CAST(0 AS DOUBLE), 0 FROM s0
                UNION ALL
                SELECT e.dst, p.dist + e.w, p.hops + 1
                FROM w1 p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            ),
            d1 AS (SELECT vid, MIN(dist) AS d FROM w1 GROUP BY vid),
            far AS (SELECT vid, d FROM d1 ORDER BY d DESC, vid ASC LIMIT 1),
            w2(vid, dist, hops) AS (
                SELECT vid, CAST(0 AS DOUBLE), 0 FROM far
                UNION ALL
                SELECT e.dst, p.dist + e.w, p.hops + 1
                FROM w2 p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            ),
            d2 AS (SELECT vid, MIN(dist) AS d FROM w2 GROUP BY vid)
            SELECT CAST((SELECT v FROM s0) AS INTEGER) AS start,
                   ROUND((SELECT d FROM far), 6) AS ecc_start,
                   CAST((SELECT vid FROM far) AS INTEGER) AS far,
                   ROUND(GREATEST((SELECT d FROM far),
                                  (SELECT MAX(d) FROM d2)), 6) AS diameter_lb
        """,
        "sssp_nations": f"""
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            walk(source, vid, dist, hops) AS (
                SELECT s.v, s.v, CAST(0 AS DOUBLE), 0
                FROM (VALUES {", ".join(f"({s})" for s in SSSP_SOURCES)}) s(v)
                WHERE s.v IN (SELECT n_nationkey FROM nation)
                UNION ALL
                SELECT p.source, e.dst, p.dist + e.w, p.hops + 1
                FROM walk p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            )
            SELECT CAST(source AS INTEGER) AS source,
                   CAST(vid AS INTEGER) AS n_nationkey,
                   ROUND(MIN(dist), 6) AS dist
            FROM walk GROUP BY source, vid
        """,
        "ch_routes_nations": f"""
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            walk(source, vid, dist, hops) AS (
                SELECT s.v, s.v, CAST(0 AS DOUBLE), 0
                FROM (VALUES {", ".join(f"({s})" for s in SSSP_SOURCES)}) s(v)
                WHERE s.v IN (SELECT n_nationkey FROM nation)
                UNION ALL
                SELECT p.source, e.dst, p.dist + e.w, p.hops + 1
                FROM walk p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            )
            SELECT CAST(source AS INTEGER) AS src,
                   CAST(vid AS INTEGER) AS dst,
                   ROUND(MIN(dist), 6) AS cost
            FROM walk WHERE source <> vid GROUP BY source, vid
        """,
        "link_landmark_est": f"""
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            fwd(lm, vid, dist, hops) AS (
                SELECT s.v, s.v, CAST(0 AS DOUBLE), 0
                FROM (VALUES {", ".join(f"({s})" for s in LANDMARKS)}) s(v)
                WHERE s.v IN (SELECT n_nationkey FROM nation)
                UNION ALL
                SELECT p.lm, e.dst, p.dist + e.w, p.hops + 1
                FROM fwd p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            ),
            bwd(lm, vid, dist, hops) AS (
                SELECT s.v, s.v, CAST(0 AS DOUBLE), 0
                FROM (VALUES {", ".join(f"({s})" for s in LANDMARKS)}) s(v)
                WHERE s.v IN (SELECT n_nationkey FROM nation)
                UNION ALL
                SELECT p.lm, e.src, p.dist + e.w, p.hops + 1
                FROM bwd p JOIN e ON e.dst = p.vid
                WHERE p.hops < 6
            ),
            dfwd AS (SELECT lm, vid, MIN(dist) AS d FROM fwd GROUP BY lm, vid),
            dbwd AS (SELECT lm, vid, MIN(dist) AS d FROM bwd GROUP BY lm, vid)
            SELECT CAST(b.vid AS INTEGER) AS src, CAST(f.vid AS INTEGER) AS dst,
                   ROUND(MIN(b.d + f.d), 6) AS est_dist
            FROM dbwd b JOIN dfwd f ON f.lm = b.lm
            WHERE b.vid <> f.vid
            GROUP BY b.vid, f.vid
        """,
        "link_bowtie": """
            WITH RECURSIVE chain AS (
                SELECT n_nationkey AS src,
                       LEAD(n_nationkey) OVER (
                           PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
                FROM nation
            ),
            reg AS (
                SELECT n_regionkey AS r, MIN(n_nationkey) AS mn,
                       MAX(n_nationkey) AS mx
                FROM nation GROUP BY n_regionkey
            ),
            e AS (
                SELECT src, dst FROM chain WHERE dst IS NOT NULL
                UNION
                SELECT mx, mn FROM reg WHERE r = 2
                UNION
                SELECT a.mn, b.mn FROM reg a JOIN reg b ON b.r = a.r + 1 AND a.r < 3
                UNION
                SELECT a.mx, b.mn FROM reg a JOIN reg b ON a.r = 1 AND b.r = 3
            ),
            reach AS (
                SELECT src AS a, dst AS b FROM e
                UNION
                SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            ),
            sym AS (
                SELECT src AS a, dst AS b FROM e
                UNION
                SELECT dst AS a, src AS b FROM e
            ),
            ureach AS (
                SELECT a, b FROM sym
                UNION
                SELECT u.a, s.b FROM ureach u JOIN sym s ON s.a = u.b
            ),
            verts AS (
                -- explicit DISTINCT: inside WITH RECURSIVE DuckDB does not
                -- apply UNION dedup to non-self-referencing CTEs
                SELECT DISTINCT v FROM (
                    SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e
                ) vv
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS w
                FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            ),
            lbl AS (
                SELECT verts.v, LEAST(verts.v, COALESCE(MIN(w), verts.v)) AS scc
                FROM verts LEFT JOIN mutual ON mutual.v = verts.v
                GROUP BY verts.v
            ),
            core_lbl AS (
                SELECT scc FROM lbl GROUP BY scc
                ORDER BY COUNT(*) DESC, scc ASC LIMIT 1
            ),
            c AS (SELECT v FROM lbl WHERE scc = (SELECT scc FROM core_lbl)),
            ins AS (
                SELECT v FROM verts WHERE v NOT IN (SELECT v FROM c)
                AND EXISTS (SELECT 1 FROM reach JOIN c ON reach.b = c.v
                            WHERE reach.a = verts.v)
            ),
            outs AS (
                SELECT v FROM verts WHERE v NOT IN (SELECT v FROM c)
                AND EXISTS (SELECT 1 FROM reach JOIN c ON reach.a = c.v
                            WHERE reach.b = verts.v)
            ),
            done3 AS (
                SELECT v FROM c UNION SELECT v FROM ins UNION SELECT v FROM outs
            ),
            t1 AS (
                SELECT v FROM verts WHERE v NOT IN (SELECT v FROM done3)
                AND EXISTS (SELECT 1 FROM reach JOIN ins i ON reach.a = i.v
                            WHERE reach.b = verts.v)
            ),
            t2 AS (
                SELECT v FROM verts WHERE v NOT IN (SELECT v FROM done3)
                AND EXISTS (SELECT 1 FROM reach JOIN outs o ON reach.b = o.v
                            WHERE reach.a = verts.v)
            ),
            u AS (
                SELECT v FROM verts
                WHERE EXISTS (SELECT 1 FROM ureach JOIN c ON ureach.b = c.v
                              WHERE ureach.a = verts.v)
            )
            SELECT CAST(verts.v AS INTEGER) AS n_nationkey,
                   CASE WHEN verts.v IN (SELECT v FROM c) THEN 'CORE'
                        WHEN verts.v IN (SELECT v FROM ins) THEN 'IN'
                        WHEN verts.v IN (SELECT v FROM outs) THEN 'OUT'
                        WHEN verts.v IN (SELECT v FROM t1)
                             AND verts.v IN (SELECT v FROM t2) THEN 'TUBE'
                        WHEN verts.v IN (SELECT v FROM t1)
                             OR verts.v IN (SELECT v FROM t2) THEN 'TENDRIL'
                        WHEN verts.v IN (SELECT v FROM u) THEN 'OTHER'
                        ELSE 'DISC' END AS region
            FROM verts
        """,
        "link_ego_net": f"""
            WITH RECURSIVE e AS ({SQL_BIPARTITE_EDGES}),
            sym AS (
                SELECT src AS a, dst AS b FROM e
                UNION
                SELECT dst AS a, src AS b FROM e
            ),
            walk(vid, hops) AS (
                SELECT CAST({EGO_SEED} AS BIGINT), 0
                UNION ALL
                SELECT s.b, w.hops + 1
                FROM walk w JOIN sym s ON s.a = w.vid
                WHERE w.hops < {EGO_K}
            ),
            ball AS (SELECT vid, MIN(hops) AS hops FROM walk GROUP BY vid)
            SELECT e.src, e.dst,
                   CAST(bs.hops AS INTEGER) AS src_hops,
                   CAST(bd.hops AS INTEGER) AS dst_hops
            FROM e
            JOIN ball bs ON bs.vid = e.src
            JOIN ball bd ON bd.vid = e.dst
        """,
        "doc_temp_mixture": f"""
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
            w AS (
                SELECT lang, n,
                       CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576) AS BIGINT) AS w
                FROM c
            ),
            t AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM w),
            q AS (
                SELECT lang,
                       CAST(floor(
                           LEAST(1.0, {TEMP_BUDGET}.0 * w
                                      / (CAST(wsum AS DOUBLE) * CAST(n AS DOUBLE)))
                           * 1000000) AS BIGINT) AS thresh
                FROM w, t
            ),
            u AS (
                SELECT doc_id, lang,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                           % 1000000 AS b
                FROM documents
            )
            SELECT u.doc_id, u.lang
            FROM u JOIN q ON q.lang = u.lang
            WHERE u.b < q.thresh
        """,
        "doc_rake_weights": _rake_sql(RAKE_ROUNDS),
        "doc_lr_quality": _lr_quality_sql(LR_ITERS, LR_RATE),
        "link_partition_stats": f"""
            WITH e AS ({SQL_BIPARTITE_EDGES}),
            b AS (
                SELECT
                    CAST(concat('0x', substr(md5(CAST(src AS VARCHAR)), 1, 14)) AS BIGINT) % 8 AS p_src,
                    CAST(concat('0x', substr(md5(CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 8 AS p_dst,
                    src
                FROM e
            ),
            s AS (
                SELECT p_src, src, COUNT(*) AS deg,
                       SUM(CASE WHEN p_dst <> p_src THEN 1 ELSE 0 END) AS cut
                FROM b GROUP BY p_src, src
            ),
            p AS (
                SELECT p_src,
                       CAST(SUM(deg) AS BIGINT) AS n_edges,
                       COUNT(*) AS n_src,
                       CAST(MAX(deg) AS BIGINT) AS max_src_deg,
                       CAST(SUM(cut) AS BIGINT) AS cut_edges
                FROM s GROUP BY p_src
            ),
            t AS (SELECT CAST(SUM(n_edges) AS DOUBLE) AS tot FROM p)
            SELECT CAST(p_src AS INTEGER) AS "partition",
                   n_edges, n_src, max_src_deg, cut_edges,
                   ROUND(CAST(cut_edges AS DOUBLE) / n_edges, 6) AS cut_frac,
                   ROUND(CAST(n_edges AS DOUBLE) / (tot / 8.0), 6) AS skew
            FROM p, t
        """,
        "multi_metric_edges": f"""
            WITH m AS (
                SELECT o_custkey, l_suppkey,
                       CAST(COUNT(*) AS DOUBLE) AS cnt,
                       CAST(SUM(l_quantity) AS DOUBLE) AS qty
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY o_custkey, l_suppkey
            )
            SELECT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst,
                   ROUND(cnt, 6) AS m_cnt, ROUND(qty, 6) AS m_qty,
                   ROUND(qty / cnt, 6) AS avg_qty
            FROM m
        """,
        "normalize_metrics": f"""
            WITH m AS (
                SELECT o_custkey, l_suppkey,
                       CAST(COUNT(*) AS DOUBLE) AS cnt,
                       CAST(SUM(l_quantity) AS DOUBLE) AS qty
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY o_custkey, l_suppkey
            )
            SELECT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst,
                   ROUND(cnt / AVG(cnt) OVER (), 6) AS cnt_n,
                   ROUND(qty / AVG(qty) OVER (), 6) AS qty_n
            FROM m
        """,
        "truss_nations": _truss_sql(TRUSS_K, TRUSS_ROUNDS),
        "closeness_nations": """
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            walk(source, vid, dist, hops) AS (
                SELECT n_nationkey, n_nationkey, CAST(0 AS DOUBLE), 0
                FROM nation
                UNION ALL
                SELECT p.source, e.dst, p.dist + e.w, p.hops + 1
                FROM walk p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            ),
            d AS (
                SELECT source, vid, MIN(dist) AS dist
                FROM walk GROUP BY source, vid
            )
            SELECT CAST(vid AS INTEGER) AS n_nationkey,
                   COUNT(*) AS n_reach,
                   ROUND(COUNT(*) / SUM(dist), 6) AS closeness
            FROM d WHERE source <> vid GROUP BY vid
        """,
        "harmonic_nations": """
            WITH RECURSIVE e AS (
                SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
                       1.0 + ((a.n_nationkey * 7 + b.n_nationkey) % 5) AS w
                FROM nation a JOIN nation b
                  ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey <> b.n_nationkey
            ),
            walk(source, vid, dist, hops) AS (
                SELECT n_nationkey, n_nationkey, CAST(0 AS DOUBLE), 0
                FROM nation
                UNION ALL
                SELECT p.source, e.dst, p.dist + e.w, p.hops + 1
                FROM walk p JOIN e ON e.src = p.vid
                WHERE p.hops < 6
            ),
            d AS (
                SELECT source, vid, MIN(dist) AS dist
                FROM walk GROUP BY source, vid
            )
            SELECT CAST(vid AS INTEGER) AS n_nationkey,
                   ROUND(SUM(1.0 / dist), 6) AS harmonic
            FROM d WHERE source <> vid GROUP BY vid
        """,
        "doc_bloom_decon": f"""
            WITH {_SHINGLES_CTE},
            bench AS (
                SELECT DISTINCT shingle FROM sh WHERE id % {BENCH_MOD} = 0
            ),
            bprobe AS (
                SELECT ((CAST(concat('0x', substr(md5(concat('bloom:', shingle)), 1, 15))
                              AS BIGINT) % {BLOOM_M}
                         + i.i * (CAST(concat('0x', substr(md5(concat('bloom:', shingle)), 16, 15))
                                       AS BIGINT) % {BLOOM_M})) % {BLOOM_M}) AS pos
                FROM bench CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS i) i
            ),
            words AS (
                SELECT pos // 63 AS word,
                       BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
                FROM bprobe GROUP BY 1
            ),
            cprobe AS (
                SELECT id, shingle,
                       ((CAST(concat('0x', substr(md5(concat('bloom:', shingle)), 1, 15))
                              AS BIGINT) % {BLOOM_M}
                         + i.i * (CAST(concat('0x', substr(md5(concat('bloom:', shingle)), 16, 15))
                                       AS BIGINT) % {BLOOM_M})) % {BLOOM_M}) AS pos
                FROM sh CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS i) i
                WHERE id % {BENCH_MOD} <> 0
            ),
            probed AS (
                SELECT id, shingle,
                       MIN(CASE WHEN w.bits IS NOT NULL
                                 AND (w.bits & (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)))
                                     = (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
                                THEN 1 ELSE 0 END) AS hit
                FROM cprobe c LEFT JOIN words w ON w.word = c.pos // 63
                GROUP BY id, shingle
            )
            SELECT id AS doc_id, COUNT(*) AS sz,
                   CAST(SUM(hit) AS BIGINT) AS n_bloom_hits
            FROM probed GROUP BY id
        """,
        "doc_decontaminate": f"""
            WITH {_SHINGLES_CTE},
            bench AS (
                SELECT DISTINCT shingle FROM sh WHERE id % {BENCH_MOD} = 0
            ),
            corpus AS (SELECT id, shingle FROM sh WHERE id % {BENCH_MOD} <> 0)
            SELECT c.id AS doc_id, COUNT(*) AS sz,
                   COUNT(b.shingle) AS n_hits,
                   ROUND(CAST(COUNT(b.shingle) AS DOUBLE) / COUNT(*), 6)
                       AS overlap_frac
            FROM corpus c LEFT JOIN bench b ON c.shingle = b.shingle
            GROUP BY c.id HAVING COUNT(b.shingle) >= 1
        """,
        "doc_chunks": f"""
            WITH base AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ),
            spans AS (
                SELECT doc_id, toks, len(toks) AS n,
                       unnest(generate_series(
                           0,
                           GREATEST(0, CAST(CEIL((len(toks) - {CHUNK_WINDOW})
                                                 / {CHUNK_STRIDE}.0) AS BIGINT))
                       )) AS k
                FROM base
            )
            SELECT doc_id, CAST(k AS INT) AS chunk_id,
                   CAST(LEAST(n - k * {CHUNK_STRIDE}, {CHUNK_WINDOW}) AS INT)
                       AS n_tokens,
                   array_to_string(
                       toks[k * {CHUNK_STRIDE} + 1 :
                            k * {CHUNK_STRIDE} + {CHUNK_WINDOW}], ' ')
                       AS chunk_text
            FROM spans
        """,
        "doc_hybrid_topk": f"""
            WITH tok AS (
                SELECT doc_id AS id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            postings AS (SELECT id, tok, COUNT(*) AS tf FROM tok GROUP BY id, tok),
            dl AS (SELECT id, SUM(tf) AS dl FROM postings GROUP BY id),
            dfq AS (SELECT tok, COUNT(*) AS df FROM postings GROUP BY tok),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            ad AS (SELECT AVG(dl) AS avgdl FROM dl),
            qterms AS (
                SELECT id AS qid, tok, tf AS qtf FROM postings
                WHERE id < {HYBRID_N_QUERIES}
            ),
            lex_scored AS (
                SELECT qt.qid, p.id,
                       SUM(qt.qtf
                           * ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * (p.tf * (1.2 + 1.0))
                           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / ad.avgdl))
                       ) AS s
                FROM postings p
                JOIN qterms qt USING (tok)
                JOIN dfq USING (tok)
                JOIN dl ON dl.id = p.id, nd, ad
                GROUP BY qt.qid, p.id
            ),
            lex AS (
                SELECT qid, id, rk FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY qid ORDER BY ROUND(s, 6) DESC, id ASC
                    ) AS rk FROM lex_scored
                ) WHERE rk <= {HYBRID_TOPK}
            ),
            v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
                FROM embeddings
                WHERE vec_id IN (SELECT doc_id FROM documents)
            ),
            sem_scored AS (
                SELECT q.vec_id AS qid, c.vec_id AS id,
                       ROUND(
                           list_dot_product(q.vec, c.vec)
                           / (sqrt(list_dot_product(q.vec, q.vec))
                              * sqrt(list_dot_product(c.vec, c.vec))), 6)
                           AS s
                FROM v q JOIN v c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {HYBRID_N_QUERIES}
            ),
            sem AS (
                SELECT qid, id, rk FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY qid ORDER BY s DESC, id ASC
                    ) AS rk FROM sem_scored
                ) WHERE rk <= {HYBRID_TOPK}
            ),
            fused AS (
                SELECT COALESCE(lex.qid, sem.qid) AS q,
                       COALESCE(lex.id, sem.id) AS d,
                       ROUND(
                           COALESCE(1.0 / ({HYBRID_RRF_K} + lex.rk), 0)
                           + COALESCE(1.0 / ({HYBRID_RRF_K} + sem.rk), 0), 6)
                           AS rrf
                FROM lex FULL OUTER JOIN sem
                  ON lex.qid = sem.qid AND lex.id = sem.id
            )
            SELECT q AS query_id, d AS doc_id, rrf, CAST(rk AS INT) AS rk
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY q ORDER BY rrf DESC, d ASC
                ) AS rk FROM fused
            ) WHERE rk <= {HYBRID_TOPK}
        """,
        "doc_nb_lang": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            pri AS (
                SELECT lang AS label, ln(COUNT(*) / (SELECT n FROM nd))
                           AS log_prior
                FROM documents GROUP BY lang
            ),
            cnts AS (
                SELECT d.lang AS label, t.tok, COUNT(*) AS cnt
                FROM tok t JOIN documents d USING (doc_id)
                GROUP BY d.lang, t.tok
            ),
            tot AS (SELECT label, CAST(SUM(cnt) AS DOUBLE) AS tot
                    FROM cnts GROUP BY label),
            voc AS (SELECT DISTINCT tok FROM cnts),
            vn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM voc),
            dense AS MATERIALIZED (
                SELECT tot.label, voc.tok,
                       ln((COALESCE(c.cnt, 0) + 1.0)
                          / (tot.tot + 1.0 * (SELECT v FROM vn))) AS log_lik
                FROM voc CROSS JOIN tot
                LEFT JOIN cnts c ON c.label = tot.label AND c.tok = voc.tok
            ),
            tf AS (SELECT doc_id, tok, COUNT(*) AS tf
                   FROM tok GROUP BY doc_id, tok),
            contrib AS (
                SELECT tf.doc_id, d.label, SUM(tf.tf * d.log_lik) AS ll
                FROM tf JOIN dense d USING (tok)
                GROUP BY tf.doc_id, d.label
            ),
            scored AS (
                SELECT doc.doc_id, pri.label,
                       ROUND(pri.log_prior + COALESCE(c.ll, 0.0), 6) AS score
                FROM documents doc CROSS JOIN pri
                LEFT JOIN contrib c
                  ON c.doc_id = doc.doc_id AND c.label = pri.label
            )
            SELECT doc_id, label, score FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, label ASC
                ) AS rk FROM scored
            ) WHERE rk = 1
        """,
        "doc_bm25_topk": f"""
            WITH tok AS (
                SELECT doc_id AS id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            postings AS (SELECT id, tok, COUNT(*) AS tf FROM tok GROUP BY id, tok),
            dl AS (SELECT id, COUNT(*) AS dl FROM tok GROUP BY id),
            dfq AS (SELECT tok, COUNT(*) AS df FROM postings GROUP BY tok),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            ad AS (SELECT AVG(dl) AS avgdl FROM dl),
            q AS (
                SELECT qid,
                       unnest(regexp_split_to_array(lower(trim(qt)), '\\s+')) AS tok
                FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)})
                     AS t(qid, qt)
            ),
            qterms AS (SELECT qid, tok, COUNT(*) AS qtf FROM q GROUP BY qid, tok),
            scored AS (
                SELECT qt.qid, p.id,
                       SUM(qt.qtf
                           * ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * (p.tf * (1.2 + 1.0))
                           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / ad.avgdl))
                       ) AS s
                FROM postings p
                JOIN qterms qt USING (tok)
                JOIN dfq USING (tok)
                JOIN dl ON dl.id = p.id, nd, ad
                GROUP BY qt.qid, p.id
            )
            SELECT qid AS query_id, id AS doc_id,
                   ROUND(s, 6) AS score, CAST(rk AS INT) AS rk
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY qid ORDER BY ROUND(s, 6) DESC, id ASC
                ) AS rk FROM scored
            ) WHERE rk <= {BM25_TOPK}
        """,
        "doc_dsir_sample": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            ttok AS (
                SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents WHERE lang = 'en'
            ),
            tfreq AS (SELECT tok, COUNT(*) AS t_cnt FROM ttok GROUP BY tok),
            rfreq AS (SELECT tok, COUNT(*) AS r_cnt FROM tok GROUP BY tok),
            vocab AS (
                SELECT COUNT(*) AS v FROM (
                    SELECT tok FROM rfreq UNION SELECT tok FROM tfreq
                )
            ),
            ttot AS (SELECT SUM(t_cnt) AS t_total FROM tfreq),
            rtot AS (SELECT SUM(r_cnt) AS r_total FROM rfreq),
            lw AS (
                SELECT doc_id, COUNT(*) AS n_tokens,
                       ROUND(SUM(
                           ln((COALESCE(t_cnt, 0) + {DSIR_K})
                              / (t_total + {DSIR_K} * v))
                           - ln((r_cnt + {DSIR_K}) / (r_total + {DSIR_K} * v))
                       ), 6) AS log_ratio
                FROM tok
                LEFT JOIN tfreq USING (tok)
                JOIN rfreq USING (tok), vocab, ttot, rtot
                GROUP BY doc_id
            ),
            keyed AS (
                SELECT doc_id, n_tokens, log_ratio,
                       ROUND(log_ratio - ln(-ln(
                           (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                                     1, 12)) AS BIGINT) + 0.5)
                           / {float(1 << 48)}
                       )), 6) AS gumbel
                FROM lw
            )
            SELECT doc_id, n_tokens, log_ratio, gumbel
            FROM keyed
            ORDER BY gumbel DESC, md5(CAST(doc_id AS VARCHAR))
            LIMIT {DSIR_N}
        """,
        "doc_unigram_nll": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
            tot AS (SELECT SUM(cnt) AS total FROM freq)
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(-ln(CAST(cnt AS DOUBLE) / total)), 6) AS avg_nll
            FROM tok JOIN freq USING (tok), tot
            GROUP BY doc_id
        """,
        "doc_tfidf_terms": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS tok
                FROM documents
            ),
            tf AS (SELECT doc_id, tok, COUNT(*) AS tf
                   FROM tok GROUP BY doc_id, tok),
            dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            scored AS (
                SELECT doc_id, tok, tf,
                       ROUND(tf * ln((1.0 + n_docs) / (1.0 + df)), 6) AS tfidf
                FROM tf JOIN dfq USING (tok), nd
            ),
            ranked AS (
                SELECT doc_id, tok, tf, tfidf,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC
                       ) AS rnk
                FROM scored
            )
            SELECT doc_id, tok AS term, tf, tfidf, rnk
            FROM ranked WHERE rnk <= 3
        """,
        # BPE training replayed round-for-round (sentinel-string replace)
        "doc_bpe_merges": _bpe_merges_sql(BPE_MERGES),
        "doc_bpe_tokens": _bpe_tokens_sql(BPE_MERGES),
        "doc_bigram_nll": """
            WITH arr AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ),
            tok AS (
                SELECT doc_id, unnest(toks) AS t,
                       generate_subscripts(toks, 1) AS ord
                FROM arr
            ),
            bg AS (
                SELECT doc_id, term FROM (
                    SELECT doc_id,
                           t || ' ' ||
                           LEAD(t) OVER (PARTITION BY doc_id ORDER BY ord)
                               AS term
                    FROM tok
                ) WHERE term IS NOT NULL
            ),
            freq AS (SELECT term, COUNT(*) AS cnt FROM bg GROUP BY term),
            ctx AS (
                SELECT split_part(term, ' ', 1) AS w1, SUM(cnt) AS ctx_cnt
                FROM freq GROUP BY 1
            ),
            voc AS (SELECT COUNT(DISTINCT t) AS v FROM tok)
            SELECT bg.doc_id, COUNT(*) AS n_bigrams,
                   ROUND(AVG(-ln((cnt + 0.5) / (ctx_cnt + 0.5 * v))), 6)
                       AS avg_nll
            FROM bg JOIN freq USING (term)
                 JOIN ctx ON split_part(bg.term, ' ', 1) = ctx.w1, voc
            GROUP BY bg.doc_id
        """,
        "doc_distinct_tokens": """
            WITH tok AS (
                SELECT source,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS term
                FROM documents
            ),
            hashed AS (
                SELECT source,
                       CAST(concat('0x', substr(md5(concat('hll:', term)), 1, 3))
                            AS BIGINT) % 256 AS bucket,
                       CAST(concat('0x', substr(md5(concat('hll:', term)), 4, 15))
                            AS BIGINT) AS w
                FROM tok
            ),
            regs AS (
                SELECT source, bucket,
                       MAX(CASE WHEN w > 0 THEN 61 - length(bin(w))
                                ELSE 61 END) AS reg
                FROM hashed GROUP BY source, bucket
            ),
            agg AS (
                SELECT source, COUNT(*) AS nnz,
                       SUM(CAST((CAST(1 AS BIGINT) << (61 - reg)) AS HUGEINT))
                           AS s_num
                FROM regs GROUP BY source
            ),
            est AS (
                SELECT source, nnz,
                       CAST(256 - nnz AS DOUBLE) AS zeros,
                       47072.71267120224 /
                           (CAST(256 - nnz AS DOUBLE)
                            + CAST(s_num AS DOUBLE) / 2305843009213693952.0)
                           AS raw
                FROM agg
            )
            SELECT source, CAST(nnz AS BIGINT) AS nnz,
                   ROUND(CASE WHEN raw <= 640.0 AND zeros > 0
                              THEN 256.0 * ln(256.0 / zeros)
                              ELSE raw END, 6) AS approx_distinct
            FROM est
        """,
        "doc_top_terms": """
            WITH tok AS (
                SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS term
                FROM documents
            ),
            cnt AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
            ranked AS (
                SELECT term, cnt,
                       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC)
                            AS INTEGER) AS rnk
                FROM cnt
            )
            SELECT term, cnt, rnk FROM ranked WHERE rnk <= 20
        """,
        # trivially-correct full GROUP BY ... HAVING; the Spark side must
        # reproduce it through the sketch → candidate-cut → verify path
        # (CMS never underestimates, so the cut has no false negatives)
        "doc_heavy_bigrams": f"""
            WITH arr AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ),
            tok AS (
                SELECT doc_id, unnest(toks) AS t,
                       generate_subscripts(toks, 1) AS ord
                FROM arr
            ),
            bg AS (
                SELECT doc_id,
                       t || ' ' ||
                       LEAD(t) OVER (PARTITION BY doc_id ORDER BY ord) AS term
                FROM tok
            )
            SELECT term, COUNT(*) AS cnt
            FROM bg WHERE term IS NOT NULL
            GROUP BY term HAVING COUNT(*) >= {HEAVY_BIGRAM_MIN}
        """,
        # the sketch rebuilt cell-for-cell from the same portable md5
        # double-hash family the MinHash oracle uses
        "doc_cms_sketch": """
            WITH tok AS (
                SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS term
                FROM documents
            ),
            h AS (
                SELECT CAST(concat('0x', substr(md5(term), 1, 14)) AS BIGINT) AS u,
                       CAST(concat('0x', substr(md5(term), 15, 14)) AS BIGINT) AS v
                FROM tok
            ),
            cells AS (
                SELECT CAST(d.r AS INTEGER) AS r,
                       CAST((u + d.r * v) % 256 AS INTEGER) AS c
                FROM h, (VALUES (0), (1), (2)) AS d(r)
            )
            SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c
        """,
        "doc_epoch_shuffle": f"""
            WITH b AS (
                SELECT doc_id,
                       md5('{PACK_SEED}|' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ),
            s AS (
                SELECT doc_id, h,
                       CAST(CAST(concat('0x', substr(h, 1, 14)) AS BIGINT)
                            % {PACK_SHARDS} AS INT) AS shard
                FROM b
            )
            SELECT doc_id, shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY h, doc_id
                   ) - 1 AS BIGINT) AS pos
            FROM s
        """,
        "doc_pack_sequences": f"""
            WITH RECURSIVE b AS (
                SELECT doc_id,
                       md5('{PACK_SEED}|' || CAST(doc_id AS VARCHAR)) AS h,
                       CAST({_DOC_TOKS} AS BIGINT) AS n
                FROM documents
            ),
            ordered AS (
                SELECT CAST(CAST(concat('0x', substr(h, 1, 14)) AS BIGINT)
                            % {PACK_SHARDS} AS INT) AS shard,
                       doc_id, n, h
                FROM b
            ),
            pos AS (
                SELECT shard, doc_id, n,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY shard ORDER BY h, doc_id
                       ) - 1 AS BIGINT) AS pos
                FROM ordered
            ),
            packed AS (
                SELECT shard, pos, doc_id, n,
                       CAST(0 AS BIGINT) AS seq_id, n AS fill
                FROM pos WHERE pos = 0
                UNION ALL
                SELECT o.shard, o.pos, o.doc_id, o.n,
                       CASE WHEN p.fill + o.n > {PACK_CAPACITY}
                            THEN p.seq_id + 1 ELSE p.seq_id END,
                       CASE WHEN p.fill + o.n > {PACK_CAPACITY}
                            THEN o.n ELSE p.fill + o.n END
                FROM packed p
                JOIN pos o ON o.shard = p.shard AND o.pos = p.pos + 1
            )
            SELECT shard, pos, doc_id, n AS n_tokens, seq_id FROM packed
        """,
        "doc_mixture_sample": f"""
            SELECT doc_id, source
            FROM documents
            WHERE CAST(concat('0x',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                      AS BIGINT) % 1000000
                  < CASE source
                        WHEN 'src0' THEN 1000000
                        WHEN 'src1' THEN 500000
                        WHEN 'src2' THEN 250000
                        WHEN 'src3' THEN 100000
                        ELSE 0 END
        """,
        "doc_stratified_sample": """
            WITH b AS (
                SELECT doc_id, lang,
                       CAST(concat('0x',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                            AS BIGINT) % 1000000 AS bucket,
                       md5(CAST(doc_id AS VARCHAR)) AS tie
                FROM documents
            ),
            r AS (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang ORDER BY bucket, tie
                       ) AS rn
                FROM b
            )
            SELECT doc_id, lang FROM r WHERE rn <= 20
        """,
        # A-ES exponential race rebuilt in SQL: u from 48 md5 bits (exact
        # in a double), race = round(-ln(u)/w, 9) — the rounded value is
        # the cross-engine contract, md5 hex breaks ties
        "doc_weighted_sample": """
            WITH r AS (
                SELECT doc_id, lang, n_chars,
                       ROUND(-ln((CAST(concat('0x',
                                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                                 AS BIGINT) + 0.5) / 281474976710656.0)
                             / CAST(n_chars AS DOUBLE), 9) AS race,
                       md5(CAST(doc_id AS VARCHAR)) AS tie
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, lang, n_chars
            FROM r ORDER BY race, tie LIMIT 25
        """,
    }
