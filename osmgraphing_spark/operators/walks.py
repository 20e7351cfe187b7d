"""Deterministic random walks — the embedding-training precursor
(DeepWalk/node2vec-style corpus generation) as a BSP join loop.

Each walker at vertex v advances to v's `choice`-th out-neighbor, where
choice = H(walker, step) mod out_deg(v) and H is the portable md5 hash
used across the engine (dedup._portable_hash_pair's u slice). Determinism
is the point twice over: (1) walks are reproducible across runs, retries,
partitionings, and engines — the walk CORPUS itself is value-checkable
against a SQL oracle; (2) no RNG state needs distributing.

Scale design: the adjacency is indexed ONCE — (src, idx, dst, out_deg)
with idx = dense rank of dst within src — and materialized; each step is
one equi-join of the walker frame against it on (src, idx). The walker
frame is walker-count-sized (≪ |E|); the adjacency rests like the edge
table (it IS the edge table + two ints). A hub's 10⁷ out-edges cost
nothing extra: each walker matches exactly one (src, idx) row. Dead-end
walkers (out_deg 0) simply stop — their walks are shorter, matching the
reference generator's drop-pathless-pairs spirit.

The per-src `row_number` window sorts each src's neighbor list once —
the same per-partition sort the CSR layout already pays at build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from .build import Graph

def _choice_hash(walker, step: int):
    """Portable 56-bit hash of (walker, step): first 14 hex chars of
    md5("walker|step") as an integer — reproducible in DuckDB as
    CAST(concat('0x', substr(md5(...), 1, 14)) AS BIGINT). Always < 2^56,
    so it is sign-safe in any 64-bit engine."""
    key = F.concat_ws("|", walker.cast("string"), F.lit(str(step)))
    return F.conv(F.substring(F.md5(key), 1, 14), 16, 10).cast("long")


def indexed_adjacency(edges: DataFrame) -> DataFrame:
    """→ (src, idx, dst, out_deg): dst-sorted dense neighbor index per
    src. idx ∈ [0, out_deg)."""
    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return e.select(
        "src",
        (F.row_number().over(w) - 1).alias("idx"),
        "dst",
        F.count("*").over(Window.partitionBy("src")).alias("out_deg"),
    )


def random_walks(
    edges: DataFrame,
    length: int = 4,
    walks_per_vertex: int = 1,
) -> DataFrame:
    """→ (walker long, step int, node long): `walks_per_vertex` walks of up
    to `length` steps from EVERY vertex appearing in `edges`; step 0 is the
    start vertex, walker = start_vid * walks_per_vertex + j. A walk ends
    early at a vertex with no out-edges (no row emitted for later steps).
    """
    if length < 0 or walks_per_vertex < 1:
        raise ValueError("length must be >= 0 and walks_per_vertex >= 1")
    spark = edges.sparkSession
    trunc = EphemeralTruncator(spark, "walks")

    adj = trunc.truncate(indexed_adjacency(edges), reap=False)
    verts = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = verts.select(
        F.explode(
            F.array(*[
                (F.col("node") * walks_per_vertex + F.lit(j)).cast("long")
                for j in range(walks_per_vertex)
            ])
        ).alias("walker"),
        F.col("node"),
    )
    out = [state.select("walker", F.lit(0).cast("int").alias("step"), "node")]
    for s in range(1, length + 1):
        choice = _choice_hash(F.col("walker"), s) % F.col("out_deg")
        state = trunc.truncate(
            state.join(adj, state["node"] == adj["src"])
            .where(choice == F.col("idx"))
            .select("walker", F.col("dst").alias("node")),
            reap=False,
        )
        out.append(state.select("walker", F.lit(s).cast("int").alias("step"), "node"))
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def walks_from_graph(graph: Graph, length: int = 4, walks_per_vertex: int = 1) -> DataFrame:
    """Walks over a built Graph's directed edge table (vid space)."""
    return random_walks(graph.edges.select("src", "dst"), length, walks_per_vertex)


def node2vec_walks(
    edges: DataFrame,
    length: int = 4,
    ret_w: int = 1,
    d1_w: int = 2,
    d2_w: int = 4,
    walks_per_vertex: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks → (walker, step, node).

    From vertex v having arrived from t, the unnormalized weight of
    candidate x is the Grover-Leskovec bias: ``ret_w`` if x == t (the
    return edge), ``d1_w`` if (t, x) is an edge (distance 1 from t),
    ``d2_w`` otherwise (distance 2). INTEGER weights keep the choice
    exact: p = d1_w/ret_w and q = d1_w/d2_w recover the paper's (p, q).
    The draw is r = H(walker, step) mod Σw against the dst-ordered
    cumulative weights — deterministic across runs, partitionings and
    engines, like `random_walks`.

    Scale contract (100 TB): the second-order step is inherently
    deg(v)-wide (every candidate needs the is-neighbor-of-t probe and the
    cumulative sum), so per-step cost is Σ_walkers deg(v) — fine on
    bounded-degree graphs, a hazard at hubs. ``max_degree`` is the hub
    valve: walkers sitting at a vertex with out_deg > max_degree are
    SPLIT OFF before the candidate expansion and take the first-order
    uniform step (the single-match (src, idx-choice) join of
    `random_walks` — no neighbor probe, no window) — so the biased scan,
    the (t, x) probe join and the per-walker cumsum only ever see
    bounded-degree rows. Step 1 has no predecessor and is first-order
    for every walker."""
    if length < 0 or walks_per_vertex < 1:
        raise ValueError("length must be >= 0 and walks_per_vertex >= 1")
    if min(ret_w, d1_w, d2_w) < 1:
        raise ValueError("bias weights must be positive integers")
    spark = edges.sparkSession
    trunc = EphemeralTruncator(spark, "n2v")

    adj = trunc.truncate(indexed_adjacency(edges), reap=False)
    eset = adj.select(F.col("src").alias("t"), F.col("dst").alias("x"))
    deg = adj.select("src", "out_deg").distinct()
    verts = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = verts.select(
        F.explode(
            F.array(*[
                (F.col("node") * walks_per_vertex + F.lit(j)).cast("long")
                for j in range(walks_per_vertex)
            ])
        ).alias("walker"),
        F.lit(None).cast("long").alias("prev"),
        F.col("node"),
    )

    def _uniform_step(st: DataFrame, s: int) -> DataFrame:
        choice = _choice_hash(F.col("walker"), s) % F.col("out_deg")
        return (
            st.join(adj, st["node"] == adj["src"])
            .where(choice == F.col("idx"))
            .select(
                "walker", F.col("node").alias("prev"), F.col("dst").alias("node")
            )
        )

    out = [state.select("walker", F.lit(0).cast("int").alias("step"), "node")]
    for s in range(1, length + 1):
        if s == 1:
            nxt = _uniform_step(state, s)
        else:
            if max_degree is not None:
                st = state.join(deg, state["node"] == deg["src"]).select(
                    "walker", "prev", "node",
                    (F.col("out_deg") > max_degree).alias("_hub"),
                )
                hub = st.where("_hub").drop("_hub")
                st2 = st.where(~F.col("_hub")).drop("_hub")
            else:
                hub, st2 = None, state
            cands = (
                st2.join(adj, st2["node"] == adj["src"])
                .join(
                    eset,
                    (F.col("prev") == F.col("t")) & (F.col("dst") == F.col("x")),
                    "left",
                )
                .select(
                    "walker",
                    F.col("node").alias("cur"),
                    F.col("dst").alias("nxt"),
                    "idx",
                    F.when(F.col("dst") == F.col("prev"), F.lit(ret_w))
                    .when(F.col("x").isNotNull(), F.lit(d1_w))
                    .otherwise(F.lit(d2_w))
                    .cast("long")
                    .alias("w"),
                )
            )
            wk = Window.partitionBy("walker")
            cum = (
                cands.withColumn("cum", F.sum("w").over(wk.orderBy("idx")))
                .withColumn("tot", F.sum("w").over(wk))
            )
            r = _choice_hash(F.col("walker"), s) % F.col("tot")
            nxt = cum.where(
                (r >= F.col("cum") - F.col("w")) & (r < F.col("cum"))
            ).select(
                "walker", F.col("cur").alias("prev"), F.col("nxt").alias("node")
            )
            if hub is not None:
                nxt = nxt.unionByName(_uniform_step(hub, s))
        state = trunc.truncate(nxt, reap=False)
        out.append(state.select("walker", F.lit(s).cast("int").alias("step"), "node"))
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result
