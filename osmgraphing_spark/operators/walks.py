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
