"""Graph build: raw edges → finalized vertex/edge tables + CSR blocks.

The Spark re-expression of ``GraphBuilder::finalize``
(/root/reference/src/network/graph/building.rs:351-1459):

| reference step                              | here                         |
|---------------------------------------------|------------------------------|
| node-id sort + dedup → dense NodeIdx        | ``assign_vertex_ids``        |
|   (building.rs:274-276, binary-search remap  |   global range-sort +        |
|    :387-452)                                 |   per-partition prefix sums  |
| edge dedup at 1e-6 (building.rs:503-573)    | ``dedup_edges``              |
| zero-metric clamp to 1e-6 (building.rs:69-88)| weight clamp in dedup        |
| fwd sort by (src,dst) (building.rs:457-475) | repartition by hash(src) +   |
|                                              |   sortWithinPartitions       |
| offset-array build (building.rs:712-771)    | ``csr_blocks`` (cumsum per   |
|                                              |   partition, applyInPandas)  |
| CSC/bwd (building.rs:813-884)               | shuffle-by-dst when needed   |
|                                              |   (Spark re-shuffles instead |
|                                              |    of storing a permutation) |

Scale design:
- Vertex-ID assignment avoids any single-partition window: range-partition
  by key, count per partition (tiny driver-side prefix sum, P integers),
  then ``mapInPandas`` stamps ``offset[pid] + local_row_number``. This is
  exactly the reference's offset trick, distributed.
- The edge table's resting layout is hash(src_idx) % P — every iterative
  algorithm joins rank-state on src, so co-partitioning is reused across
  all supersteps (one shuffle at build time, zero per superstep on the
  edge side).
- CSR blocks pack each partition's edges into a handful of array rows;
  SpMV supersteps then scan arrays instead of shuffling per-edge rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import F64_ABS

CSR_SCHEMA = (
    "block_id int, src_ids array<long>, offsets array<long>, "
    "dst_ids array<long>, weights array<double>"
)

#: vertex maps at or below this many rows broadcast into the densify joins
#: (a 16M-row (string key, long vid) relation is ~1 GiB hashed — well
#: inside any executor sized for this engine, and it replaces two full
#: edge-table shuffles+sorts); bigger maps use the shuffled join path
VERTEX_MAP_BROADCAST_ROWS = 16_000_000


def assign_vertex_ids(raw_edges: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Distinct endpoint keys → (key, vid) with vid contiguous in [0, N).

    Ordering is by key (like the reference's sorted node_ids,
    building.rs:274-276), so vid assignment is deterministic and
    parallelism-independent. Only vertices referenced by an edge get an id
    (the reference drops unreferenced nodes, pbf.rs:174-199).
    """
    keys = (
        raw_edges.select(F.col("src_key").alias("key"))
        .unionAll(raw_edges.select(F.col("dst_key").alias("key")))
        .distinct()
    )
    # materialize the distinct BEFORE repartitionByRange: the range
    # partitioner runs a separate SAMPLING job over its child, which would
    # otherwise re-execute the whole 2×|E|-row distinct a second time —
    # measured as the single biggest constant of the vertex-id phase
    keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
    keys.count()
    parted = keys.repartitionByRange(num_partitions, "key").sortWithinPartitions("key")
    parted.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["pid"]: r["n"]
        for r in parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def stamp(batches):
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["vid"] = np.arange(base + seen, base + seen + n, dtype=np.int64)
            seen += n
            yield pdf

    out = parted.mapInPandas(stamp, schema="key string, vid long")
    # pin the assignment through a parquet round-trip, NOT a persist: a
    # persisted block lost to executor death would be recomputed against a
    # RE-SAMPLED range partitioning — silently remapping vertex ids mid-job
    # (observed: cc labels changed after total block loss). File-backed ids
    # are recompute-proof and leave no executor-storage blocks behind.
    from ..plans.checkpoint import EphemeralTruncator

    out = EphemeralTruncator(raw_edges.sparkSession, "vids").truncate(out)
    parted.unpersist()
    keys.unpersist()
    return out


def dedup_edges(raw_edges: DataFrame) -> DataFrame:
    """Duplicate edges (same src, dst, weight within 1e-6) collapse to one.

    Mirrors the reference's finalize-time dedup: equal (src, dst) AND all
    metrics approx-equal at 1e-6 → drop (building.rs:503-573). Weights are
    clamped to >= 1e-6 first (building.rs:69-88: iterative compute needs
    positive weights).
    """
    return (
        raw_edges.withColumn(
            "weight",
            F.when(F.col("weight") < F.lit(F64_ABS), F.lit(F64_ABS)).otherwise(
                F.col("weight")
            ),
        )
        .withColumn("w_grid", F.round(F.col("weight"), 6))
        .dropDuplicates(["src_key", "dst_key", "w_grid"])
        .drop("w_grid")
    )


def dedup_edges_multi(raw_edges: DataFrame) -> DataFrame:
    """Multi-metric variant: ``metrics array<double>`` column; every
    component is clamped to >= 1e-6, and duplicates collapse when (src, dst)
    match AND EVERY metric agrees on the 1e-6 grid — the reference's
    finalize-time rule over its edge × metric matrix
    (/root/reference/src/network/graph/building.rs:503-573; matrix store
    mod.rs:95-96)."""
    clamped = raw_edges.withColumn(
        "metrics",
        F.transform(
            F.col("metrics"),
            lambda m: F.when(m < F.lit(F64_ABS), F.lit(F64_ABS)).otherwise(m),
        ),
    )
    return (
        clamped.withColumn(
            "m_grid", F.transform(F.col("metrics"), lambda m: F.round(m, 6))
        )
        .dropDuplicates(["src_key", "dst_key", "m_grid"])
        .drop("m_grid")
    )


@dataclass
class Graph:
    """Finalized graph: the Spark analogue of the reference's ``Graph``
    struct (/root/reference/src/network/graph/mod.rs:78-103).

    vertices: (key string, vid long)            — sorted external ids → dense
    edges:    (src long, dst long, weight double, out_deg long, out_wsum double
               [, metrics array<double>])
              resting layout: hash(src) % num_blocks, sorted (src, dst)
    metric_names: config-declared metric vocabulary when the graph carries a
              per-edge metric VECTOR (the reference's edge × metric matrix,
              mod.rs:95-96; width declared in resources/blueprint.yaml:20-117);
              ``weight`` is then an alias of ``metrics[0]``.
    num_vertices / num_edges: pinned counts (the reference pins these in
              tests, tests/isle_of_man/parsing.rs:40-41)
    """

    vertices: DataFrame
    edges: DataFrame
    num_vertices: int
    num_edges: int
    num_blocks: int
    metric_names: list[str] | None = None

    def out_degrees(self) -> DataFrame:
        # out_deg/out_wsum are constant per src by construction; max is the
        # self-documentingly safe pick (F.first depended on that invariant)
        return self.edges.groupBy("src").agg(
            F.max("out_deg").alias("out_deg"), F.max("out_wsum").alias("out_wsum")
        )

    def metric_index(self, name: str) -> int:
        if not self.metric_names or name not in self.metric_names:
            raise KeyError(f"unknown metric {name!r} (have {self.metric_names})")
        return self.metric_names.index(name)

    def metric_col(self, name: str):
        """Column expression for one named metric of the vector."""
        return F.element_at(F.col("metrics"), self.metric_index(name) + 1)

    def metric_means(self) -> dict[str, float]:
        """Per-metric global mean — ONE pass, k algebraic aggregates (the
        reference recomputes per-metric means at finalize,
        building.rs:1410-1455)."""
        if not self.metric_names:
            return {"weight": self.edges.agg(F.avg("weight")).collect()[0][0]}
        aggs = [
            F.avg(F.element_at(F.col("metrics"), i + 1)).alias(n)
            for i, n in enumerate(self.metric_names)
        ]
        row = self.edges.agg(*aggs).collect()[0]
        return {n: float(row[n]) for n in self.metric_names}

    def normalized_metrics(self) -> DataFrame:
        """Edges with every metric divided by its global mean (the
        reference's mean-normalization applied to the whole vector) —
        → (src, dst, metrics array<double>)."""
        means = self.metric_means()
        if not self.metric_names:
            m = means["weight"]
            return self.edges.select(
                "src", "dst", F.array(F.col("weight") / F.lit(m)).alias("metrics")
            )
        arr = F.array(
            *[
                F.element_at(F.col("metrics"), i + 1) / F.lit(means[n])
                for i, n in enumerate(self.metric_names)
            ]
        )
        return self.edges.select("src", "dst", arr.alias("metrics"))

    def with_metric_vector(self, names: list[str] | None = None) -> "Graph":
        """Single-weight graph → multi-metric view (metrics = [weight]) so
        the `generating` vocabulary can run on graphs built without a
        declared metric config. No-op (returns self) when already
        multi-metric."""
        if self.metric_names:
            return self
        from dataclasses import replace

        names = list(names or ["weight"])
        if len(names) != 1:
            raise ValueError("a single-weight graph vectorizes to exactly 1 metric")
        return replace(
            self,
            edges=self.edges.withColumn("metrics", F.array(F.col("weight"))),
            metric_names=names,
        )

    def csr_blocks(self) -> DataFrame:
        return build_csr_blocks(self.edges, self.num_blocks)

    def symmetrized_edges(self) -> DataFrame:
        """Undirected view (for CC / triangles): union of both directions,
        deduped — the analogue of the reference's direction explosion
        (pbf.rs:110-123) for algorithms needing undirected semantics."""
        fwd = self.edges.select("src", "dst")
        bwd = self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return fwd.unionAll(bwd).where(F.col("src") != F.col("dst")).distinct()


def build_graph(
    raw_edges: DataFrame,
    num_blocks: int = 32,
    id_partitions: int = 32,
    metric_names: list[str] | None = None,
) -> Graph:
    """raw (src_key, dst_key, weight) → finalized Graph.

    With ``metric_names``, raw edges carry ``metrics array<double>`` of that
    width instead of ``weight``: dedup/clamp act on the whole vector and
    ``weight`` becomes an alias of ``metrics[0]`` (so every algorithm's
    weighted mode keeps working)."""
    from ..plans.checkpoint import EphemeralTruncator
    from ..plans.superstep import sized_shuffle

    spark = raw_edges.sparkSession
    # The raw edge table is typically a LIVE extraction plan (pandas-UDF
    # parse over `content`): the build reads it three times (endpoint-key
    # union ×2, densify join ×1), which at corpus scale is three full
    # parses. Reliably truncate it ONCE — the extracted edges are a small
    # fraction of corpus bytes, so one parquet round-trip beats two
    # re-parses at every scale (and the sha256 verify fires here, failing
    # the build on the first corrupt row before any graph work runs).
    raw_edges = EphemeralTruncator(spark, "rawedges").truncate(raw_edges)
    n_raw = raw_edges.limit(16_000_000).count()
    # Build-phase exchanges (dedup, key distinct, densify, degree agg)
    # carry edge-sized rows: run them at adaptive width — full session
    # width for big graphs, ~250k rows/partition below that (fixture-sized
    # builds otherwise pay ~10 full-width shuffles of per-task fixed cost).
    # Explicit partitionings (range-partitioned vid assignment, the
    # hash(src) resting layout) are pinned by num_blocks/id_partitions and
    # unaffected by the session conf.
    with sized_shuffle(spark, n_raw):
        return _build_graph_body(
            raw_edges, num_blocks, id_partitions, metric_names
        )


def _build_graph_body(
    raw_edges: DataFrame,
    num_blocks: int,
    id_partitions: int,
    metric_names: list[str] | None,
) -> Graph:
    # ONE clustering by src_key feeds the whole src-side pipeline: the
    # dedup aggregate keys on (src_key, dst_key, grid) — a SUPERSET of the
    # clustering, so Spark's subset-satisfies rule plans it with no further
    # exchange — and the per-src degree aggregate, the degree join and the
    # src-map join (edge side) all reuse the same layout. Catalyst's
    # runtime exchange reuse then computes the shuffle once per action.
    # Edge-sized data crosses the wire exactly 3 times in the main build
    # action (this clustering, the dst-key join, the final resting layout)
    # vs 6 for the naive dedup→densify→degree ordering — measured as the
    # dominant constant of the pbf ingest leg (SCALE.md §8.4).
    clustered = raw_edges.repartition(F.col("src_key"))
    if metric_names:
        edges_d = dedup_edges_multi(clustered).withColumn(
            "weight", F.element_at(F.col("metrics"), 1)
        )
        carry = ["src", "dst", "weight", "metrics"]
    else:
        edges_d = dedup_edges(clustered)
        carry = ["src", "dst", "weight"]

    # per-src degree + weight sum (for PageRank contributions): keyed on
    # src_key BEFORE densification (src_key ↔ src vid is a bijection, so
    # the counts are identical) — zero exchange on the clustered layout
    deg = edges_d.groupBy("src_key").agg(
        F.count("*").alias("out_deg"), F.sum("weight").alias("out_wsum")
    )
    e = edges_d.join(deg, "src_key", "inner")

    vids = assign_vertex_ids(edges_d, num_partitions=id_partitions)
    n_vertices = vids.count()

    # endpoint densification: external key → dense vid (the reference's
    # chunked binary-search remap, building.rs:387-452). Up to the row
    # gate the map is BROADCAST — both densify joins then probe a hash
    # relation with ZERO edge-table exchanges or sorts (measured: the two
    # sort-merge joins were the largest constant of the main build
    # action). Past the gate (10^12-file scale: billions of vertices)
    # they fall back to shuffled equi-joins on a unique key (no skew),
    # with the src side reusing the edge table's existing clustering.
    src_map = vids.select(F.col("key").alias("src_key"), F.col("vid").alias("src"))
    dst_map = vids.select(F.col("key").alias("dst_key"), F.col("vid").alias("dst"))
    if n_vertices <= VERTEX_MAP_BROADCAST_ROWS:
        src_map, dst_map = F.broadcast(src_map), F.broadcast(dst_map)
    e = (
        e.join(src_map, "src_key", "inner")
        .join(dst_map, "dst_key", "inner")
        .select(*carry, "out_deg", "out_wsum")
    )

    # resting layout: co-partitioned by src hash, sorted — every superstep
    # join on src reuses this without reshuffling the (big) edge side
    e = (
        e.repartition(num_blocks, F.col("src"))
        .sortWithinPartitions("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = e.count()
    return Graph(
        vertices=vids,
        edges=e,
        num_vertices=n_vertices,
        num_edges=n_edges,
        num_blocks=num_blocks,
        metric_names=list(metric_names) if metric_names else None,
    )


def build_csr_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """Edge rows → per-block CSR arrays (one row per block).

    The distributed analogue of the reference's offset-array construction
    (building.rs:712-771): within a block, edges sorted by (src, dst);
    ``offsets[i]..offsets[i+1]`` spans the out-edges of ``src_ids[i]``.
    Only sources with out-degree > 0 appear (block-local compression).

    Scale guard: a block is ONE row of arrays, so ``num_blocks`` must grow
    with |E| — the pack stage enforces a hard per-block cap (100M edges ≈
    2.4 GB of array cells, safely inside Arrow/JVM single-row limits) and
    fails with the required num_blocks instead of producing a corrupt or
    OOM-ing row.
    """
    MAX_EDGES_PER_BLOCK = 100_000_000

    def pack(key, pdf: pd.DataFrame):
        bid = int(key[0])
        if len(pdf) > MAX_EDGES_PER_BLOCK:
            raise ValueError(
                f"CSR block {bid} holds {len(pdf)} edges > "
                f"{MAX_EDGES_PER_BLOCK}; raise num_blocks (currently "
                f"{num_blocks}) so each block fits one Arrow row"
            )
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        src = pdf["src"].to_numpy(dtype=np.int64)
        uniq, counts = np.unique(src, return_counts=True)
        offs = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        return pd.DataFrame(
            {
                "block_id": [bid],
                "src_ids": [uniq.tolist()],
                "offsets": [offs.tolist()],
                "dst_ids": [pdf["dst"].to_numpy(dtype=np.int64).tolist()],
                "weights": [pdf["weight"].to_numpy(dtype=np.float64).tolist()],
            }
        )

    blocked = edges.withColumn(
        "block_id", F.pmod(F.hash(F.col("src")), F.lit(num_blocks)).cast("int")
    )
    return blocked.groupBy("block_id").applyInPandas(pack, schema=CSR_SCHEMA)
