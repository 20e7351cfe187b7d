"""Graph snapshot diff — what changed between two crawls.

The companion of PageRank's warm start (`pagerank.run(init_ranks=...)`):
before re-running the flagship pipeline on this week's graph, diff it
against last week's to (a) size the delta (tiny delta ⇒ warm start pays
off), (b) route downstream invalidation (which vertices' degrees moved),
(c) audit the crawl itself (a crawl that silently dropped a domain shows
up as a removal spike).

Scale contract (100 TB): `edge_diff` is one full-outer-shaped anti-join
pair on the canonical edge key — two shuffles of edge-key-only rows
(no payloads); `degree_deltas` is two degree aggregations (map-side
combined) and a key-aligned outer join of |V|-sized tables. Nothing
quadratic, nothing driver-side.

Reference parity: the reference re-parses the whole map per release;
diffing is the capability its metric-update tests approximate
(/root/reference/src/network/graph/building.rs metric overwrite), done
set-theoretically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """→ (src, dst, change): every edge present in exactly one snapshot,
    change ∈ {'added', 'removed'}. Comparison is on the distinct
    (src, dst) key — weights/metrics are not compared."""
    o = old.select("src", "dst").distinct()
    n = new.select("src", "dst").distinct()
    added = n.join(o, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("added").alias("change")
    )
    removed = o.join(n, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("removed").alias("change")
    )
    return added.unionByName(removed)


def degree_deltas(old: DataFrame, new: DataFrame) -> DataFrame:
    """→ (vid, out_old, out_new, delta) for every vertex whose out-degree
    changed between the snapshots (distinct-edge degrees)."""
    do = (
        old.select("src", "dst").distinct()
        .groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("out_old"))
    )
    dn = (
        new.select("src", "dst").distinct()
        .groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("out_new"))
    )
    return (
        do.join(dn, "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("out_old", F.lit(0)).alias("out_old"),
            F.coalesce("out_new", F.lit(0)).alias("out_new"),
        )
        .withColumn("delta", F.col("out_new") - F.col("out_old"))
        .where(F.col("delta") != 0)
    )


def diff_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """→ one row (n_old, n_new, n_added, n_removed, jaccard): snapshot
    stability at a glance (jaccard of the edge sets, rounded to 6)."""
    o = old.select("src", "dst").distinct()
    n = new.select("src", "dst").distinct()
    inter = o.join(n, ["src", "dst"], "left_semi")
    return (
        o.agg(F.count("*").alias("n_old"))
        .crossJoin(n.agg(F.count("*").alias("n_new")))
        .crossJoin(inter.agg(F.count("*").alias("n_common")))
        .select(
            "n_old",
            "n_new",
            (F.col("n_new") - F.col("n_common")).alias("n_added"),
            (F.col("n_old") - F.col("n_common")).alias("n_removed"),
            F.round(
                F.col("n_common")
                / (F.col("n_old") + F.col("n_new") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
