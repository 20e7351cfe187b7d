"""Graph sinks.

The reference writes the finalized graph back out as (a) an FMI text file
with header counts + node rows + edge rows in config-declared column order
(/root/reference/src/io/writing/network/graph/fmi.rs:24-210), (b) edge CSVs
(/root/reference/src/io/writing/network/mod.rs:13-230), and (c) per-edge
external-value files (/root/reference/src/io/writing/network/edges.rs:63-123).

Spark-first equivalents: partitioned parquet (Iceberg in production) vertex
+ edge tables with pinned schemas and a counts manifest (the header), plus
a config-projected CSV export (column order honored, `_` placeholder for
ignored columns — mod.rs:72-216) and an external-values sink. Optional
denormalize-by-mean on write mirrors fmi.rs:105-121.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.build import Graph


def write_graph_tables(graph: Graph, base_dir: str, denormalize_by_mean: bool = False) -> None:
    edges = graph.edges.select("src", "dst", "weight", "out_deg", "out_wsum")
    if denormalize_by_mean:
        mean = edges.agg(F.avg("weight").alias("m"))
        edges = edges.crossJoin(F.broadcast(mean)).select(
            "src", "dst", (F.col("weight") * F.col("m")).alias("weight"),
            "out_deg", "out_wsum",
        )
    graph.vertices.select("vid", "key").write.mode("overwrite").parquet(
        f"{base_dir}/vertices"
    )
    edges.write.mode("overwrite").parquet(f"{base_dir}/edges")
    # the FMI header's role: pinned counts, written LAST as the manifest
    with open(os.path.join(base_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "num_vertices": graph.num_vertices,
                "num_edges": graph.num_edges,
                "num_blocks": graph.num_blocks,
            },
            f,
        )


def export_edges_csv(
    graph: Graph, path: str, columns: list[str], placeholder: str = "_"
) -> None:
    """Config-projected CSV export: emit exactly ``columns`` in order;
    unknown names become the placeholder column (the reference's 'ignored'
    writer columns, mod.rs:72-216)."""
    known = {"src", "dst", "weight", "out_deg", "out_wsum"}
    cols = [
        F.col(c).cast("string").alias(c) if c in known else F.lit(placeholder).alias(c)
        for c in columns
    ]
    graph.edges.select(*cols).write.mode("overwrite").option("header", "true").csv(path)


def write_external_values(values: DataFrame, path: str) -> None:
    """(edge or vertex id, value) CSV — the per-edge workloads sink (K3)."""
    values.write.mode("overwrite").option("header", "true").csv(path)


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "src",
) -> None:
    """Bucketed + sorted managed-table edge sink: `CLUSTERED BY (key)
    SORTED BY (key, dst) INTO n BUCKETS` — the persisted form of the
    in-memory resting hash(src) layout. Every downstream join or
    aggregation on `key` consumes the bucketing instead of shuffling: two
    identically-bucketed tables sort-merge-join with ZERO Exchange on
    either side, and groupBy(key) aggregates scan-local. This is how the
    graph should rest between jobs on a real cluster — the 100 TB edge
    table is shuffled once at build time and never again
    (tests/test_plan_quality.py pins the exchange-free plans).

    The table name may be database-qualified (`db.edges`); create the
    database with an explicit LOCATION to control where files land."""
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key, "dst")
        .format("parquet")
        .saveAsTable(table)
    )


# SMARTS route-file defaults (the reference's defaults::smarts::route_file_format,
# /root/reference/src/defaults.rs:63-74; format from the SMARTS simulator docs)
SMARTS_VERSION = "1.0"
SMARTS_VEHICLE_TYPE = "CAR"
SMARTS_START_TIME = "0.4"
SMARTS_DRIVER_PROFILE = "NORMAL"


def write_smarts(routes: DataFrame, path: str) -> None:
    """SMARTS simulator route-file sink (K5): routes (src, dst, nodes
    array<long>) → one XML file of <vehicle> records
    (/root/reference/src/io/writing/smarts.rs:32-71 writes the same records
    from driver-chosen paths).

    The vehicle records are FORMATTED DISTRIBUTED (one string column, pure
    JVM concat over the nodes array); only the final byte-stream concat is
    driver-side, streamed partition-by-partition via toLocalIterator — a
    route file is bounded by the query workload, not the graph, and the
    format demands a single document."""
    body = routes.select(
        F.concat(
            F.lit('<vehicle id="'), F.col("src").cast("string"),
            F.lit("->"), F.col("dst").cast("string"),
            F.lit(f'" type="{SMARTS_VEHICLE_TYPE}" start_time="{SMARTS_START_TIME}"'
                  f' driverProfile="{SMARTS_DRIVER_PROFILE}">\n'),
            F.array_join(
                F.transform(
                    F.col("nodes"),
                    lambda v: F.concat(
                        F.lit('<node id="'), v.cast("string"), F.lit('"/>')
                    ),
                ),
                "\n",
            ),
            F.lit("\n</vehicle>"),
        ).alias("xml")
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(f'<?xml version="{SMARTS_VERSION}" encoding="UTF-8"?>\n<data>\n')
        for row in body.toLocalIterator():
            f.write(row["xml"])
            f.write("\n")
        f.write("</data>\n")


def write_fmi(
    path: str,
    nodes: DataFrame,
    edges: DataFrame,
    metric_count: int,
    node_cols: list[str] | None = None,
    edge_cols: list[str] | None = None,
) -> None:
    """Native FMI text sink — the reference's interchange format
    (/root/reference/src/io/writing/network/graph/fmi.rs:24-210): a
    3-count header (edge-metric-count, node-count, edge-count — the
    reference's writer always emits all three), '#'-comment column
    documentation, then node rows and edge rows in the given column
    order. Readable back by ``sources.fmi.read_fmi`` (round-trip test in
    tests/test_pbf.py) and by the reference itself.

    Scale note: a count-prefixed text file is an inherently sequential,
    single-file format — this sink streams rows through
    ``toLocalIterator`` (one partition in driver memory at a time, never
    the table) and exists for interchange with the reference toolchain;
    the parquet/bucketed sinks above are the 100 TB path."""
    node_cols = node_cols or nodes.columns
    edge_cols = edge_cols or edges.columns
    n_nodes = nodes.count()
    n_edges = edges.count()

    def fmt(v) -> str:
        if v is None:
            raise ValueError("fmi rows must be dense (NULL value in sink)")
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return repr(v)  # shortest round-trip decimal
        return str(v)

    with open(path, "w") as f:
        f.write("# edge-metric-count\n# node-count\n# edge-count\n")
        f.write(f"# nodes: {node_cols}\n")
        f.write(f"# edges: {edge_cols}\n\n")
        f.write(f"{metric_count}\n{n_nodes}\n{n_edges}\n\n")
        for row in nodes.select(*node_cols).toLocalIterator():
            f.write(" ".join(fmt(row[c]) for c in node_cols) + "\n")
        f.write("\n")
        for row in edges.select(*edge_cols).toLocalIterator():
            f.write(" ".join(fmt(row[c]) for c in edge_cols) + "\n")


def pbf_to_fmi(
    spark,
    pbf_path: str,
    out_path: str,
    vehicle: str = "car",
    picky: bool = True,
    num_blocks: int = 32,
) -> "Graph":
    """The reference's pbf→fmi conversion workflow
    (resources/isle_of_man_2020-03-14/pbf_to_fmi.yaml): parse the pbf,
    build the graph with generated haversine kilometers + hours, then
    write an FMI file with the config's column order — nodes
    [node-idx, node-id, latitude, longitude], edges
    [edge-id, src-id, dst-id, kilometers, hours, lane-count]. Returns the
    built Graph so callers can keep computing on it."""
    from pyspark.sql import Window

    from .pbf import pbf_graph, read_pbf_nodes

    g = pbf_graph(
        spark, pbf_path, vehicle=vehicle, picky=picky,
        num_blocks=num_blocks, with_haversine=True, hours=True,
    )
    coords = read_pbf_nodes(spark, pbf_path)
    nodes = (
        g.vertices.select(F.col("vid"), F.col("key").cast("long").alias("node_id"))
        .join(coords, "node_id")
        .select(
            F.col("vid").alias("node_idx"), "node_id",
            F.col("lat").alias("latitude"), F.col("lon").alias("longitude"),
        )
        .orderBy("node_idx")
    )
    km_i = g.metric_index("kilometers") + 1
    h_i = g.metric_index("hours") + 1
    lc_i = g.metric_index("lanecount") + 1
    vk = g.vertices.select("vid", "key")
    edges = (
        g.edges.select("src", "dst", "metrics")
        .join(vk.select(F.col("vid").alias("src"), F.col("key").alias("_sk")), "src")
        .join(vk.select(F.col("vid").alias("dst"), F.col("key").alias("_dk")), "dst")
        .select(
            F.col("_sk").cast("long").alias("src_id"),
            F.col("_dk").cast("long").alias("dst_id"),
            F.round(F.element_at("metrics", km_i), 6).alias("kilometers"),
            F.round(F.element_at("metrics", h_i), 6).alias("hours"),
            F.element_at("metrics", lc_i).cast("long").alias("lane_count"),
        )
        .withColumn(
            "edge_id",
            F.row_number().over(Window.orderBy("src_id", "dst_id")) - 1,
        )
        .select("edge_id", "src_id", "dst_id", "kilometers", "hours", "lane_count")
    )
    write_fmi(
        out_path, nodes, edges, metric_count=3,
        node_cols=["node_idx", "node_id", "latitude", "longitude"],
        edge_cols=["edge_id", "src_id", "dst_id", "kilometers", "hours", "lane_count"],
    )
    return g


def contract_to_ch_fmi(
    spark,
    fmi_path: str,
    out_path: str,
    node_schema: list[tuple[str, str]],
    edge_schema: list[tuple[str, str]],
    src_col: str,
    dst_col: str,
    weight_col: str,
    metric_cols: list[str] | None = None,
    max_expand: int = 64,
) -> None:
    """The reference's fmi→CH workflow WITHOUT the external tool: its
    fmi_to_ch.yaml merely re-writes the graph as input for
    multi-ch-constructor, which produces graph.ch.fmi
    (resources/isle_of_man_2020-03-14/fmi_to_ch.yaml). Here
    ``operators.ch.contract_graph`` does the contraction in-engine and
    this function writes the contracted result straight to the
    reference's ch-fmi shape: 3-count header, node rows
    [idx, id, lat, lon, height, level], edge rows
    [src, dst, *metrics, sc0, sc1] with -1/-1 on originals and the
    component edge INDICES on shortcuts (fmi.rs's ShortcutIdx columns).

    Non-contraction metrics on shortcut rows are resolved by the same
    bottom-up pass the sc indices come from: a shortcut's metric vector
    is the sum of its two components', resolved iteratively in via-level
    order (component levels strictly decrease, so ≤ depth rounds)."""
    from pyspark.sql import Window

    from ..operators import ch as ch_op
    from .fmi import read_fmi

    t = read_fmi(spark, fmi_path, node_schema, edge_schema)
    metric_cols = metric_cols or [
        n for n, ty in edge_schema
        if ty == "double" and n not in (src_col, dst_col)
    ]
    e = t.edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        F.col(weight_col).alias("w"),
        *[F.col(c) for c in metric_cols],
    )
    ch_e, levels = ch_op.contract_graph(
        e.select("src", "dst", "w")
    )
    # deterministic edge numbering (0-based) for the shortcut indices
    eid = ch_e.withColumn(
        "eid", F.row_number().over(Window.orderBy("src", "dst")) - 1
    )
    # resolve metric vectors bottom-up: originals seed from the input
    # edge table (min-w row per pair), shortcuts sum their components
    orig_m = e.groupBy("src", "dst").agg(
        F.min(F.struct("w", *metric_cols)).alias("m")
    ).select(
        "src", "dst", *[F.col(f"m.{c}").alias(c) for c in metric_cols]
    )
    resolved = (
        eid.where(F.col("via").isNull())
        .join(orig_m, ["src", "dst"], "left")
        .select("eid", "src", "dst", "via", *metric_cols)
    )
    pending = eid.where(F.col("via").isNotNull()).select(
        "eid", "src", "dst", "via"
    )
    for _ in range(max_expand):
        if pending.limit(1).count() == 0:
            break
        comp = resolved.select(
            "src", "dst", *[F.col(c).alias(f"_m_{c}") for c in metric_cols]
        )
        step = (
            pending.join(
                comp.select(
                    F.col("src"), F.col("dst").alias("via"),
                    *[F.col(f"_m_{c}").alias(f"_a_{c}") for c in metric_cols],
                ),
                ["src", "via"],
            )
            .join(
                comp.select(
                    F.col("src").alias("via"), F.col("dst"),
                    *[F.col(f"_m_{c}").alias(f"_b_{c}") for c in metric_cols],
                ),
                ["via", "dst"],
            )
            .select(
                "eid", "src", "dst", "via",
                *[
                    (F.col(f"_a_{c}") + F.col(f"_b_{c}")).alias(c)
                    for c in metric_cols
                ],
            )
        )
        resolved = resolved.unionByName(step)
        pending = pending.join(step.select("eid"), "eid", "left_anti")
    else:
        raise RuntimeError("shortcut metric resolution did not converge")

    comp_eid = eid.select("src", "dst", F.col("eid").alias("_ceid"))
    edges_out = (
        resolved
        .join(
            comp_eid.select(
                F.col("src"), F.col("dst").alias("via"),
                F.col("_ceid").alias("sc0"),
            ),
            ["src", "via"],
            "left",
        )
        .join(
            comp_eid.select(
                F.col("src").alias("via"), F.col("dst"),
                F.col("_ceid").alias("sc1"),
            ),
            ["via", "dst"],
            "left",
        )
        .select(
            "src", "dst",
            *[F.round(F.col(c), 6).alias(c) for c in metric_cols],
            F.coalesce("sc0", F.lit(-1)).cast("long").alias("sc0"),
            F.coalesce("sc1", F.lit(-1)).cast("long").alias("sc1"),
            "eid",
        )
        .orderBy("eid")
        .drop("eid")
    )
    node_id_col = node_schema[0][0] if not node_schema[0][0].startswith("ignored") else node_schema[1][0]
    nodes_out = (
        t.nodes.join(
            levels.withColumnRenamed("vid", node_id_col), node_id_col, "left"
        )
        .select(
            F.col(node_id_col).alias("node_idx"),
            F.col(node_id_col).alias("node_id"),
            *[
                F.col(n) for n, ty in node_schema
                if ty == "double" and not n.startswith("ignored")
            ],
            F.lit(0).alias("height"),
            F.coalesce("level", F.lit(0)).cast("long").alias("level"),
        )
        .orderBy("node_idx")
    )
    write_fmi(
        out_path, nodes_out, edges_out,
        metric_count=len(metric_cols),
        node_cols=list(nodes_out.columns),
        edge_cols=list(edges_out.columns),
    )
