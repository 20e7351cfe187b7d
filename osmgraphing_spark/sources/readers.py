"""Strict tabular sources.

The reference's text sources (FMI count-prefixed graph files, edge-info
CSVs) are schema-DECLARED, comment-tolerant, and fail hard on malformed
values (/root/reference/src/io/parsing/network/graph/fmi.rs:160-395,
/root/reference/src/io/parsing/network/edges.rs:13-37). Spark equivalents:

- declared `StructType` + `mode=FAILFAST` (the analogue of the per-field
  ``try_from_str`` errors);
- `#`-comment / blank-line filtering BEFORE parsing (``is_line_functional``,
  /root/reference/src/helpers/mod.rs:7-9);
- schema assertion on every read (the reference's dimension/required-column
  validation, io/parsing/network/graph/mod.rs:107-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaMismatchError(ValueError):
    pass


def assert_schema(df: DataFrame, expected: StructType) -> DataFrame:
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    if got != want:
        raise SchemaMismatchError(f"schema mismatch: got {got}, want {want}")
    return df


def read_commented_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    sep: str = " ",
    comment: str = "#",
    header: bool = False,
) -> DataFrame:
    """Whitespace- or delimiter-separated value files with '#' comments, strict
    types (malformed row → job failure, like the reference's parse errors)."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("comment", comment)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )


GRAPH_VERTEX_SCHEMA = "vid long, key string"
GRAPH_EDGE_SCHEMA = "src long, dst long, weight double"


def read_graph_tables(
    spark: SparkSession, base_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Read a graph previously persisted by sources.writers.write_graph_tables
    (vertex + edge parquet tables, the engine's K1 analogue)."""
    v = spark.read.parquet(f"{base_dir}/vertices")
    e = spark.read.parquet(f"{base_dir}/edges")
    from pyspark.sql.types import _parse_datatype_string

    assert_schema(v.select("vid", "key"), _parse_datatype_string(GRAPH_VERTEX_SCHEMA))
    assert_schema(
        e.select("src", "dst", "weight"), _parse_datatype_string(GRAPH_EDGE_SCHEMA)
    )
    return v, e


def load_prebuilt_graph(spark: SparkSession, base_dir: str, num_blocks: int):
    """Prebuilt graph → Graph dataclass with the edge table restored to its
    resting hash(src) layout (the one shuffle the loop's joins then reuse)."""
    import json

    from pyspark.sql import functions as F

    from ..operators.build import Graph

    v, e = read_graph_tables(spark, base_dir)
    with open(f"{base_dir}/manifest.json") as fh:
        man = json.load(fh)
    e = (
        e.repartition(num_blocks, F.col("src"))
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    e.count()
    return Graph(
        vertices=v,
        edges=e,
        num_vertices=man["num_vertices"],
        num_edges=man["num_edges"],
        num_blocks=num_blocks,
    )


def read_route_pairs(spark: SparkSession, path: str) -> DataFrame:
    """The reference's ``.route-pairs`` workload file (S7 ingest side;
    format: '#'-commented text, a single-token route-count header, then
    ``src-id dst-id count`` lines — written by
    /root/reference/src/io/writing/routing/random_or_all.rs and consumed
    by the balancer) → (src_id long, dst_id long, count long), with the
    declared route-count asserted against the parsed population (S4
    discipline). Same shuffle-free functional-line machinery as the FMI
    reader: line kind is token arity, so no ordering is needed."""
    from .fmi import _functional_lines

    lines = _functional_lines(spark, path)
    counts = [
        int(r["t"][0])
        for r in lines.where(F.size("t") == 1).orderBy("mono").collect()
    ]
    if len(counts) != 1:
        raise ValueError(
            f"route-pairs file: expected ONE route-count header line, "
            f"found {len(counts)}"
        )
    pairs = lines.where(F.size("t") == 3).select(
        F.col("t").getItem(0).cast("long").alias("src_id"),
        F.col("t").getItem(1).cast("long").alias("dst_id"),
        F.col("t").getItem(2).cast("long").alias("count"),
    )
    got = pairs.count()
    if got != counts[0]:
        raise ValueError(
            f"route-pairs file declares {counts[0]} routes but parsed {got}"
        )
    bad = pairs.where(
        F.col("src_id").isNull() | F.col("dst_id").isNull() | F.col("count").isNull()
    )
    if bad.limit(1).count() > 0:
        raise ValueError("route-pairs file: malformed line (typed cast failed)")
    return pairs
