"""Incremental corpus ingestion (Structured Streaming).

The reference is strictly batch (files in → files out), so streaming is an
*extension*, not parity: a 10^12-file corpus is appended to continuously,
and re-extracting everything per snapshot is wasteful. This module runs the
SAME extraction stage (operators/extract.py — one pandas UDF, no separate
code path) over a file stream and maintains incremental aggregates.

Pattern: ``readStream`` (parquet dir source here; Iceberg/Kafka in prod)
→ extraction UDF → ``foreachBatch`` upsert into the raw-edge table +
running degree counts. ``Trigger.AvailableNow`` gives exactly-once batch
catch-up semantics for tests; checkpointLocation carries source offsets so
restarts resume mid-stream (the streaming cousin of plans/checkpoint.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_refs
from ..sources.synth import SCHEMA


def stream_corpus(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(SCHEMA).parquet(input_dir)


def _extract_refs_stream(corpus: DataFrame) -> DataFrame:
    """Streaming-safe slice of operators.extract: the UDF + explode stages
    (stateless, so they stream as-is); resolution joins run per micro-batch
    in foreachBatch where the dictionary side is a static table."""
    return (
        corpus.select(
            "repo", "path", extract_refs(F.col("lang"), F.col("content")).alias("refs")
        )
        .where(F.size("refs") > 0)
        .select("repo", "path", F.explode("refs").alias("ref"))
        .select(
            "repo",
            "path",
            F.col("ref.target").alias("target_stem"),
            F.col("ref.weight").alias("weight"),
        )
    )


def run_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream corpus files → append raw (unresolved) reference records to
    ``output_dir/raw_refs`` and maintain ``output_dir/out_degrees``.
    Returns the finished StreamingQuery (after awaitTermination when
    available_now)."""
    from ..plans.checkpoint import _Hdfs

    refs = _extract_refs_stream(stream_corpus(spark, input_dir))
    fs = _Hdfs(spark, output_dir)

    def upsert(batch_df: DataFrame, batch_id: int):
        """Exactly-once per micro-batch, retry-safe:

        - raw_refs land in a PER-BATCH subdirectory written with overwrite —
          a retried batch rewrites the same directory instead of appending
          duplicate rows;
        - the running degree table carries the id of the last batch folded
          into it (`_APPLIED_BATCH`, written into the staged directory so the
          atomic rename publishes data + marker together); a retry of an
          already-applied batch is detected and skipped instead of
          double-counted.

        All marker/swap I/O goes through the Hadoop FileSystem API so an
        hdfs:///s3a:// output root works (production is Iceberg MERGE INTO).
        """
        deg_path = os.path.join(output_dir, "out_degrees")
        marker = f"{deg_path}/_APPLIED_BATCH"
        applied = int(fs.read_text(marker)) if fs.exists(marker) else -1
        if batch_id <= applied:
            return  # retry of a fully-committed batch: nothing to do

        batch_df.persist()
        batch_df.write.mode("overwrite").parquet(
            os.path.join(output_dir, "raw_refs", f"batch_id={batch_id}")
        )
        batch_deg = batch_df.groupBy("repo", "path").agg(
            F.count("*").alias("out_refs")
        )
        if applied >= 0:
            old = spark.read.parquet(deg_path)
            merged = (
                old.unionByName(batch_deg)
                .groupBy("repo", "path")
                .agg(F.sum("out_refs").alias("out_refs"))
            )
        else:
            merged = batch_deg
        staged = f"{deg_path}_stage_b{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        fs.write_text(f"{staged}/_APPLIED_BATCH", str(batch_id))
        fs.delete(deg_path)
        fs.rename(staged, deg_path)
        batch_df.unpersist()

    writer = (
        refs.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
