"""Streaming dedup gate — the "this week's crawl" admission filter.

A documents stream is admitted micro-batch by micro-batch: each batch is
first deduplicated WITHIN itself (exact + MinHash-LSH near-dup,
min-id survivors), then filtered AGAINST the accumulated corpus — the
static seed corpus plus every previously accepted batch — with the
incremental-dedup operators (`dedup.filter_new_against`). Survivors
land in a per-batch directory, so the corpus a later batch is compared
against always includes earlier survivors: the streaming closure of
batch incremental dedup.

Exactly-once: the same discipline as streaming/ingest.run_ingest —
survivors are written with overwrite into ``accepted/batch_id=N`` (a
retried batch rewrites the same directory), and an ``_APPLIED_BATCH``
marker (Hadoop FS API, so hdfs:///s3a:// roots work) lets a retry of a
fully-committed batch skip instead of re-gating against a corpus that
already contains its own output (which would wrongly drop the whole
batch).

Scale contract (100 TB/day): the per-batch work is the batch-sized side
of the incremental-dedup joins — the corpus side contributes its
signature/bucket table, never a pair join of corpus against itself; the
LSH family is the portable one, so a persisted corpus signature table
keeps working across restarts (dedup.lsh_candidates_against's
documented contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as dd
from ..plans.checkpoint import _Hdfs


def run_dedup_gate(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Stream parquet document files from ``input_dir``; admit survivors
    under ``output_dir/accepted/batch_id=N``. Returns the finished
    StreamingQuery (awaited when ``available_now``)."""
    seed = spark.read.parquet(corpus_dir)
    schema = seed.schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    fs = _Hdfs(spark, output_dir)
    accepted_root = os.path.join(output_dir, "accepted")
    marker = os.path.join(accepted_root, "_APPLIED_BATCH")

    def gate(batch_df: DataFrame, batch_id: int):
        applied = int(fs.read_text(marker)) if fs.exists(marker) else -1
        if batch_id <= applied:
            return
        batch_df.persist()
        try:
            # within-batch dedup first: two copies arriving together must
            # not both pass the cross-corpus gate
            kept = dd.drop_exact_duplicates(batch_df)
            kept = dd.drop_near_duplicates(
                kept, threshold=threshold, num_hashes=num_hashes, bands=bands, n=n
            )
            corpus = seed
            if fs.exists(accepted_root):
                try:
                    prior = spark.read.parquet(
                        os.path.join(accepted_root, "batch_id=*")
                    )
                    corpus = corpus.unionByName(prior.select(*corpus.columns))
                except Exception:
                    pass  # no prior batch directories yet
            survivors = dd.filter_new_against(
                kept, corpus, num_hashes=num_hashes, bands=bands, n=n
            )
            survivors.write.mode("overwrite").parquet(
                os.path.join(accepted_root, f"batch_id={batch_id}")
            )
            fs.write_text(marker, str(batch_id))
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q
