"""Streaming ingestion: the same extraction UDF over a file stream, with
exactly-once catch-up (Trigger.AvailableNow) and restart-resume via the
streaming checkpoint."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osmgraphing_spark.sources import synth
from osmgraphing_spark.streaming.ingest import run_ingest


def test_stream_ingest_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    corpus = synth.fixture_corpus(spark, ("small",))
    corpus.write.mode("overwrite").parquet(in_dir)

    run_ingest(spark, in_dir, out_dir, ck_dir, available_now=True)

    refs = spark.read.parquet(os.path.join(out_dir, "raw_refs"))
    assert refs.count() == 19  # small fixture raw references

    deg = spark.read.parquet(os.path.join(out_dir, "out_degrees"))
    got = {r["path"]: r["out_refs"] for r in deg.collect()}
    assert got["src/b.py"] == 4  # b→a ×3 + b→c
    assert "src/a.py" not in got  # a has no out-refs

    # restart with NO new input: checkpoint prevents double-processing
    run_ingest(spark, in_dir, out_dir, ck_dir, available_now=True)
    assert spark.read.parquet(os.path.join(out_dir, "raw_refs")).count() == 19

    # append a second fixture: only the delta is processed
    synth.fixture_corpus(spark, ("bait",)).write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, available_now=True)
    assert spark.read.parquet(os.path.join(out_dir, "raw_refs")).count() == 19 + 10
