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


def _write_event_halves(spark, src: str, out_dir: str) -> None:
    """Split the events table into two chronological files so
    maxFilesPerTrigger=1 yields two micro-batches (watermark advances
    between them)."""
    import glob
    import shutil
    import time

    ev = spark.read.parquet(src).orderBy("ts", "event_id").collect()
    half = len(ev) // 2
    os.makedirs(out_dir, exist_ok=True)
    schema = spark.read.parquet(src).schema
    for i, chunk in enumerate((ev[:half], ev[half:])):
        # the file-stream source lists plain FILES under the dir (it does
        # not descend into nested parquet dirs) → write to a scratch dir,
        # move the single part file up as partN.parquet
        scratch = os.path.join(out_dir, f"_scratch{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dest = os.path.join(out_dir, f"part{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(scratch)
        t = time.time() + i  # strictly increasing mtimes → batch order
        os.utime(dest, (t, t))


def _run_available_now(spark, stream_df, table: str, in_dir_unused=None):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def test_windowed_event_stats_matches_batch(spark, tmp_path):
    """Every finalized streaming window must equal the batch aggregate for
    the same (window, event_type) exactly; at least one window finalizes
    (the watermark passes batch 1's windows when batch 2 arrives)."""
    from osmgraphing_spark.streaming.windows import windowed_event_stats

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "ev_stream")
    _write_event_halves(spark, src, in_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    got = _run_available_now(
        spark, windowed_event_stats(stream, "1 hour", "0 seconds"), "win_stats"
    ).collect()
    assert len(got) > 0

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_stats(spark.read.parquet(src), "1 hour", "0 seconds")
        .collect()
    }
    for r in got:
        key = (r["window_start"], r["event_type"])
        assert key in batch, f"streamed window {key} not in batch result"
        assert (r["n_events"], r["total_value"]) == batch[key], key


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Closed streaming sessions are exactly-once and each must equal a
    batch-derived session (same user, start, end, count). Every session
    except possibly each user's LAST (still open at end-of-stream, or its
    timeout never fired because the stream ended) must be emitted."""
    from osmgraphing_spark.streaming.windows import sessionize_stream

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "sess_stream")
    _write_event_halves(spark, src, in_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    got = _run_available_now(
        spark, sessionize_stream(stream, gap_s=1800), "sessions"
    ).collect()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    assert len(streamed) == len(got), "a session was emitted twice"

    # batch oracle: fold each user's sorted events with the same gap rule
    rows = (
        spark.read.parquet(src)
        .select("user_id", "ts")
        .orderBy("user_id", "ts")
        .collect()
    )
    batch_sessions, last_of_user = set(), {}
    cur = None  # (uid, start, end, n)
    for r in rows:
        uid, ts = r["user_id"], r["ts"]
        if cur is not None and (
            uid != cur[0] or (ts - cur[2]).total_seconds() > 1800
        ):
            batch_sessions.add(tuple(cur))
            last_of_user[cur[0]] = tuple(cur)
            cur = None
        if cur is None:
            cur = [uid, ts, ts, 1]
        else:
            cur[2], cur[3] = ts, cur[3] + 1
    if cur is not None:
        batch_sessions.add(tuple(cur))
        last_of_user[cur[0]] = tuple(cur)

    assert streamed <= batch_sessions, streamed - batch_sessions
    # everything but per-user final sessions must have been closed+emitted
    must_emit = batch_sessions - set(last_of_user.values())
    assert must_emit <= streamed, must_emit - streamed
