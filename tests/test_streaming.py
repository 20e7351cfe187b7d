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
        assert r["n_events"] == batch[key][0], key
        # incremental (state + batch2) summation orders doubles differently
        # than the one-shot batch sum; compare to the rounding grain, not
        # bit-exactly, or a true sum near a 6th-decimal boundary flakes
        assert abs(r["total_value"] - batch[key][1]) < 2e-6, key


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Final streaming sessions are exactly-once and each must equal a
    batch-derived session (same user, start, end, count). Emission is
    watermark-driven: after batch 2 the watermark sits at batch 1's max
    event time, so every batch session whose `end + gap` lies safely below
    it MUST have been emitted; nothing outside the batch session set may
    ever be emitted."""
    import datetime

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
    batch_sessions = set()
    cur = None  # (uid, start, end, n)
    for r in rows:
        uid, ts = r["user_id"], r["ts"]
        if cur is not None and (
            uid != cur[0] or (ts - cur[2]).total_seconds() > 1800
        ):
            batch_sessions.add(tuple(cur))
            cur = None
        if cur is None:
            cur = [uid, ts, ts, 1]
        else:
            cur[2], cur[3] = ts, cur[3] + 1
    if cur is not None:
        batch_sessions.add(tuple(cur))

    assert streamed <= batch_sessions, streamed - batch_sessions

    # watermark after batch 1 = batch 1's max event time (delay 0s);
    # sessions final strictly below it (1 s slack for the watermark's ms
    # truncation) must all have been emitted by batch 2 / the timeout pass
    half = len(rows) // 2
    wm1 = sorted(r["ts"] for r in rows)[half - 1]
    must_emit = {
        s
        for s in batch_sessions
        if s[2] + datetime.timedelta(seconds=1800 + 1) < wm1
    }
    assert must_emit <= streamed, must_emit - streamed
    assert len(must_emit) > 0  # the assertion above is not vacuous


def test_sessionize_stream_handles_late_events(spark, tmp_path):
    """In-watermark LATE events (review finding r2): an event older than the
    open session must form its own earlier session when beyond the gap, and
    extend the session's start backward when within it — not be silently
    folded forward."""
    import datetime as dt

    from osmgraphing_spark.streaming.windows import sessionize_stream

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, uid, hours):
        return (i, T0 + dt.timedelta(hours=hours), uid, "click", 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batches = [
        # batch 0: on-time events at 10:00
        [ev(0, 1, 10.0), ev(1, 3, 10.0), ev(2, 2, 10.0)],
        # batch 1: LATE events (watermark = 10:00 - 2h = 08:00, both kept):
        # user 1 @ 09:00 → >gap before 10:00 ⇒ separate EARLIER session;
        # user 3 @ 09:30 → exactly gap ⇒ merges, start extends BACKWARD;
        # user 2 @ 13:00 advances max event time
        [ev(3, 1, 9.0), ev(4, 3, 9.5), ev(5, 2, 13.0)],
        # batch 2: push the watermark to 18:00 so users 1/3 finalize
        [ev(6, 2, 20.0)],
    ]
    in_dir = str(tmp_path / "late_stream")
    os.makedirs(in_dir, exist_ok=True)
    import glob
    import shutil
    import time as _time

    for i, rows in enumerate(batches):
        scratch = os.path.join(in_dir, f"_s{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dest = os.path.join(in_dir, f"part{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(scratch)
        t = _time.time() + i
        os.utime(dest, (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    got = _run_available_now(
        spark,
        sessionize_stream(stream, gap_s=1800, watermark="2 hours"),
        "late_sessions",
    ).collect()
    sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    h = lambda x: T0 + dt.timedelta(hours=x)
    # user 1: two separate single-event sessions (3600 s apart > gap)
    assert (1, h(9.0), h(9.0), 1) in sessions
    assert (1, h(10.0), h(10.0), 1) in sessions
    # user 3: ONE session extended backward (1800 s apart == gap ⇒ merge)
    assert (3, h(9.5), h(10.0), 2) in sessions
    assert not any(u == 3 and s != h(9.5) for (u, s, _, _) in sessions)


def test_dedup_stream_drops_within_watermark(spark, tmp_path):
    """Streaming exact dedup keeps the first arrival per digest; the kept
    set equals the batch drop_exact_duplicates digest set."""
    from osmgraphing_spark.streaming.windows import dedup_stream

    in_dir = str(tmp_path / "din")
    out_dir = str(tmp_path / "dout")
    ck_dir = str(tmp_path / "dck")
    rows = [
        (1, "2024-01-01 10:00:00", "same text content"),
        (2, "2024-01-01 10:05:00", "same text content"),   # dup of 1
        (3, "2024-01-01 10:10:00", "different content"),
        (5, "2024-01-01 10:20:00", "different content"),   # dup of 3
        (7, "2024-01-01 10:25:00", "a third distinct text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts string, text string")
    df.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(
        "doc_id long, ts string, text string"
    ).parquet(in_dir)
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    kept_ids = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    # the contract: exactly ONE survivor per digest group within the
    # horizon. WHICH row of a group survives is arbitrary within a
    # micro-batch (dropDuplicatesWithinWatermark keeps the first row
    # encountered, which depends on partition order) — assert group
    # cardinality, not identity.
    assert len(kept_ids) == 3
    assert len({k for k in kept_ids if k in (1, 2)}) == 1
    assert len({k for k in kept_ids if k in (3, 5)}) == 1
    assert 7 in kept_ids


def test_cms_sketch_stream_equals_batch(spark, tmp_path):
    """The streaming sketch (complete mode, two file micro-batches) must
    equal the batch sketch over the same rows cell-for-cell — the
    algebraic-merge property that makes CMS the streaming heavy-hitter
    fit (state = the sketch itself, bounded by depth*width, no
    watermark)."""
    from osmgraphing_spark.operators.heavyhitters import cms_sketch
    from osmgraphing_spark.streaming.windows import cms_sketch_stream

    in_dir = str(tmp_path / "cin")
    rows = [
        (i, f"tok{i % 7} tok{i % 3} shared tail words {i % 2}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # two separate files => at least two input splits for the stream
    df.where("doc_id < 30").coalesce(1).write.mode("overwrite").parquet(in_dir)
    df.where("doc_id >= 30").coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        cms_sketch_stream(stream, depth=3, width=128)
        .writeStream.format("memory")
        .queryName("cms_stream_tbl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_stream_tbl").collect()
    }
    exp = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_sketch(spark.read.parquet(in_dir), 3, 128).collect()
    }
    assert got == exp and len(got) > 0


def test_dedup_gate_incremental_admission(spark, tmp_path):
    """Two micro-batches: batch-1 survivors join the corpus that batch 2
    is gated against; within-batch dups collapse to one survivor."""
    import os

    from osmgraphing_spark.streaming.gate import run_dedup_gate

    base = "base text " + " ".join(f"w{i}" for i in range(12))
    other = "unrelated " + " ".join(f"q{i}" for i in range(12))
    third = "third thing " + " ".join(f"z{i}" for i in range(12))

    corpus_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, base), (1, other)], "doc_id long, text string"
    ).write.parquet(corpus_dir)

    import glob
    import shutil

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    fresh = "fresh words " + " ".join(f"y{i}" for i in range(12))
    waves = [
        # batch 1: corpus dup (10), brand-new (11), within-batch copy (12)
        [(10, base), (11, third), (12, third)],
        # batch 2: copy of batch-1 survivor (20) and genuinely new (21)
        [(20, third), (21, fresh)],
    ]
    for i, rows in enumerate(waves):
        # the file-stream source lists plain FILES (it does not descend
        # into nested parquet dirs) → scratch write, move the part up
        scratch = os.path.join(in_dir, f"_scratch{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"f{i}.parquet"))
        shutil.rmtree(scratch)

    out_dir = str(tmp_path / "out")
    run_dedup_gate(
        spark, in_dir, corpus_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    accepted = spark.read.parquet(os.path.join(out_dir, "accepted", "batch_id=*"))
    ids = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    # 10 dies vs corpus; exactly one of {11,12} survives; 20 dies vs the
    # batch-1 survivor; 21 passes
    assert 10 not in ids and 20 not in ids and 21 in ids
    assert len(ids & {11, 12}) == 1
    assert len(ids) == 2

    # retry safety: a second run with a fresh checkpoint re-sees both files
    # as batch 0 but the marker skips re-gating (output unchanged)
    run_dedup_gate(
        spark, in_dir, corpus_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    again = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out_dir, "accepted", "batch_id=*")
        ).select("doc_id").collect()
    }
    assert again == ids


def test_hll_sketch_stream_equals_batch(spark, tmp_path):
    """The streaming HLL registers (complete mode, two micro-batches) must
    equal the batch sketch cell-for-cell — max-merge is algebraic, so the
    incremental state IS the sketch."""
    from osmgraphing_spark.operators.cardinality import hll_sketch
    from osmgraphing_spark.streaming.windows import hll_sketch_stream

    in_dir = str(tmp_path / "hin")
    rows = [(i, f"user{i % 41}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, uid string")
    df.where("doc_id < 100").coalesce(1).write.mode("overwrite").parquet(in_dir)
    df.where("doc_id >= 100").coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, uid string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        hll_sketch_stream(stream, "uid", log2m=6)
        .writeStream.format("memory")
        .queryName("hll_stream_tbl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket"], r["reg"])
        for r in spark.sql("SELECT * FROM hll_stream_tbl").collect()
    }
    exp = {
        (r["bucket"], r["reg"])
        for r in hll_sketch(spark.read.parquet(in_dir), "uid", log2m=6).collect()
    }
    assert got == exp and len(got) > 0


def test_logreg_score_filters_stream(spark, tmp_path):
    """The quality classifier's scorer is a pure column expression, so a
    batch-trained model gates a STREAM with zero extra machinery; the
    streamed keep set must equal the batch filter's."""
    from osmgraphing_spark.operators import logreg

    in_dir = str(tmp_path / "qin")
    out_dir = str(tmp_path / "qout")
    ck_dir = str(tmp_path / "qck")
    rows = [
        (1, 0.9, 0.1), (2, 0.2, 0.8), (3, 0.8, 0.3),
        (4, 0.1, 0.9), (5, 0.7, 0.2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, x1 double, x2 double")
    train = df.withColumn("y", (F.col("x1") > F.col("x2")).cast("double"))
    w = logreg.train(train, ["x1", "x2"], "y", lr=2.0, iters=20)
    score = logreg.score(["x1", "x2"], w)

    batch_kept = sorted(
        r["doc_id"] for r in df.where(score >= 0.5).collect()
    )

    df.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, x1 double, x2 double").parquet(in_dir)
    q = (
        stream.where(score >= 0.5)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_kept = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert stream_kept == batch_kept and len(batch_kept) >= 2


def test_funnel_stream_matches_python_mirror(spark, tmp_path):
    """Finalized streaming funnel rows (first-touch attempt anchored at
    the user's earliest step-1 event, sequential chain within the window,
    emitted when the watermark passes t1 + W) must equal an exact python
    mirror of the batch semantics over the same log; exactly one row per
    finalized user."""
    from osmgraphing_spark.streaming.windows import funnel_stream

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "fn_stream")
    _write_event_halves(spark, src, in_dir)
    steps = ["view", "click", "purchase"]
    W = 5 * 24 * 3600  # 5 days

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    got = _run_available_now(
        spark, funnel_stream(stream, steps, W, "0 seconds"), "funnel_s"
    ).collect()
    assert len(got) > 0
    assert len({r["user_id"] for r in got}) == len(got)  # exactly once

    # python mirror over the full log
    rows = (
        spark.read.parquet(src)
        .where(F.col("event_type").isin(steps))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp() * 1e6), r["event_type"])
        )
    max_ts = max(t for evs in per_user.values() for t, _ in evs)
    w_us = W * 1_000_000
    expect = {}
    for uid, evs in per_user.items():
        s1 = [t for t, s in evs if s == steps[0]]
        if not s1:
            continue
        t1 = min(s1)
        if t1 + w_us >= max_ts:  # not finalized by the last watermark
            continue
        cur, done = t1, 1
        for name in steps[1:]:
            nxt = [t for t, s in evs if s == name and cur < t <= t1 + w_us]
            if not nxt:
                break
            cur = min(nxt)
            done += 1
        expect[uid] = (t1, done, done == len(steps))
    got_map = {
        r["user_id"]: (
            int(r["t1"].timestamp() * 1e6), r["steps_completed"], r["converted"]
        )
        for r in got
    }
    # every emitted row must match the mirror exactly
    for uid, v in got_map.items():
        assert uid in expect, f"user {uid} emitted but mirror says not final"
        assert v == expect[uid], (uid, v, expect[uid])
    # and every mirror-final user whose window closed strictly before the
    # LAST batch's watermark must have been emitted
    for uid, v in expect.items():
        assert uid in got_map, f"user {uid} final but not emitted"
