"""Streaming windowed aggregation + custom stateful sessionization.

Two Structured-Streaming operators over the events stream shape
``(event_id long, ts timestamp, user_id long, event_type string,
value double, props string)``:

- :func:`windowed_event_stats` — tumbling event-time windows with a
  watermark, so late data is folded in until the watermark passes the
  window end and state is then dropped (bounded state at 100 TB/day
  event rates; without the watermark a long-running stream accretes
  every window ever seen).
- :func:`sessionize_stream` — gap-based sessions as a CUSTOM stateful
  operator (``applyInPandasWithState``): semantics identical to the batch
  ``q_sessionize_events`` (a gap > ``gap_s`` starts a new session), but
  incremental — per-user open-session state lives in the state store,
  sessions close either data-driven (a later event arrives past the gap)
  or by event-time TIMEOUT when the watermark passes ``last_ts + gap``
  (so an idle user's final session is still emitted, exactly once).

Scale notes:
- state per user is one (start_us, last_us, n) triple — 24 B + key; 10⁹
  users ≈ 32 GB across the cluster's state stores, fine with RocksDB.
- the stateful function receives Arrow batches per user GROUP, never
  per-row Python; groups are processed independently so hub users don't
  serialize the rest of a partition.
- late data older than the watermark is dropped by Spark before the
  operator runs — the correctness contract is "exact for data within the
  watermark", the same contract the windowed aggregate gives.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window per-type event stats (streaming analog
    of the batch ``q_hourly_events``). Append-mode-safe: a window row is
    emitted once, when the watermark passes its end."""
    # event-time columns must be TIMESTAMP (ltz) — parquet sources often
    # carry TIMESTAMP_NTZ, which watermarks reject
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap_s: int = SESSION_GAP_S, watermark: str = "0 seconds"
) -> DataFrame:
    """→ streaming frame of FINAL sessions ``(user_id, session_start,
    session_end, n_events)``; one row per session, exactly once.

    State per user: ALL sessions still mutable under the watermark, as
    parallel (starts, lasts, counts) arrays sorted by start. Each incoming
    event is inserted as a [t, t, 1] interval and neighbouring intervals
    within ``gap_s`` merge — so an in-watermark LATE event correctly starts
    its own earlier session, extends a session's start backward, or bridges
    two sessions into one (a single open-session scalar cannot express any
    of those; that was the round-2 review finding).

    Emission is purely WATERMARK-driven: a session is emitted exactly when
    ``last + gap < watermark`` — from then on no admissible event (all have
    ``t ≥ watermark``) can join or merge it, so it is provably final.
    Closing on data-driven gaps alone would be premature under late data.
    The event-time timeout is armed at the earliest retained session's
    ``last + gap`` so idle users' sessions still finalize without new data.

    State size: one (long, long, long) triple per mutable session — bounded
    by the watermark horizon / gap, not by history."""
    gap_us = gap_s * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long"
    )
    state_schema = "starts array<long>, lasts array<long>, ns array<long>"

    def _merge(sessions: list[list[int]], t: int) -> None:
        """Insert event time t into the sorted interval list, then merge
        neighbours within gap (one insert touches at most two intervals)."""
        import bisect

        i = bisect.bisect_left([s[0] for s in sessions], t)
        sessions.insert(i, [t, t, 1])
        # merge with right neighbour(s), then left — intervals are disjoint
        # by > gap beforehand, so at most one merge on each side
        while i + 1 < len(sessions) and sessions[i + 1][0] - sessions[i][1] <= gap_us:
            nxt = sessions.pop(i + 1)
            sessions[i] = [
                min(sessions[i][0], nxt[0]),
                max(sessions[i][1], nxt[1]),
                sessions[i][2] + nxt[2],
            ]
        while i > 0 and sessions[i][0] - sessions[i - 1][1] <= gap_us:
            prev = sessions.pop(i - 1)
            i -= 1
            sessions[i] = [
                min(prev[0], sessions[i][0]),
                max(prev[1], sessions[i][1]),
                prev[2] + sessions[i][2],
            ]

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns)]
        else:
            sessions = []
        if not state.hasTimedOut:
            parts = [p for p in pdfs if len(p)]
            if parts:
                ts_us = (
                    pd.concat(parts, ignore_index=True)["ts"]
                    .astype("int64")
                    .sort_values()
                    .to_numpy()
                    // 1000
                )
                for t in ts_us:
                    _merge(sessions, int(t))
        else:
            list(pdfs)  # exhaust the (empty) iterator per the API contract

        wm_us = state.getCurrentWatermarkMs() * 1000
        final = [s for s in sessions if s[1] + gap_us < wm_us]
        keep = [s for s in sessions if s[1] + gap_us >= wm_us]
        if keep:
            state.update(
                ([s[0] for s in keep], [s[1] for s in keep], [s[2] for s in keep])
            )
            # earliest possible finalization; clamp ahead of the watermark
            # (Spark rejects past-time timeouts) — clamping only delays the
            # emit to the next batch, never drops or duplicates
            timeout_ms = max(
                min(s[1] for s in keep) // 1000 + gap_s * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([uid] * len(final), dtype="int64"),
                "session_start": pd.to_datetime([s[0] for s in final], unit="us"),
                "session_end": pd.to_datetime([s[1] for s in final], unit="us"),
                "n_events": pd.Series([s[2] for s in final], dtype="int64"),
            }
        )

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def cms_sketch_stream(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming count-min sketch of the document stream's n-gram counts —
    running heavy-hitter counts over an unbounded corpus stream with
    FIXED state: the aggregation state is the sketch itself (≤ depth·width
    counters), bounded by geometry rather than by a watermark, so no state
    ever needs expiring and ``outputMode("complete")`` is cheap (the
    result table is the ≤ depth·width-row sketch). Delegates to the batch
    ``operators.heavyhitters.cms_sketch`` — the operator is a stateless
    explode + one algebraic groupBy, so the SAME code runs in both modes
    and the stream's final sketch equals the batch sketch over the same
    rows exactly (pinned by test). Query estimates / heavy-hitter cuts run
    on the sink with ``heavyhitters.cms_estimate``."""
    from ..operators.heavyhitters import cms_sketch

    return cms_sketch(docs, depth, width, n, id_col, text_col)


def dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: keep ONE arrival of each content digest
    within the watermark horizon (`dropDuplicatesWithinWatermark`, the
    Spark-native bounded-state dedup). The digest — not the content —
    is the dedup key, so state per document is 16 B + timestamp however
    large the document; state for a digest is dropped once the watermark
    passes its arrival + horizon.

    Contract (matches the batch `drop_exact_duplicates` up to survivor
    identity): exactly one survivor per digest group within a horizon —
    WHICH row survives is the first encountered, which across partitions
    of one micro-batch is arbitrary (same as the batch min-id choice
    being a convention, not a semantic). A re-arrival AFTER the horizon
    starts a fresh survivor — the price of bounded state, and the
    standard contract for streaming dedup at 100 TB/day
    (unbounded-horizon dedup would accrete one state row per distinct
    document forever; run the batch `drop_exact_duplicates` over the
    sink for a global sweep)."""
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "digest", F.md5(F.col(text_col))
    )
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def hll_sketch_stream(
    docs: DataFrame,
    col: str,
    log2m: int = 9,
    by: list[str] | None = None,
    salt: str = "hll:",
) -> DataFrame:
    """Streaming HyperLogLog: running approx-distinct over an unbounded
    stream with FIXED state — the aggregation state is the register table
    itself (≤ m rows per group; register merge = max is algebraic), so
    like ``cms_sketch_stream`` there is nothing to expire and
    ``outputMode("complete")`` emits the ≤ m-row sketch. Delegates to the
    batch ``operators.cardinality.hll_sketch`` — the same code runs in
    both modes and the stream's final registers equal the batch sketch
    over the same rows exactly (pinned by test). Estimate on the sink
    with ``cardinality.hll_estimate`` (or persist the registers and merge
    across days — the union property holds across any shard axis)."""
    from ..operators.cardinality import hll_sketch

    return hll_sketch(docs, col, log2m, by, salt)


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    window_s: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming first-touch conversion funnel → one FINAL row per user
    ``(user_id, t1 timestamp, steps_completed int, converted boolean)``,
    exactly once: the user's funnel attempt anchors at their earliest
    step-1 event (t1) and must complete within ``window_s``; progression
    uses the batch ``operators.funnel.conversion_funnel`` semantics
    (step k strictly after step k−1's chosen time, all within
    [t1, t1 + W]).

    Late-data correctness inside the watermark: a late step-1 event can
    LOWER t1 (re-anchoring the window), and a late mid-step event can
    re-enter the sequential-min chain — so state keeps, per later step,
    every event time still inside the mutable window, and the chain is
    recomputed at FINALIZATION, which happens exactly when the watermark
    passes t1 + W (from then on no admissible event can change t1 or
    join the window; provably final). Idle users finalize through an
    event-time timeout armed at t1 + W.

    State bound: t1 is a scalar (only the min matters for first-touch);
    step-i lists are pruned to the live window [watermark horizon,
    t1 + W] — bounded by the user's event rate × (window + allowed
    lateness), never by history."""
    k = len(steps)
    if k < 2:
        raise ValueError("funnel_stream needs >= 2 steps")
    w_us = window_s * 1_000_000
    out_schema = (
        "user_id long, t1 timestamp, steps_completed int, converted boolean"
    )
    state_schema = "t1 long, " + ", ".join(
        f"s{i} array<long>" for i in range(1, k)
    )
    step_idx = {name: i for i, name in enumerate(steps)}

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.exists:
            got = state.get
            t1 = int(got[0])
            lists = [sorted(got[i]) for i in range(1, k)]
        else:
            t1 = -1
            lists = [[] for _ in range(1, k)]
        if not state.hasTimedOut:
            parts = [p for p in pdfs if len(p)]
            if parts:
                pdf = pd.concat(parts, ignore_index=True)
                ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
                for t, s in zip(ts_us, pdf["event_type"]):
                    i = step_idx.get(s)
                    if i is None:
                        continue
                    if i == 0:
                        t1 = int(t) if t1 < 0 else min(t1, int(t))
                    else:
                        lists[i - 1].append(int(t))
        else:
            list(pdfs)

        wm_us = state.getCurrentWatermarkMs() * 1000
        # prune dead events: beyond the (shrink-only) window end, or —
        # when no attempt exists yet — below the watermark (a future t1
        # is >= wm, so nothing below wm can ever fall in its window)
        hi = (t1 + w_us) if t1 >= 0 else None
        lo = wm_us if t1 < 0 else None
        lists = [
            sorted(
                t for t in l
                if (hi is None or t <= hi) and (lo is None or t >= lo)
            )
            for l in lists
        ]

        if t1 >= 0 and t1 + w_us < wm_us:
            # FINAL: recompute the sequential chain inside the window
            cur = t1
            done = 1
            for l in lists:
                nxt = [t for t in l if cur < t <= t1 + w_us]
                if not nxt:
                    break
                cur = min(nxt)
                done += 1
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([uid], dtype="int64"),
                    "t1": pd.to_datetime([t1], unit="us"),
                    "steps_completed": pd.Series([done], dtype="int32"),
                    "converted": pd.Series([done == k], dtype="bool"),
                }
            )
            return
        if t1 >= 0 or any(lists):
            state.update((t1, *lists))
            if t1 >= 0:
                state.setTimeoutTimestamp(
                    max(
                        (t1 + w_us) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "t1": pd.to_datetime([], unit="us"),
                "steps_completed": pd.Series([], dtype="int32"),
                "converted": pd.Series([], dtype="bool"),
            }
        )

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.where(F.col("event_type").isin(list(steps)))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
