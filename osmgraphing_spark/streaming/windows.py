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
    """→ streaming frame of CLOSED sessions ``(user_id, session_start,
    session_end, n_events)``; one row per session, exactly once.

    State machine per user: fold the batch's events (sorted by event time)
    into the open session; an event more than ``gap_s`` after the open
    session's last event closes it (data-driven). The open session arms an
    event-time timeout at ``last_ts + gap_s``; when the watermark passes it
    with no new data, the timeout invocation closes the session."""
    gap_us = gap_s * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long"
    )
    state_schema = "start_us long, last_us long, n long"

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((uid, start_us, last_us, n))
            state.remove()
        else:
            parts = [p for p in pdfs if len(p)]
            cur = list(state.get) if state.exists else None
            if parts:
                ts_us = (
                    pd.concat(parts, ignore_index=True)["ts"]
                    .astype("int64")
                    .sort_values()
                    .to_numpy()
                    // 1000
                )
                for t in ts_us:
                    t = int(t)
                    if cur is None:
                        cur = [t, t, 1]
                    elif t - cur[1] > gap_us:
                        closed.append((uid, cur[0], cur[1], cur[2]))
                        cur = [t, t, 1]
                    else:
                        cur[1] = max(cur[1], t)
                        cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # event-time timeout must be ahead of the current watermark
                # (a session already stale relative to OTHER users' events
                # would otherwise arm a timeout in the past, which Spark
                # rejects); clamping forward only delays the close to the
                # next micro-batch, it never double-emits or drops.
                timeout_ms = max(
                    (cur[1] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
                )
                state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
                "session_start": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
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
