"""Streaming sessionization with event-time state timeouts (SURVEY.md
§2.10 ST-class extension; the batch twin is analytics.x9_sessionize's
gaps-and-islands formulation).

Native ``session_window`` covers windowed session AGGREGATES; this module
is the CUSTOM-state form a pipeline needs when a session must carry
arbitrary state (running features, last-N events) and emit exactly one
row per closed session: ``applyInPandasWithState`` keyed by user with
``GroupStateTimeout.EventTimeTimeout``.

Mechanics per micro-batch and user:
- arriving rows (sorted by event time, event_id tiebreak) extend the open
  session while gaps stay within ``SESSION_GAP_US``; a larger gap CLOSES
  the open session (one output row) and starts a new one;
- the open session is kept in state with its timeout set to
  ``last_event + gap`` — when the WATERMARK passes that point no future
  row can extend the session (any later event would start a new one), so
  the timeout callback emits it and clears state. That is the eviction
  contract batch sessionization gets for free by seeing all data: state
  is bounded by ACTIVE sessions, not by users ever seen.

Session content (start, end, n_events) matches the batch gaps-and-islands
sessions exactly WHEN events arrive in event-time order per key; only
emission TIME differs (a session emits when its gap elapses past the
watermark, not when the job ends) — pinned by
tests/test_stateful.py::test_streaming_sessions_equal_batch.

Late-data policy (cross-batch out-of-order, admitted up to the
watermark): an event at or before the open session's end joins that
session — it is counted and may WIDEN the start, but never regresses the
session end (the end is the event-time timeout anchor; moving it
backwards could evict the session prematurely or produce end < start).
A late event can therefore merge into the open session where the batch
twin, seeing it in order, might have split two sessions — the standard
streaming trade: exact equality holds for in-order keys, late events
degrade to a principled merge rather than corrupt state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = "user_id long, session_start_us long, session_end_us long, n_events long"
STATE_SCHEMA = "start_us long, last_us long, n_events long"


def _session_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])

    def row(start: int, last: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_us": [start],
                "session_end_us": [last],
                "n_events": [n],
            }
        )

    if state.hasTimedOut:
        # watermark passed last_event + gap: nothing can extend this
        # session anymore — emit and evict
        start, last, n = state.get
        state.remove()
        yield row(start, last, n)
        return

    frames = [p for p in pdfs if len(p)]
    if not frames:
        # engine handed an empty group (state exists, no surviving rows):
        # re-arm the existing timeout and leave state untouched
        if state.exists:
            _, last, _ = state.get
            state.setTimeoutTimestamp(
                max((last + SESSION_GAP_US) // 1_000, state.getCurrentWatermarkMs() + 1)
            )
        return
    batch = pd.concat(frames, ignore_index=True)
    ts_us = (batch["ts"].astype("int64") // 1_000).to_numpy()  # ns -> us
    order = sorted(range(len(batch)), key=lambda i: (ts_us[i], batch["event_id"].iloc[i]))

    start = last = n = None
    if state.exists:
        start, last, n = state.get
    for i in order:
        t = int(ts_us[i])
        if start is None:
            start, last, n = t, t, 1
        elif t <= last:
            # cross-batch late arrival (in-batch rows are sorted, so this
            # only happens against restored state): joins the open
            # session — count it, widen the start if needed, never move
            # the end (= the timeout anchor) backwards
            start, n = min(start, t), n + 1
        elif t - last > SESSION_GAP_US:
            yield row(start, last, n)
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    # the timeout must sit strictly past the current watermark or the
    # engine rejects it; a session whose gap already elapsed then fires
    # on the next watermark advance (content unchanged, timing later)
    timeout_ms = max((last + SESSION_GAP_US) // 1_000, state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(timeout_ms)


def streaming_sessions(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """One row per CLOSED session over a (user_id, ts, event_id) stream.
    Open sessions stay in state until the watermark passes their gap."""
    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
