"""Streaming rolling z-score anomaly detection (SURVEY.md §2.10 ST7
extension; the batch twin is operators/timeseries.ts_rolling_zscore).

The batch lane's window — "the same user's previous ZSCORE_WIN values" —
is exactly a bounded per-key state, so the streaming form is ONE
``applyInPandasWithState`` op keyed by user: state carries the trailing
cents (<= ZSCORE_WIN longs, ~160 bytes/user — bounded by construction,
no timeout/eviction needed for correctness; a deployment that must
forget dead users adds a ProcessingTimeTimeout without touching the
decision logic).  Each arriving event is judged against the CURRENT
trailing window with the batch lane's integer decision rule
((x*n - s)^2 > Z2 * (n*ss - s^2) over exact cents — shared constants,
no float accumulation anywhere), then appended to the window.

Ordering contract (same as streaming/sessions.py): decisions are made in
event order WITHIN a micro-batch (sorted by ts, event_id) and in arrival
order across batches, so the emitted anomaly set equals the batch twin's
exactly when arrival order respects event order per key — pinned by
tests/test_stateful.py::test_streaming_zscore_equals_batch.  A
cross-batch late event is judged against the state as-of arrival (the
honest streaming semantics: an alert system cannot re-adjudicate the
past) — it degrades the baseline window for subsequent events only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import ZSCORE_MIN_N, ZSCORE_WIN, ZSCORE_Z2

OUTPUT_SCHEMA = "user_id long, event_id long, cents long, n long, dev long, var2 long"
STATE_SCHEMA = "vals array<long>"


def _zscore_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    batch = pd.concat(frames, ignore_index=True)
    ts_ns = batch["ts"].astype("int64").to_numpy()
    eids = batch["event_id"].to_numpy()
    cents = batch["cents"].to_numpy()
    order = sorted(range(len(batch)), key=lambda i: (ts_ns[i], eids[i]))

    vals: list[int] = list(state.get[0]) if state.exists else []
    out: list[tuple[int, int, int, int, int]] = []
    for i in order:
        c = int(cents[i])
        win = vals[-ZSCORE_WIN:]
        n, s = len(win), sum(win)
        if n >= ZSCORE_MIN_N:
            ss = sum(v * v for v in win)
            dev, var2 = c * n - s, n * ss - s * s
            if dev * dev > ZSCORE_Z2 * var2:
                out.append((int(eids[i]), c, n, dev, var2))
        vals.append(c)
    state.update((vals[-ZSCORE_WIN:],))
    if out:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": [o[0] for o in out],
                "cents": [o[1] for o in out],
                "n": [o[2] for o in out],
                "dev": [o[3] for o in out],
                "var2": [o[4] for o in out],
            }
        )


def streaming_zscore(events: DataFrame) -> DataFrame:
    """Anomalous events (batch twin's integer rule) over a streaming
    (user_id, ts, event_id, value) frame — one stateful op, append mode."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        events.select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            cents.alias("cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _zscore_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
