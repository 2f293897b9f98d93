"""Streaming EWMA (SURVEY.md §2.10 ST7 extension; the batch twin is
operators/timeseries.ts_ewma) — closes the batch/streaming symmetry the
z-score pair started: same constants, same exact-integer arithmetic, same
one-float-tree output.

The batch lane's K-lag dyadic EWMA is a weighted mean over the trailing
{EWMA_K} observations with exact power-of-two integer weights, so the
streaming form is ONE ``applyInPandasWithState`` op keyed by user whose
state is just the trailing <= EWMA_K - 1 cents (~120 bytes/user, bounded
by construction — no timeout needed for correctness; a deployment that
must forget dead users adds a ProcessingTimeTimeout without touching the
math).  Each arriving event emits num = sum(2^(K-1-k) * c_k) and
den = sum of weights present as exact BIGINTs — identical VALUES to the
batch window LAG reassembly — plus the same fixed IEEE tree
``num / den / 100`` double (two correctly-rounded divisions over
identical integers: bit-equal cross-twin, the x5_hll recipe).

Ordering contract: events are processed in event_id order within a
micro-batch — the EXACT key of the batch twin's window frame (ORDER BY
user_id, event_id; event ids are unique and time-ordered per user in
this schema) — and in arrival order across batches, so the emitted rows
equal the batch twin exactly when per-key arrival respects event order —
pinned by
tests/test_stateful.py::test_streaming_ewma_equals_batch under chunked
arrival.  A cross-batch late event is smoothed against the state as-of
arrival (honest streaming semantics; it perturbs subsequent smoothing
only).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import EWMA_K, EWMA_WEIGHTS

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ewma_num long, ewma_den long, ewma double"
)
STATE_SCHEMA = "vals array<long>"


def ewma_fold(
    vals: list[int], eids, cents
) -> tuple[list[tuple[int, int, int, float]], list[int]]:
    """The EWMA state fold — sort the micro-batch by event_id (the batch
    twin's window frame is ORDER BY user_id, event_id; event_id alone is
    total within a user), emit the exact num/den ints plus the batch
    lane's IEEE tree per row, and return the trimmed trailing-cents
    state. ONE spelling shared by the v1 kernel and the state-schema
    upgrade test's v2 kernel (the apply_spacesaving discipline)."""
    order = sorted(range(len(eids)), key=lambda i: int(eids[i]))
    vals = list(vals)
    out: list[tuple[int, int, int, float]] = []
    for i in order:
        c = int(cents[i])
        num, den = EWMA_WEIGHTS[0] * c, EWMA_WEIGHTS[0]
        for k in range(1, min(EWMA_K, len(vals) + 1)):
            num += EWMA_WEIGHTS[k] * vals[-k]
            den += EWMA_WEIGHTS[k]
        # the batch twin's exact output tree: int/int/100, two IEEE divides
        out.append((int(eids[i]), num, den, float(num) / float(den) / 100.0))
        vals.append(c)
    return out, vals[-(EWMA_K - 1) :]


def _ewma_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    batch = pd.concat(frames, ignore_index=True)
    # state = previous cents, newest LAST (so vals[-k] is lag k)
    vals: list[int] = list(state.get[0]) if state.exists else []
    out, new_vals = ewma_fold(
        vals, batch["event_id"].to_numpy(), batch["cents"].to_numpy()
    )
    state.update((new_vals,))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": [o[0] for o in out],
            "ewma_num": [o[1] for o in out],
            "ewma_den": [o[2] for o in out],
            "ewma": [o[3] for o in out],
        }
    )


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Dyadic EWMA rows (batch twin's exact integers + float tree) over a
    streaming (user_id, ts, event_id, value) frame — one stateful op,
    append mode."""
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
            _ewma_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
