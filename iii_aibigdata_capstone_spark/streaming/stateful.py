"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 ST5 extension — the reference's streams are stateless
map+lookup; a 100 TB training-data pipeline needs cross-batch state).

Two operators, both keyed and watermark-free (NoTimeout):

- ``first_seen_dedup``: streaming exact dedup (X1's streaming form) — emit a
  key's FIRST occurrence only, across micro-batches; state = one counter per
  key. This is the dedup an ingest firehose needs: downstream sees each
  (user, event_type) once, no matter how many batches repeat it.
- ``running_totals``: per-key running count/sum emitted every batch the key
  appears in (update-mode telemetry rollup).

State is per-key and constant-size, so the state store scales with distinct
keys, not events; at cluster scale RocksDB state store + checkpointing give
fault-tolerant exactly-once state updates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = "user_id long, event_type string, first_value double, n_in_batch long"
FIRST_SEEN_STATE = "n_seen long"

RUNNING_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_STATE = "n long, total double"


def _first_seen_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    first_value = None
    for pdf in pdfs:
        if len(pdf) and first_value is None:
            first_value = float(pdf["value"].iloc[0])
        n += len(pdf)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return  # key already emitted in an earlier batch
    state.update((n,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "first_value": [first_value],
            "n_in_batch": [n],
        }
    )


def first_seen_dedup(events: DataFrame) -> DataFrame:
    """Streaming first-occurrence dedup on (user_id, event_type)."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _running_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        total += float(pdf["value"].sum())
    n += batch_n
    state.update((n, total))
    if batch_n:
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) — emits the updated total each
    batch the user appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
