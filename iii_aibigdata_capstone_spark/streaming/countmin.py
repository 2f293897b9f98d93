"""Streaming Count-Min sketch maintenance (SURVEY.md §2.10 ST7 extension;
the batch twin is operators/analytics.x5_countmin_terms) — the third
sketch-state pattern in the streaming family: HLL registers merge by MAX
(streaming/windowed_hll), trailing windows ride bounded lists
(streaming/zscore, streaming/ewma), and Count-Min counters merge by PLAIN
ADDITION — the property that makes frequency sketches order-insensitive
and restart-safe: any arrival order, any micro-batch chunking, and any
partial-merge tree give BIT-IDENTICAL counters.

Shape: term explosion and (row, counter) hashing are STATELESS (the
engine-neutral md5 of "r:term" — the batch lane's exact spelling); the
one stateful op is keyed by sketch row r (CMS_D keys), whose state is the
full {CMS_W}-counter BIGINT array (~8 KB/row, fixed — never grows with
the vocabulary, which is the whole point of sketching the stream instead
of counting it). Each micro-batch pre-sums its contributions per counter
in pandas (one vectorized groupby, not per-row state calls) and emits the
row's UPDATED counter array, so the latest emission per row is always the
sketch-so-far; downstream consumers (top-k probes, point estimates) read
counters, never the stream.

tests/test_stateful.py pins: final counters == a transparent python
replay of the batch hashing over the same documents (exact integers),
equality under different chunkings, and the count-min one-sidedness of
estimates derived from the emitted counters.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.analytics import CMS_D, CMS_W, cms_hash_col

OUTPUT_SCHEMA = "r long, counters array<long>"
STATE_SCHEMA = "counters array<long>"


def _cms_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    r = int(key[0])
    counters: list[int] = (
        list(state.get[0]) if state.exists else [0] * CMS_W
    )
    touched = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        touched = True
        # one vectorized per-batch pre-sum — counters merge by addition,
        # so batch-local aggregation order is immaterial
        for c, add in pdf.groupby("c").size().items():
            counters[int(c)] += int(add)
    if not touched:
        return
    state.update((counters,))
    yield pd.DataFrame({"r": [r], "counters": [counters]})


def streaming_countmin(docs: DataFrame) -> DataFrame:
    """CMS_D x CMS_W Count-Min counters over a streaming (doc_id, text)
    frame — one stateful op keyed by sketch row; emits each row's updated
    counter array per micro-batch (latest emission = sketch-so-far)."""
    spark = docs.sparkSession
    rs = F.broadcast(
        spark.range(CMS_D).select(F.col("id").cast("long").alias("r"))
    )
    terms = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    c = cms_hash_col(F.col("r"), F.col("term"))
    return (
        terms.crossJoin(rs)  # stream-static: 4 static rows per term
        .select("r", c.alias("c"))
        .groupBy("r")
        .applyInPandasWithState(
            _cms_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
