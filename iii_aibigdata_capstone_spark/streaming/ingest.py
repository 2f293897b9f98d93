"""Streaming incremental-ingest admission — the dedup half of the r9
serving pattern (streaming/serving.py): a PREBUILT, fully-checkpointed
dedup index (IngestIndex: content hashes + banded-minhash LSH bands +
shingle table) admits each micro-batch of arriving documents through the
SAME ``ingest_admit`` dataflow the batch ``x1_minhash_ingest`` lane runs —
one spelling, so stream and batch cannot drift.

Contract (pinned by tests/test_streaming.py::
test_streaming_minhash_ingest_equals_batch): the union of per-micro-batch
admissions over any arrival split equals the batch lane's admitted set,
because BOTH lanes test arrivals against the FIXED resident index only —
batch-vs-batch (and arrival-vs-arrival) pairs are out of contract in both.
An ingest that must also dedup arrivals against each other composes this
with the stateful cross-batch lane (streaming/neardup.py), which holds
exactly that state. Index evolution = rebuild, like RagIndex. Arrival
doc_ids must be unique per batch and disjoint from resident index ids —
see the ID-NAMESPACE CONTRACT on ``ingest_admit`` (a collision merges two
documents' shingle sets in the verify and silently corrupts Jaccard).

This is the stream-static join shape at 100 TB: the index members are
bounded artifacts (hashes, N_MINHASH_BANDS rows/doc, shingles) readable
from a warm store; per batch the probe cost is O(batch x bands) rows
against the hash-partitioned band index, and NO corpus parquet is
re-scanned per micro-batch (every IngestIndex member is checkpointed —
asserted by tests/test_plans.py::
test_streaming_ingest_micro_batch_plan_rescans_no_parquet).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.dedup import IngestIndex, ingest_admit

__all__ = ["streaming_minhash_ingest"]


def streaming_minhash_ingest(
    index: IngestIndex,
    docs_stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """Start an availableNow admission query: each micro-batch of
    ``(doc_id, lang, text, n_chars)`` rows is admitted via the shared
    ``ingest_admit`` and the admitted frame handed to
    ``emit(admitted_df, batch_id)``. Returns the StreamingQuery (caller
    awaits/stops). A batch whose docs are ALL rejected emits an empty
    frame (emit still runs — absence of rows, not absence of the call,
    signals total rejection)."""
    return (
        docs_stream.writeStream.foreachBatch(
            lambda df, bid: emit(ingest_admit(index, df), bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
