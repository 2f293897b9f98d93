"""Streaming RAG serving — the serving half of the retrieval product
(SURVEY.md §2 J1 stream-static lookup join, composed with the X3/X4
retrieval stages): the RagIndex (chunk-BM25 postings + IVF cell table +
serving dimension, operators/curation.py) is built ONCE per corpus, and
micro-batches of incoming queries are served against it through the SAME
``rag_serve`` dataflow the batch ``x9_rag_pipeline`` lane runs — one
spelling of the retrieval DAG, two arrival modes.

Shape: per micro-batch the query frame is tokenized with the SHARED
doc_chunks geometry (``rag_query_terms``) and its ids resolve embeddings
from the index's IVF table (the encoder seam — no encoder ships in this
container, so query vectors are id-resolved exactly like the multimodal
decode stubs). Everything corpus-sized stays on the static side as
checkpointed RDDs: serving N micro-batches re-reads the index N times but
re-SCANS parquet zero times, and every per-batch exchange is bounded by
the query batch (the stream-static contract that holds at 100 TB, where
the index is bucketed storage and the query stream is Kafka).

This is a foreachBatch composition (retrieval needs per-query
aggregations + windows, which availableNow micro-batches express exactly
when a query's rows are contained in one batch — guaranteed here because
each input row IS one whole query); the stateful-operator family lives in
the sibling modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.curation import RagIndex, rag_query_terms, rag_serve
from ..operators.similarity import IvfPqIndex, ivf_pq_serve

__all__ = [
    "serve_ann_batch",
    "serve_query_batch",
    "streaming_ann_serving",
    "streaming_rag_serving",
]


def serve_query_batch(index: RagIndex, queries: DataFrame) -> DataFrame:
    """Serve one ``(query_id, text)`` frame against the prebuilt index —
    the body foreachBatch runs per micro-batch, and exactly what the
    batch lane runs for corpus-resident probes. Query ids share the
    doc-id namespace (see rag_serve): an id colliding with a corpus doc
    shadows that doc out of its own results, so external query streams
    must allocate ids outside the corpus range.

    A query with NO lane coverage — every term out of vocabulary AND no
    embedding resolves for its id — is ABSENT from the output entirely
    (both retrieval lanes empty => nothing survives the rank union), so
    downstream consumers cannot tell "served, zero results" from
    "dropped" by looking at this frame alone. A consumer that needs
    explicit zero-result rows should left-join the result back to the
    batch's query_id set and treat null ranks as served-empty."""
    qids = queries.select("query_id").distinct()
    return rag_serve(index, qids, rag_query_terms(queries))


def streaming_rag_serving(
    index: RagIndex,
    queries_stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """Start an availableNow serving query: each micro-batch of
    ``(query_id, text)`` rows is served via ``serve_query_batch`` and the
    result frame handed to ``emit(result_df, batch_id)``. Returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        queries_stream.writeStream.foreachBatch(
            lambda df, bid: emit(serve_query_batch(index, df), bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def serve_ann_batch(index: IvfPqIndex, qids: DataFrame) -> DataFrame:
    """Serve one ``(query_id)`` frame of probe ids against the prebuilt
    IVF-PQ index — the body foreachBatch runs per micro-batch, and
    exactly what the batch ``x3_ivf_pq_topk`` lane runs for resident
    probes (``ivf_pq_serve``: probe cells, distance tables and the
    re-rank vectors all resolve from the index's checkpointed members —
    the id-resolution encoder seam the RAG twin documents). A probe id
    absent from the index (no vector to resolve) is ABSENT from the
    output, the serve_query_batch served-empty contract."""
    return ivf_pq_serve(index, qids.select("query_id").distinct())


def streaming_ann_serving(
    index: IvfPqIndex,
    qids_stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """Start an availableNow ANN serving query: each micro-batch of
    ``(query_id)`` rows is served via ``serve_ann_batch`` and the result
    frame handed to ``emit(result_df, batch_id)``. Returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        qids_stream.writeStream.foreachBatch(
            lambda df, bid: emit(serve_ann_batch(index, df), bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
