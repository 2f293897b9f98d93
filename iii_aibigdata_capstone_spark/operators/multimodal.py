"""Multimodal (binary) columns (SURVEY.md §2.12 X6, reference §2.8 K1-K11).

The reference streams raw JPEG bytes through Kafka with a custom decoder
(pi/dl_k_to_ss.py:429, 359-362) and runs numpy/cv2 kernels per record. The
Spark-native shape: payloads are ``BinaryType`` columns with typed metadata
alongside; kernels are Arrow-batched pandas functions over ``mapInPandas``.

The image/audio codec libraries are not in this container, so the actual
decode (cv2.imdecode — K1) is STUBBED: ``decode_image_stub`` derives a
deterministic fake pixel payload from the content hash. Everything Spark
owns — the binary column, the schema contract, Arrow batching, partition
sizing for fat rows — is real and tested; swapping the stub for cv2 is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from textwrap import dedent

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..decoders import image_decoder
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


def decode_image_stub(payload: bytes) -> tuple[int, int, list[int]]:
    """K1 decode (pi/dl_k_to_ss.py:359-362), via the decoder seam
    (``decoders.image_decoder`` — sha256-stub by default; a real
    deployment registers cv2.imdecode and nothing in the query lane
    changes). Name kept from r01 for test/back-compat."""
    return image_decoder()(payload)


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with the text payload materialized as a binary column +
    typed metadata — the multimodal table shape (payload never parsed by
    Catalyst, metadata fully prunable/filterable)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


@query(
    "x6_binary_meta",
    oracle=dedent(
        """
        SELECT doc_id,
               OCTET_LENGTH(ENCODE(text)) AS payload_bytes,
               SHA256(text) AS payload_sha256,
               lang
        FROM documents
        """
    ),
    tags=("X6",),
)
def x6_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction — size and content digest computed
    JVM-side on the ``BinaryType`` payload (no decode, no Python). This is
    the integrity/manifest pass of a multimodal corpus."""
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length(F.col("payload")).cast("long").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.lang").alias("lang"),
    )


@query(
    "x6_decode_features",
    oracle=dedent(
        """
        WITH px AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT)) AS p
            FROM documents
        )
        SELECT doc_id, 8 AS width, 8 AS height,
               LIST_SUM(p) / 32.0 AS mean_pixel,
               CAST(LIST_MAX(p) AS INT) AS max_pixel
        FROM px
        """
    ),
    tags=("X6", "udf"),
)
def x6_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``
    (Arrow-batched; batch size capped by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so fat rows fit in
    memory — SURVEY.md §7's inverted-tuning risk).

    Oracle-checked against the DEFAULT (stub) decoder: the oracle
    re-derives the sha256 fake pixels hex-pair by hex-pair in SQL (the
    stub's 64-entry list is the 32-byte digest doubled, so its mean equals
    the 32-byte mean). The mean is emitted UNROUNDED — the
    integer-sum / 32 double is exact in both engines, while round-at-4 sat
    on banker's-vs-half-away tie boundaries (k/32 ends in an exact 5 at
    the 5th decimal for odd k)."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    decode = image_decoder()  # seam: resolved on the driver, shipped in the closure

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mean_pixel": [sum(d[2]) / len(d[2]) for d in dims],
                    "max_pixel": [max(d[2]) for d in dims],
                }
            )

    schema = "doc_id long, width int, height int, mean_pixel double, max_pixel int"
    return b.mapInPandas(decode_batch, schema=schema)


@query(
    "x6_frame_sample",
    oracle=dedent(
        """
        SELECT doc_id, CAST(idx AS INT) AS frame_idx,
               MD5(SUBSTR(text, CAST(idx * 32 + 1 AS INT), 32)) AS frame_md5
        FROM (
            SELECT doc_id, text,
                   UNNEST(RANGE(0, GREATEST(1, LEN(text) // 32), 4)) AS idx
            FROM documents
        )
        """
    ),
    tags=("X6", "udf"),
)
def x6_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: each payload is
    treated as a container of fixed-size 'frames'; emit every 4th frame's
    digest (one row per sampled frame — table-generating, like K8 patch
    cropping). Oracle-checked: the corpus is pure ASCII (asserted: LEN ==
    OCTET_LENGTH for every doc), so SQL character slicing reproduces the
    kernel's byte slicing exactly and DuckDB's MD5 digests the same
    frames."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_size, stride = 32, 4
        for pdf in batches:
            out_doc, out_idx, out_digest = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // frame_size)
                for idx in range(0, n_frames, stride):
                    frame = raw[idx * frame_size:(idx + 1) * frame_size]
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_digest.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_digest}
            )

    return b.repartition(max(spark.sparkContext.defaultParallelism, 8)).mapInPandas(
        sample_frames, schema="doc_id long, frame_idx int, frame_md5 string"
    )


@query(
    "x6_audio_energy",
    oracle=dedent(
        """
        SELECT doc_id, CAST(w AS INT) AS win_idx,
               CAST(LIST_SUM(LIST_TRANSFORM(
                        LIST_TRANSFORM(RANGE(1, 65),
                                       i -> ASCII(SUBSTR(text, CAST(w * 64 + i AS INT), 1))),
                        c -> c * c)) AS BIGINT) AS energy,
               CAST(LIST_MAX(LIST_TRANSFORM(RANGE(1, 65),
                        i -> ASCII(SUBSTR(text, CAST(w * 64 + i AS INT), 1)))) AS INT) AS peak,
               LIST_SUM(LIST_TRANSFORM(
                        LIST_TRANSFORM(RANGE(1, 65),
                                       i -> ASCII(SUBSTR(text, CAST(w * 64 + i AS INT), 1))),
                        c -> c * c)) < 400000 AS silent
        FROM documents, UNNEST(RANGE(0, LEN(text) // 64)) AS t(w)
        """
    ),
    tags=("X6", "udf", "audio"),
)
def x6_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped payload processing: treat the binary payload as a PCM
    sample stream, window it into fixed 64-sample frames, and emit per
    window the integer ENERGY (sum of squared samples), PEAK sample, and a
    silence flag (energy under threshold) — the windowing/feature shape of
    VAD segmentation and loudness normalization. Runs in ``mapInPandas``
    over the opaque binary column (numpy vectorized per batch; a real
    deployment registers an audio codec at the decoder seam and only the
    sample-extraction line changes). Table-generating: one row per (doc,
    window); partial trailing windows are dropped (fixed frame size is the
    codec contract). All-integer output (energy BIGINT, peak INT, silent
    BOOL) — hash-robust across engines by construction. The oracle
    re-derives the same windows from the text bytes (ascii payload:
    byte == character code)."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")

    def window_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_doc: list[int] = []
            out_idx: list[int] = []
            out_energy: list[int] = []
            out_peak: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n_win = len(samples) // 64
                if not n_win:
                    continue
                wins = samples[: n_win * 64].reshape(n_win, 64)
                out_doc.extend([int(doc_id)] * n_win)
                out_idx.extend(range(n_win))
                out_energy.extend((wins * wins).sum(axis=1).tolist())
                out_peak.extend(wins.max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "win_idx": out_idx,
                    "energy": out_energy,
                    "peak": out_peak,
                }
            )

    schema = "doc_id long, win_idx int, energy long, peak int"
    return b.mapInPandas(window_energy, schema=schema).withColumn(
        "silent", F.col("energy") < 400000
    )
