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
from pyspark.sql import DataFrame, SparkSession, Window

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


VAD_SILENCE = 400_000  # energy threshold shared by the energy + VAD lanes
# ONE definition of the per-window energy derivation (DuckDB side) shared
# by the x6_audio_energy oracle and the x6_vad_segments oracle — the
# single-definition discipline that keeps a frame-size or threshold change
# from desynchronizing the two lanes.
_AUDIO_WINS_SQL = """
            SELECT doc_id, CAST(w AS INT) AS win_idx,
                   CAST(LIST_SUM(LIST_TRANSFORM(
                            LIST_TRANSFORM(RANGE(1, 65),
                                           i -> ASCII(SUBSTR(text, CAST(w * 64 + i AS INT), 1))),
                            c -> c * c)) AS BIGINT) AS energy,
                   CAST(LIST_MAX(LIST_TRANSFORM(RANGE(1, 65),
                            i -> ASCII(SUBSTR(text, CAST(w * 64 + i AS INT), 1)))) AS INT) AS peak
            FROM documents, UNNEST(RANGE(0, LEN(text) // 64)) AS t(w)"""


@query(
    "x6_audio_energy",
    oracle=dedent(
        f"""
        SELECT doc_id, win_idx, energy, peak, energy < {VAD_SILENCE} AS silent
        FROM ({_AUDIO_WINS_SQL})
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
        "silent", F.col("energy") < VAD_SILENCE
    )


@query(
    "x6_vad_segments",
    oracle=dedent(
        f"""
        WITH wins AS MATERIALIZED ({_AUDIO_WINS_SQL}
        ),
        active AS MATERIALIZED (
            SELECT * FROM wins WHERE energy >= {VAD_SILENCE}
        ),
        flagged AS MATERIALIZED (
            SELECT *, CASE WHEN win_idx - LAG(win_idx) OVER (
                               PARTITION BY doc_id ORDER BY win_idx) = 1
                           THEN 0 ELSE 1 END AS is_start
            FROM active
        ),
        segs AS (
            SELECT *, CAST(SUM(is_start) OVER (PARTITION BY doc_id
                           ORDER BY win_idx) AS BIGINT) AS seg_idx
            FROM flagged
        )
        SELECT doc_id, seg_idx, CAST(MIN(win_idx) AS INT) AS start_win,
               CAST(MAX(win_idx) AS INT) AS end_win,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(energy) AS BIGINT) AS total_energy,
               CAST(MAX(peak) AS INT) AS max_peak
        FROM segs GROUP BY 1, 2
        """
    ),
    tags=("X6", "udf", "audio"),
)
def x6_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation on top of the audio windowing lane: the
    non-silent windows (energy >= {VAD_SILENCE}) collapse into maximal
    consecutive runs per document — classic gaps-and-islands (boundary
    flag where the previous active window is not adjacent, running SUM
    for the segment id), emitting per segment its window span, length,
    total energy and peak. This is the step that turns raw loudness
    features into the speech/music segments a curation pipeline actually
    keeps or drops. All outputs are exact integers. The windowed kernel
    is the same mapInPandas pass x6_audio_energy runs (decoder seam
    unchanged); everything after it is pure Catalyst, and the segment
    group-by reuses the window stage's doc_id hash partitioning (doc_id
    is a prefix of the grouping key — no second exchange)."""
    wins = x6_audio_energy(spark, sf_dir).where(~F.col("silent"))
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    flagged = wins.withColumn(
        "is_start",
        F.when(F.col("win_idx") - F.lag("win_idx").over(w) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    segs = flagged.withColumn(
        "seg_idx", F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return segs.groupBy("doc_id", "seg_idx").agg(
        F.min("win_idx").alias("start_win"),
        F.max("win_idx").alias("end_win"),
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("energy").alias("total_energy"),
        F.max("peak").alias("max_peak"),
    )


# --- perceptual-hash image near-dup (X6 x X2: multimodal dedup) -------------

PHASH_BANDS = 4  # 14-bit Hamming-search bands over the 56-bit dHash
PHASH_BAND_BITS = 14
PHASH_HAM_T = 3  # pigeonhole: <= 3 flipped bits -> some band matches exactly


def _phash_pixel_exprs(ord_fn: str) -> list[str]:
    """The stub thumbnail: pixel i = code point of payload byte i (0 past
    the end) — the first 64 bytes as an 8x8 grayscale crop. ``ord_fn`` is
    the engine's name for char->code (Spark ``ascii``, DuckDB ``ord``);
    everything downstream of the pixel projection is ONE shared SQL text."""
    return [
        f"CASE WHEN LENGTH(text) > {i} THEN {ord_fn}(SUBSTR(text, {i + 1}, 1)) "
        f"ELSE 0 END AS p{i}"
        for i in range(64)
    ]


def _dhash_expr() -> str:
    """56-bit dHash over the p0..p63 pixel columns: bit (r*7+c) set iff
    pixel(r,c) > pixel(r,c+1) — the gradient fingerprint that is invariant
    to absolute brightness and flips only where adjacent bytes reorder."""
    terms = []
    for r in range(8):
        for c in range(7):
            a, b = r * 8 + c, r * 8 + c + 1
            terms.append(
                f"CASE WHEN p{a} > p{b} THEN {1 << (r * 7 + c)} ELSE 0 END"
            )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_PHASH_MASK = (1 << PHASH_BAND_BITS) - 1


def _phash_oracle() -> str:
    pixels = ",\n                   ".join(_phash_pixel_exprs("ORD"))
    bvals = ", ".join(
        f"(dhash >> {PHASH_BAND_BITS * k}) & {_PHASH_MASK}"
        for k in range(PHASH_BANDS)
    )
    return dedent(
        f"""
        WITH px AS (
            SELECT doc_id,
                   {pixels}
            FROM documents
        ),
        hashed AS MATERIALIZED (
            SELECT doc_id, {_dhash_expr()} AS dhash FROM px
        ),
        bands AS (
            SELECT doc_id,
                   UNNEST(RANGE(0, {PHASH_BANDS})) AS band,
                   UNNEST([{bvals}]) AS bval
            FROM hashed
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(BIT_COUNT(XOR(ha.dhash, hb.dhash)) AS BIGINT) AS hamming
        FROM cand c
        JOIN hashed ha ON ha.doc_id = c.doc_a
        JOIN hashed hb ON hb.doc_id = c.doc_b
        WHERE BIT_COUNT(XOR(ha.dhash, hb.dhash)) <= {PHASH_HAM_T}
        """
    )


@query("x6_phash_neardup", oracle=_phash_oracle(), tags=("X6", "X2", "phash", "dedup"))
def x6_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash NEAR-DUP detection over binary payloads — the image
    dedup lane of a multimodal corpus (dHash + multi-index Hamming
    search), entirely JVM-side and fully oracle-checked. The stub
    "decode + downscale" reads the payload's first 64 bytes as an 8x8
    grayscale thumbnail (a real deployment swaps in cv2 decode + resize at
    the same seam; every stage downstream of the pixel projection is
    byte-layout-agnostic); the 56-bit dHash sets bit (r,c) iff
    pixel(r,c) > pixel(r,c+1), so nearly-identical payloads differ in
    O(edit) bits while unrelated payloads sit ~28 bits apart.

    Search is the classic multi-index split: {PHASH_BANDS} bands of
    {PHASH_BAND_BITS} bits; by pigeonhole ANY pair within Hamming
    {PHASH_HAM_T} shares at least one exact band, so the banded equi-join
    has GUARANTEED 100% recall at the emitted threshold (pinned against a
    brute-force rebuild in tests) — candidates surface from a hash join on
    (band, value), never a pairwise scan, and exact bit_count(XOR)
    verification keeps precision exact. Per-doc state is ONE 64-bit
    integer + {PHASH_BANDS} band keys; at corpus scale the band tables
    are the persisted index and per-ingest probe cost is O(batch)."""
    docs = table(spark, sf_dir, "documents")
    hashed = (
        docs.selectExpr("doc_id", *_phash_pixel_exprs("ascii"))
        .selectExpr("doc_id", f"{_dhash_expr()} AS dhash")
        .localCheckpoint(eager=False)  # consumed thrice: bands + both verify sides
    )
    stack_args = ", ".join(
        f"{k}, shiftright(dhash, {PHASH_BAND_BITS * k}) & {_PHASH_MASK}"
        for k in range(PHASH_BANDS)
    )
    bands = hashed.selectExpr(
        "doc_id", f"stack({PHASH_BANDS}, {stack_args}) AS (band, bval)"
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("dhash").alias("ha"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("dhash").alias("hb"))
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= PHASH_HAM_T)
    )


SCENE_FRAME = 32  # bytes per video 'frame'
SCENE_CUT_T = 20  # Hamming cut threshold over the 31-bit gradient signature
# (consecutive near-random frames measure ~15.6 mean distance; >= 20 marks
# the ~13% strongest discontinuities as shot boundaries — deterministic,
# and non-trivial on this corpus)


@query(
    "x6_scene_cuts",
    oracle=dedent(
        f"""
        WITH frames AS MATERIALIZED (
            SELECT doc_id, CAST(f AS INT) AS frame_idx,
                   CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, {SCENE_FRAME}),
                        i -> CASE WHEN ASCII(SUBSTR(text, CAST(f * {SCENE_FRAME} + i + 1 AS INT), 1))
                                     > ASCII(SUBSTR(text, CAST(f * {SCENE_FRAME} + i AS INT), 1))
                                  THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END)) AS BIGINT) AS sig
            FROM documents, UNNEST(RANGE(0, LEN(text) // {SCENE_FRAME})) AS t(f)
        ),
        flagged AS MATERIALIZED (
            SELECT doc_id, frame_idx,
                   CASE WHEN bit_count(xor(sig, LAG(sig) OVER (
                                 PARTITION BY doc_id ORDER BY frame_idx)))
                             < {SCENE_CUT_T}
                        THEN 0 ELSE 1 END AS is_cut
            FROM frames
        ),
        scenes AS (
            SELECT doc_id, frame_idx,
                   CAST(SUM(is_cut) OVER (PARTITION BY doc_id
                        ORDER BY frame_idx) AS BIGINT) AS scene_idx
            FROM flagged
        )
        SELECT doc_id, scene_idx, CAST(MIN(frame_idx) AS INT) AS start_frame,
               CAST(MAX(frame_idx) AS INT) AS end_frame,
               CAST(COUNT(*) AS BIGINT) AS n_frames
        FROM scenes GROUP BY 1, 2
        """
    ),
    tags=("X6", "udf", "video"),
)
def x6_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over video-shaped payloads: every
    {SCENE_FRAME}-byte frame gets a 31-bit GRADIENT-SIGN signature (bit i
    set iff byte i+1 > byte i — the dHash idea along the frame), and a
    scene cut fires where consecutive frames' signatures differ by >=
    {SCENE_CUT_T} of 31 bits; frames then collapse into scenes by the
    gaps-and-islands running sum, emitting each scene's frame span. This
    is the frame-sample lane's missing downstream: sampling decides WHICH
    frames to keep, scene detection decides where content CHANGES (the
    unit a video curation pipeline dedups and captions at).

    The signature kernel is one vectorized mapInPandas over the opaque
    binary payload (numpy uint8 reshape + adjacent compare; a real codec
    plugs in at the decoder seam and only the frame-extraction line
    changes); everything downstream is pure Catalyst window/aggregate
    with the scene group-by reusing the window's doc_id partitioning.
    The first frame of a doc is a cut by definition (LAG is NULL -> the
    comparison is NULL -> CASE falls to the cut arm, deliberately, in
    both engines). All outputs exact integers; the oracle re-derives the
    frames from the ASCII text (byte == character code, asserted by the
    frame-sample lane)."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")

    def frame_sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = (np.int64(1) << np.arange(SCENE_FRAME - 1, dtype=np.int64))
        for pdf in batches:
            out_doc: list[int] = []
            out_idx: list[int] = []
            out_sig: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(arr) // SCENE_FRAME
                if not n:
                    continue
                frames = arr[: n * SCENE_FRAME].reshape(n, SCENE_FRAME)
                grad = frames[:, 1:] > frames[:, :-1]
                sigs = (grad * weights).sum(axis=1)
                out_doc.extend([int(doc_id)] * n)
                out_idx.extend(range(n))
                out_sig.extend(int(s) for s in sigs)
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "sig": out_sig}
            )

    frames = b.repartition(
        max(spark.sparkContext.defaultParallelism, 8)
    ).mapInPandas(frame_sigs, schema="doc_id long, frame_idx int, sig long")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = frames.withColumn(
        "is_cut",
        F.when(
            F.bit_count(
                F.expr("sig").bitwiseXOR(F.lag("sig").over(w))
            )
            < SCENE_CUT_T,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    scenes = flagged.withColumn(
        "scene_idx",
        F.sum("is_cut").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return scenes.groupBy("doc_id", "scene_idx").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
    )
