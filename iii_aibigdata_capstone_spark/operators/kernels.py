"""Image/tensor kernel lane (SURVEY.md §2.8 K1-K11, §2.9 M5-M7, §2.7 E12):
the reference's per-image numpy/cv2/Keras pipeline re-expressed as
Arrow-batched kernels over ``BinaryType`` payload columns.

Codec and model weights are unavailable in this container (SURVEY.md §7 risk
register: `.MISSING_LARGE_BLOBS`), so the decode and the CNN forward passes
are deterministic stubs — the `TrueBinaryClassifier` pattern the reference
itself ships for pipeline testing (pi/digit_detector/classify.py:35-51).
Everything Spark owns is real: the binary column contract, mapInPandas batch
shape, the cascade ordering (cheap detector before expensive recognizer —
§4's cost-aware cascade), and the relational compose stages downstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from textwrap import dedent

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..decoders import pixel_decoder
from ..registry import QuerySpec, make_registrar
from .multimodal import binary_documents

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


# ---------------------------------------------------------------------------
# Pixel-level kernels on a 1-D uint8 "image" (deterministic, numpy)
# ---------------------------------------------------------------------------


def decode_pixels(payload: bytes, n: int = 64) -> np.ndarray:
    """K1 decode: n uint8 'pixels' from the payload, via the decoder seam
    (``decoders.pixel_decoder`` — stub by default, swap in cv2/ONNX with
    ``register_decoder``/``SPARK_GRAFT_DECODER``; the TrueBinaryClassifier
    pattern, reference classify.py:35-51). Like the queries, this resolves
    on the driver at call time; the resolved function travels in UDF
    closures (see decoders.py module docstring for the deployment story)."""
    return pixel_decoder()(payload, n)


def pad_to_stride(px: np.ndarray, stride: int = 8, value: int = 128) -> np.ndarray:
    """K3 pad right/down to a stride multiple with a constant
    (pi/openpose/util.py:57-77)."""
    rem = (-len(px)) % stride
    return np.concatenate([px, np.full(rem, value, dtype=px.dtype)]) if rem else px


def resize_half(px: np.ndarray) -> np.ndarray:
    """K2 resize stub: 2:1 area downsample = mean of adjacent pairs
    (cv2.resize INTER_AREA, pi/dl_k_to_ss.py:92-96)."""
    return ((px[0::2].astype(np.int32) + px[1::2]) // 2).astype(np.uint8)


def blur3(px: np.ndarray) -> np.ndarray:
    """K5 blur stub: window-3 moving average, edges clamped
    (gaussian_filter sigma=3, pi/dl_k_to_ss.py:112)."""
    padded = np.pad(px.astype(np.int32), 1, mode="edge")
    return ((padded[:-2] + padded[1:-1] + padded[2:]) // 3).astype(np.uint8)


def denoise3(px: np.ndarray) -> np.ndarray:
    """K9 denoise stub: window-3 median filter, edges clamped (stand-in for
    cv2.fastNlMeansDenoisingColored, pi/dl_k_to_ss.py:320)."""
    if len(px) < 3:
        return px.copy()
    padded = np.pad(px, 1, mode="edge")
    stacked = np.stack([padded[:-2], padded[1:-1], padded[2:]])
    return np.median(stacked, axis=0).astype(px.dtype)


def find_peaks(px: np.ndarray, threshold: int = 160) -> np.ndarray:
    """K6 local-maxima peaks: strictly greater than both neighbors and above
    threshold (shift-compare, pi/dl_k_to_ss.py:110-131). Returns indices."""
    if len(px) < 3:
        return np.empty(0, dtype=np.int64)
    mid = px[1:-1]
    mask = (mid > px[:-2]) & (mid > px[2:]) & (mid > threshold)
    return np.flatnonzero(mask) + 1


_K_IDX3 = "GREATEST(i, 1)", "i + 1", "LEAST(i + 2, 32)"  # clamped 3-window, 1-based


def _k_chain_oracle() -> str:
    l, m, r = _K_IDX3
    blur3 = f"(small[{l}] + small[{m}] + small[{r}]) // 3"
    med_terms = f"blur[{l}], blur[{m}], blur[{r}]"
    median3 = (
        f"blur[{l}] + blur[{m}] + blur[{r}]"
        f" - GREATEST({med_terms}) - LEAST({med_terms})"
    )
    return dedent(
        f"""
        WITH px AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT)) AS d
            FROM documents
        ),
        p64 AS (SELECT doc_id, LIST_CONCAT(d, d) AS p FROM px),
        sm AS (
            SELECT doc_id, LIST_TRANSFORM(RANGE(0, 32), i ->
                       (p[2*i + 1] + p[2*i + 2]) // 2) AS small
            FROM p64
        ),
        bl AS (
            SELECT doc_id, LIST_TRANSFORM(RANGE(0, 32), i -> {blur3}) AS blur
            FROM sm
        ),
        smo AS (
            SELECT doc_id, LIST_TRANSFORM(RANGE(0, 32), i -> {median3}) AS s
            FROM bl
        ),
        feats AS (
            SELECT doc_id,
                   LEN(LIST_FILTER(RANGE(1, 31), i ->
                       s[i+1] > s[i] AND s[i+1] > s[i+2] AND s[i+1] > 160))
                       AS n_peaks,
                   LIST_TRANSFORM(RANGE(8, 24), i -> s[i+1]) AS patch
            FROM smo
        )
        SELECT doc_id,
               64 AS padded_len, 32 AS resized_len,
               CAST(n_peaks AS INT) AS n_peaks,
               LIST_SUM(patch) / 16.0 AS patch_mean,
               LIST_MIN(patch) - LIST_SUM(patch) / 16.0 AS patch_centered_min
        FROM feats
        """
    )


@query("k_kernel_chain", oracle=_k_chain_oracle(), tags=("K1", "K2", "K3", "K4", "K5", "K6", "K8", "K9", "K11", "A9", "udf"))
def k_kernel_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K-kernel chain over binary payloads, one mapInPandas pass:
    decode (K1) -> pad-to-stride (K3) -> 2:1 resize (K2) -> gray/blur
    (K4/K5) -> denoise (K9) -> peak detect (K6) -> center patch crop (K8)
    -> mean-subtract (K11/A9). One Python crossing for the whole per-image
    cascade — chaining each kernel as its own UDF would serialize the image
    through Arrow 8 times. The K1 decode is resolved through the decoder
    seam ON THE DRIVER at plan-build time and captured in the closure —
    cloudpickle ships the resolved function with the task, so a
    ``register_decoder``'d cv2/ONNX decode reaches every executor without
    worker-side env or import tricks.

    Oracle-checked against the DEFAULT (stub) decoder: the whole integer
    pixel pipeline (resize -> blur -> median -> peaks -> crop) replays as
    SQL list transforms over the sha256-derived pixels — every
    intermediate is integer arithmetic, so cross-engine equality is exact;
    the two float outputs (patch mean and mean-subtracted min) are emitted
    UNROUNDED because int-sum/16 doubles are exact while rounding at 4
    decimals sat exactly on banker's-vs-half-away tie points."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    decode = pixel_decoder()

    def chain(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Vectorized across the batch (images are fixed-size post-decode;
            # semantics identical to the per-image kernel composition
            # pad_to_stride -> resize_half -> blur3 -> denoise3 -> find_peaks
            # -> center crop -> mean-subtract).
            px = np.stack(
                [decode(bytes(p), 64) for p in pdf["payload"]]
            ).astype(np.int32)  # (n, 64); 64 is already a stride-8 multiple (K3)
            small = (px[:, 0::2] + px[:, 1::2]) // 2  # K2 2:1 area resize
            pad = np.pad(small, ((0, 0), (1, 1)), mode="edge")
            blur = (pad[:, :-2] + pad[:, 1:-1] + pad[:, 2:]) // 3  # K5
            pad = np.pad(blur, ((0, 0), (1, 1)), mode="edge")
            smooth = np.median(
                np.stack([pad[:, :-2], pad[:, 1:-1], pad[:, 2:]]), axis=0
            ).astype(np.int64)  # K9 window-3 median
            mid = smooth[:, 1:-1]
            n_peaks = (
                (mid > smooth[:, :-2]) & (mid > smooth[:, 2:]) & (mid > 160)
            ).sum(axis=1)  # K6
            w = small.shape[1]
            patch = smooth[:, w // 4 : 3 * w // 4].astype(np.float64)  # K8
            mean = patch.mean(axis=1)
            centered_min = (patch - mean[:, None]).min(axis=1)  # K11/A9
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "padded_len": np.full(len(pdf), px.shape[1], dtype=np.int32),
                    "resized_len": np.full(len(pdf), w, dtype=np.int32),
                    "n_peaks": n_peaks.astype(np.int32),
                    "patch_mean": mean,
                    "patch_centered_min": centered_min,
                }
            )

    schema = ("doc_id long, padded_len int, resized_len int, n_peaks int, "
              "patch_mean double, patch_centered_min double")
    return b.mapInPandas(chain, schema=schema)


def _e12_oracle() -> str:
    """The PAF sampling replayed in SQL. Float discipline: the sample
    positions use ``FLOOR(x + 0.5)`` (the Python side does the same —
    ``rint``'s half-even rule differs from SQL ROUND's half-away exactly
    at .5 boundaries, while floor(x+0.5) is identical everywhere), the
    linspace weights reproduce numpy's ``k * (1/9)`` with the endpoint
    pinned to 1.0, and the 10-sample mean is an explicit left-to-right
    sum matching the Python fold (LIST_SUM's reduction order is an
    implementation detail of neither engine's contract)."""
    one = "CAST(1 AS DOUBLE)"
    ts = [f"CAST({k} AS DOUBLE) * ({one} / 9)" for k in range(9)] + [one]
    samples = [
        f"f[CAST(FLOOR(s + ({t}) * (en - s) + 0.5) AS INT) + 1]" for t in ts
    ]
    ssum = " + ".join(samples)
    return dedent(
        f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS f, LEN(embedding) AS d
            FROM embeddings
        ),
        base AS (
            SELECT vec_id, f,
                   vec_id % d AS s, (vec_id * 7 + 3) % d AS en
            FROM e
        )
        SELECT vec_id,
               CAST(ABS(en - s) AS DOUBLE) AS dist,
               ROUND(({ssum}) / 10
                     + LEAST(CAST(0.5 AS DOUBLE) * 64
                             / GREATEST(CAST(ABS(en - s) AS DOUBLE), {one}),
                             {one})
                     - {one}, 6) AS score
        FROM base
        """
    )


@query("e12_paf_integral", oracle=_e12_oracle(), tags=("E12", "E11", "K10", "udf"))
def e12_paf_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 PAF line integral (pi/dl_k_to_ss.py:158-167): sample the field at
    10 evenly spaced points along a segment, dot with the segment's unit
    vector, mean + distance prior. The field here is the embedding vector
    (the real PAF tensor needs the image); endpoints derive from vec_id.
    Vectorized numpy over Arrow batches — one batch, not one row, per
    crossing. Full oracle since r4: sample positions use floor(x+0.5)
    (bit-identical in both engines, unlike rint-vs-ROUND at half
    boundaries) and the 10-sample mean is a sequential fold mirroring the
    oracle's explicit sum — see ``_e12_oracle``."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("field")
    )

    def integrate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fields = np.stack([np.asarray(v) for v in pdf["field"]])  # (n, d)
            n, d = fields.shape
            vec_ids = pdf["vec_id"].to_numpy()
            start = (vec_ids % d).astype(np.int64)
            end = ((vec_ids * 7 + 3) % d).astype(np.int64)
            # numpy linspace(0,1,10) semantics, written out so the oracle
            # can reproduce the exact doubles: k*(1/9), endpoint pinned
            ts = np.arange(10) * (1.0 / 9.0)
            ts[9] = 1.0  # E11
            pos = start[:, None] + ts[None, :] * (end - start)[:, None]
            idx = np.floor(pos + 0.5).astype(np.int64)
            samples = np.take_along_axis(fields, idx, axis=1)  # (n, 10)
            # sequential left-to-right fold — matches the oracle's explicit
            # sum (np.mean's pairwise reduction order would not)
            acc = samples[:, 0].copy()
            for k in range(1, 10):
                acc = acc + samples[:, k]
            dist = np.abs(end - start).astype(np.float64)
            score = acc / 10 + np.minimum(0.5 * 64 / np.maximum(dist, 1.0), 1.0) - 1.0
            yield pd.DataFrame(
                {"vec_id": vec_ids, "dist": dist, "score": np.round(score, 6)}
            )

    return e.mapInPandas(integrate, schema="vec_id long, dist double, score double")


@query(
    "m5_digit_cascade",
    oracle=dedent(
        """
        WITH px AS (
            SELECT doc_id,
                   UNNEST(RANGE(0, 32)) AS x,
                   UNNEST(LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT))) AS v
            FROM documents
        ),
        prop AS (
            SELECT doc_id, x, v,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY x) AS rn
            FROM px WHERE v > 200
        ),
        det AS (
            SELECT doc_id, x, ROUND(v / 255.0, 6) AS prob, v % 10 AS digit
            FROM prop WHERE rn <= 4
        ),
        ranked AS (
            SELECT doc_id, digit,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY x DESC) - 1 AS r
            FROM det WHERE prob > 0.8
        )
        SELECT doc_id,
               CAST(SUM(digit * POW(10.0, r)) AS BIGINT) AS number,
               COUNT(*) AS n_digits
        FROM ranked GROUP BY doc_id
        """
    ),
    tags=("M5", "M6", "K7", "P7", "W5", "udf"),
)
def m5_digit_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/M6 two-stage CNN cascade (detector then recognizer, pi/digit_
    detector/classify.py:18-33 invoked from detect.py:105-116), weights
    stubbed per the reference's own TrueBinaryClassifier (classify.py:35-51):

    - K7 region proposal stub: candidate 'boxes' at payload positions whose
      pixel exceeds a threshold;
    - M5 detector: prob = always [0,1] (TrueBinaryClassifier) scaled by
      pixel intensity; P7 threshold filter;
    - M6 recognizer: digit = pixel % 10;
    - W5 compose: digits ordered by x form the jersey number — done
      RELATIONALLY (window by doc, positional weight), not in the UDF: the
      kernel emits one row per detection, Catalyst owns the compose.
    """
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    decode = pixel_decoder()  # seam: resolved on the driver, shipped in the closure

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Vectorized batch form of: per image, first 4 pixels > 200
            # (K7 proposal stub), prob/digit from the pixel value (M5/M6).
            px = np.stack([decode(bytes(p), 32) for p in pdf["payload"]])
            mask = px > 200
            mask &= mask.cumsum(axis=1) <= 4  # first 4 proposals per image
            r, x = np.nonzero(mask)
            v = px[r, x].astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[r],
                    "x": x.astype(np.int32),
                    "prob": np.round(v / 255.0, 6),  # M5
                    "digit": (v % 10).astype(np.int32),  # M6
                }
            )

    dets = b.mapInPandas(detect, schema="doc_id long, x int, prob double, digit int")
    dets = dets.where(F.col("prob") > 0.8)  # P7 threshold
    w = Window.partitionBy("doc_id").orderBy(F.desc("x"))
    n = Window.partitionBy("doc_id")
    # W5: digits left-to-right; digit at rank r (from the right) weighs 10^r.
    return (
        dets.withColumn("r", F.row_number().over(w) - 1)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("digit") * F.pow(F.lit(10.0), F.col("r"))).cast("long").alias("number"),
            F.count(F.lit(1)).alias("n_digits"),
        )
    )


@query(
    "x4_sentence_spans",
    oracle=dedent(
        """
        WITH s AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, '.')) AS sentence,
                   UNNEST(RANGE(1, LEN(STRING_SPLIT(text, '.')) + 1)) AS sentence_no
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT doc_id, sentence_no,
               LENGTH(TRIM(sentence)) AS n_chars,
               LEN(STRING_SPLIT(TRIM(sentence), ' ')) AS n_tokens
        FROM s WHERE LENGTH(TRIM(sentence)) > 0
        """
    ),
    tags=("X4", "udtf"),
)
def x4_sentence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input document row -> N sentence
    rows with per-sentence stats, lateral-joined to the source. The UDTF is
    the right tool when the fan-out logic is genuinely procedural; here the
    logic is simple enough to ALSO be SQL-expressible, which buys the UDTF
    path a full DuckDB oracle — the harness proves the Python table
    function agrees with the relational form."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_no int, n_chars int, n_tokens int")
    class SentenceSpans:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i + 1, len(s), len(s.split(" "))

    spark.udtf.register("sentence_spans", SentenceSpans)
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_no, s.n_chars, s.n_tokens
        FROM _udtf_docs d, LATERAL sentence_spans(d.text) s
        """
    )


@query(
    "m7_pose_peaks",
    oracle=dedent(
        """
        WITH px AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT)) AS b
            FROM documents
        ),
        heat AS (
            SELECT doc_id, part,
                   LIST_TRANSFORM(b, v -> (v * (2*part + 3)) % 251) AS h
            FROM px CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS part)
        ),
        smo AS (
            SELECT doc_id, part, h,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       (h[GREATEST(i, 1)] + h[i+1] + h[LEAST(i+2, 32)]) // 3) AS s
            FROM heat
        )
        SELECT doc_id, CAST(part AS INT) AS part, CAST(x AS INT) AS x,
               ROUND(h[x+1] / 255.0, 6) AS score
        FROM (
            SELECT doc_id, part, h,
                   UNNEST(LIST_FILTER(RANGE(1, 31), i ->
                       s[i+1] > s[i] AND s[i+1] > s[i+2] AND s[i+1] > 170)) AS x
            FROM smo
        )
        """
    ),
    tags=("M7", "K5", "K6", "udf"),
)
def m7_pose_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 pose-model inference stub (pi/model/cmu_model.py:176-209 invoked
    at dl_k_to_ss.py:88): per image, a deterministic pseudo-heatmap per body
    part -> blur -> peak detect -> one row per (part, peak).

    Model weights ship via ``SparkContext.broadcast`` — ONCE per executor —
    exactly how real frozen CMU weights would; the reference instead
    captures the Keras model in the closure (dl_k_to_ss.py:435-437), which
    reserializes the weights into every task. The stub 'weights' are a
    deterministic per-part mixing vector standing in for the conv stacks;
    the emitted peak table is exactly what J4/W3/T4 consume downstream."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    n_parts = 4
    weights = spark.sparkContext.broadcast(
        np.arange(1, n_parts + 1, dtype=np.int32) * 2 + 1  # [3,5,7,9]
    )
    decode = pixel_decoder()  # seam: resolved on the driver, shipped in the closure

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = weights.value  # one deserialization per worker, not per task
        for pdf in batches:
            if not len(pdf):
                continue
            # Vectorized across the whole Arrow batch: images are fixed-size
            # after decode, so the 'model' runs as (batch, parts, pixels)
            # array math instead of a per-image Python loop (per-row
            # iteration here dominated the bench kernel lane).
            base = np.stack(
                [decode(bytes(p), 32) for p in pdf["payload"]]
            ).astype(np.int32)  # (n, 32)
            doc_ids = pdf["doc_id"].to_numpy()
            heat = (base[:, None, :] * w[None, :, None]) % 251  # (n, parts, 32)
            # blur3: window-3 moving average with clamped edges, along pixels
            padded = np.pad(heat, ((0, 0), (0, 0), (1, 1)), mode="edge")
            sm = (padded[:, :, :-2] + padded[:, :, 1:-1] + padded[:, :, 2:]) // 3
            mid = sm[:, :, 1:-1]
            mask = (mid > sm[:, :, :-2]) & (mid > sm[:, :, 2:]) & (mid > 170)
            r, p, c = np.nonzero(mask)
            x = c + 1
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[r],
                    "part": p.astype(np.int32),
                    "x": x.astype(np.int32),
                    "score": np.round(heat[r, p, x] / 255.0, 6),
                }
            )

    return b.mapInPandas(infer, schema="doc_id long, part int, x int, score double")


@query(
    "k12_render_annotations",
    oracle=dedent(
        """
        WITH px AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT)) AS d
            FROM documents
        ),
        p64 AS (SELECT doc_id, LIST_CONCAT(d, d) AS p FROM px),
        pk AS (
            SELECT doc_id, p,
                   LIST_FILTER(RANGE(2, 64), i ->
                       p[i] > p[i-1] AND p[i] > p[i+1] AND p[i] > 160) AS peaks
            FROM p64
        ),
        bounds AS (
            SELECT doc_id, p, peaks,
                   CASE WHEN LEN(peaks) > 0
                        THEN GREATEST(LIST_MIN(peaks) - 1, 1) END AS lo,
                   CASE WHEN LEN(peaks) > 0
                        THEN LEAST(LIST_MAX(peaks) + 1, 64) END AS hi
            FROM pk
        ),
        ann AS (
            SELECT doc_id, peaks,
                   LIST_TRANSFORM(RANGE(1, 65), i ->
                       CASE WHEN LIST_CONTAINS(peaks, i) THEN 255
                            WHEN i = lo OR i = hi THEN 0
                            ELSE p[i] END) AS a
            FROM bounds
        )
        SELECT doc_id,
               CAST(LEN(peaks) AS BIGINT) AS n_marks,
               CAST(LIST_SUM(a) AS BIGINT) AS render_sum,
               MD5(ARRAY_TO_STRING(a, ',')) AS render_md5
        FROM ann
        """
    ),
    tags=("K12", "K1", "K6", "udf"),
)
def k12_render_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K12 drawing/visualization AS DATAFLOW (reference
    player_identification/digit_detector/show.py:9-89: cv2.rectangle box
    edges + keypoint dots drawn onto frames for display). The engine's
    form renders the same annotations INTO the pixel array — keypoint
    marks (255 at each K6 peak) and the bounding-box edges (0 at the
    clamped min/max peak boundary, peak marks win ties) — and emits a
    content-addressed render: (n_marks, pixel sum, md5 of the annotated
    array). That is the part of 'show' that IS dataflow (deterministic
    rasterization + artifact addressing, the shape of a thumbnail/asset
    render stage feeding a sink); putting pixels on a screen stays out of
    scope. One mapInPandas crossing over the binary payloads via the K1
    decoder seam; the oracle replays the render as SQL list transforms
    over the sha256 stub pixels, all-integer end to end."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    decode = pixel_decoder()

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode(bytes(payload), 64)
                ann = px.astype(np.int64).copy()
                peaks = find_peaks(px, 160)
                if len(peaks):
                    lo = max(int(peaks.min()) - 1, 0)
                    hi = min(int(peaks.max()) + 1, 63)
                    ann[lo] = 0
                    ann[hi] = 0
                    ann[peaks] = 255  # keypoint marks win over box edges
                digest = hashlib.md5(
                    ",".join(str(int(v)) for v in ann).encode()
                ).hexdigest()
                out.append((int(doc_id), len(peaks), int(ann.sum()), digest))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_marks", "render_sum", "render_md5"]
            )

    return b.mapInPandas(
        render,
        "doc_id long, n_marks long, render_sum long, render_md5 string",
    )
