"""Structured Streaming rebuild of the reference pipelines (SURVEY.md §2.10,
§3.1-3.2) plus the ST5 extension (watermarked event-time windows).

Reference shape (qp/ml_k_to_ss.py): Kafka 'ml_input' -> DStream -> split ','
-> Row(int casts) -> per-batch model reload + refit + transform -> zip ->
foreachPartition KafkaProducer 'ml_output'. Rebuild: ``readStream`` ->
``from_csv`` -> ONE fitted PipelineModel applied to the stream ->
``writeStream`` Kafka sink (producer pooling is Spark's job, S7) or
``foreachBatch`` webhook sink (S8).

All transformations here take/return DataFrames so the same code runs on a
Kafka stream, a file stream (tests), or a static frame (batch replay).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

# quarter_stats CSV schema, positional (FIXTURES.md §1; ml_k_to_ss.py:9-14).
QUARTER_CSV_COLUMNS = [
    "enemyStyle",
    "teamNumber",
    "enemyNumber",
    "fastBreak",
    "restrictedNumber",
    "perimeterNumber",
    "threeNumber",
    "freethrowNumber",
    "assist",
    "steal",
    "block",
    "foul",
    "turnover",
    "enemyPeriodScore",
    "winPeriod",
]
QUARTER_SCHEMA = StructType(
    [StructField(c, IntegerType()) for c in QUARTER_CSV_COLUMNS]
)
QUARTER_DDL = ", ".join(f"{c} INT" for c in QUARTER_CSV_COLUMNS)


# ---------------------------------------------------------------------------
# Sources (S1, S2) — builders return unstarted streaming DataFrames
# ---------------------------------------------------------------------------


# The wire contract shared by the Kafka sink and text source: the sink
# frames `payload` as the message value; the source recovers it as `line`.
# Factored out so the broker-less framing test exercises the SAME
# expressions the real builders ship (tests/test_streaming.py).
KAFKA_SINK_PROJECTION = "CAST(payload AS STRING) AS value"


def kafka_value_to_line(messages: DataFrame) -> DataFrame:
    """Source-side half of the wire contract (value bytes -> text line)."""
    return messages.select(F.col("value").cast("string").alias("line"))


def kafka_text_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    max_offsets_per_trigger: int = 10000,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 (qp/ml_k_to_ss.py:63): Kafka text source. Direct source — one
    Spark partition per Kafka partition (replaces the 3 receiver threads);
    ``maxOffsetsPerTrigger`` is the rate control the reference lacked, and
    ``starting_offsets='earliest'`` is the replay/backfill switch.
    Requires the spark-sql-kafka package on the classpath."""
    return kafka_value_to_line(
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_binary_source(spark: SparkSession, servers: str, topic: str) -> DataFrame:
    """S2 (pi/dl_k_to_ss.py:429): Kafka binary source. The custom
    ``valueDecoder=imdecoder`` disappears — ``value`` stays BinaryType and
    decoding happens in an Arrow-batched kernel downstream
    (operators/multimodal.py), not in the source."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .load()
        .select(F.col("key").cast("string").alias("key"), F.col("value").alias("payload"))
    )


def text_file_source(spark: SparkSession, path: str) -> DataFrame:
    """S5: line-oriented file stream (test/replay stand-in for Kafka)."""
    return spark.readStream.text(path).select(F.col("value").alias("line"))


# ---------------------------------------------------------------------------
# Transformations (P2/P3, ST3, J1)
# ---------------------------------------------------------------------------


def parse_quarter_lines(lines: DataFrame) -> DataFrame:
    """P2+P3 (ml_k_to_ss.py:65-66): CSV line -> 15 typed columns via
    ``from_csv`` with a declared schema — the split(',')+int() loop as one
    codegen'd expression. Malformed lines yield nulls (P9) instead of
    crashing the batch."""
    parsed = F.from_csv(F.col("line"), QUARTER_DDL)
    return lines.select(parsed.alias("r")).select("r.*")


def score_quarter_stream(stream: DataFrame, model) -> DataFrame:
    """ST3 (ml_k_to_ss.py:67, DStream.transform): apply the fitted
    PipelineModel directly to the streaming DataFrame — MLlib transforms
    are stateless projections, so no foreachBatch hop is needed, and the
    reference's per-batch model reload (:22-28) is gone by construction."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(stream)
    prob = F.element_at(
        vector_to_array(F.col("probability")), F.col("prediction").cast("int") + 1
    )
    return scored.select(
        F.col("prediction").cast("int").alias("prediction"),
        F.round(prob, 4).alias("win_probability"),
        F.concat_ws(
            ",", F.col("prediction").cast("string"), F.round(prob, 4).cast("string")
        ).alias("payload"),
    )


def stream_static_lookup(stream: DataFrame, dim: DataFrame, keys: list[str]) -> DataFrame:
    """J1 as a stream-static join (dl_k_to_ss.py:370-395): the static side
    is broadcast once per query, not shipped per task in a closure."""
    return stream.join(F.broadcast(dim), on=keys, how="left")


# ---------------------------------------------------------------------------
# Event-time windows with watermarks (ST5 extension)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts; late rows beyond the watermark
    are dropped instead of corrupting closed windows."""
    # Watermarks require TIMESTAMP (not NTZ); session tz is pinned to UTC
    # so the cast is value-preserving.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def windowed_heavy_hitters(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window frequent items via the approx_top_k
    sketch aggregate — the streaming form of x5_heavy_hitters: per-window
    state is one fixed-size item sketch (mergeable across partitions and
    micro-batches), never a per-item count table, so state size is
    O(windows), not O(windows x items). k covers every event type here,
    which keeps the emitted set deterministic (no tie at the k boundary);
    at real item cardinality the sketch returns estimates with documented
    error instead of blowing up state."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.explode("tk").alias("e"),
        )
        .select(
            "window_start",
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("est_n"),
        )
    )


def windowed_hll_registers(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked sliding-window EXPLICIT-HLL register maintenance — the
    streaming form of ``x5_hll_explicit``'s sketch state (and the partial
    side of ``x5_hll_sliding_explicit``): per (3-day window sliding by 1
    day, register) state is ONE integer — the running MAX of the
    md5-derived rank — merged incrementally by the state store across
    micro-batches exactly as map-side combine merges it across partitions
    in batch. Streaming allows one stateful operator per query, and the
    register table IS that operator's output: deriving the estimate
    (collapse registers per window) is a second aggregation, so it belongs
    to the downstream consumer — the realistic handoff, where a streaming
    job keeps sketch partials warm and reporting queries fold them with
    ``_hll_sden``/``_hll_est`` (equality with the batch fold is pinned in
    tests/test_streaming.py). State is O(windows x 64) small integers —
    never per-id — which is the whole reason HLL belongs in the stream."""
    from ..operators.analytics import _hll_j_rho

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    j, rho = _hll_j_rho("event_id")
    return (
        events.select("ts", j, rho)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "3 days", "1 day").alias("w"), F.col("j"))
        .agg(F.max("rho").alias("m"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "j",
            "m",
        )
    )


def session_counts(events: DataFrame, gap: str = "12 hours", watermark: str = "1 day") -> DataFrame:
    """Watermarked session windows per user (stateful aggregation — state
    store sized by active sessions, pruned by the watermark)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, how: str = "inner"
) -> DataFrame:
    """Stream-stream join (ST5 extension; no reference analogue):
    purchases join clicks by the same user within the preceding 6 hours.
    Both sides carry watermarks so the state store can evict click rows
    older than the join window — without the time-range condition + both
    watermarks, stream-stream join state grows without bound.

    ``how='left_outer'`` adds conversion-funnel semantics: a click with NO
    purchase in its window emits once, with null purchase columns, only
    after the watermark passes the end of its window (the engine must be
    sure no matching purchase can still arrive). Rows whose window is
    still open when the stream ends stay in state and never emit — tests
    must account for that tail."""
    c = (
        clicks.withColumn("click_ts", F.col("ts").cast("timestamp"))
        .withWatermark("click_ts", "1 day")
        .select("user_id", F.col("event_id").alias("click_id"), "click_ts")
    )
    p = (
        purchases.withColumn("purchase_ts", F.col("ts").cast("timestamp"))
        .withWatermark("purchase_ts", "1 day")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            "purchase_ts",
            F.col("value").alias("amount"),
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")),
        how,
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round("amount", 2).alias("amount"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
    )


# ---------------------------------------------------------------------------
# Sinks (S7, S8)
# ---------------------------------------------------------------------------


def curation_dim_join(docs: DataFrame, dim: DataFrame) -> DataFrame:
    """J1 (dl_k_to_ss.py:370-395) as the curation stream-static shape:
    enrich documents with the per-source curation dimension by BROADCAST
    left join on ``source`` (the dimension is small — one row per corpus
    source — so the fact/stream side never shuffles for the join), then
    gate: a doc is ``kept`` iff its source is known, not blocked, and the
    doc meets the source's minimum length. Unknown sources fail CLOSED
    (kept = false) — a curation gate must not admit data whose policy row
    is missing. ONE definition shared by the batch lane and the streaming
    lane's per-batch apply, so the stream==batch equality contract is
    structural.

    Dimension schema: (source, tier, min_chars)."""
    gate = (
        F.col("tier").isNotNull()
        & (F.col("tier") != F.lit("blocked"))
        & (F.col("n_chars") >= F.col("min_chars"))
    )
    return docs.join(F.broadcast(dim), "source", "left").select(
        *[F.col(c) for c in docs.columns],
        "tier",
        "min_chars",
        F.coalesce(gate, F.lit(False)).alias("kept"),
    )


def curation_dim_stream(
    stream_docs: DataFrame,
    load_dim: Callable[[], DataFrame],
    on_batch: Callable[[DataFrame, int], None],
):
    """Stream-static curation join with a REFRESHING dimension (the
    slowly-changing-dimension deployment shape): the static side is
    re-loaded via ``load_dim()`` inside ``foreachBatch``, so a dimension
    swap (quota tightened, source blocked) takes effect at the next
    micro-batch boundary. A dimension embedded in the streaming plan
    would not reliably see the swap — Spark re-evaluates the static side
    per micro-batch, but file-source listings and broadcast results may
    be reused — whereas a fresh ``spark.read`` per batch is guaranteed
    current. At scale the per-batch cost is one small-dim read +
    broadcast, amortized over the micro-batch's rows."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        on_batch(curation_dim_join(batch, load_dim()), batch_id)

    return stream_docs.writeStream.foreachBatch(handle)


def kafka_sink(df: DataFrame, servers: str, topic: str, checkpoint: str):
    """S7 (ml_k_to_ss.py:37-54): Kafka sink. The reference hand-rolls one
    producer per partition per batch; Spark's sink pools producers and the
    checkpoint upgrades delivery from fire-and-forget to at-least-once."""
    return (
        df.selectExpr(KAFKA_SINK_PROJECTION)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def kafka_sink_batch(df: DataFrame, servers: str, topic: str):
    """Batch variant of S7 (``df.write.format('kafka')``) — same wire
    framing, used for backfills and the round-trip smoke test."""
    return (
        df.selectExpr(KAFKA_SINK_PROJECTION)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
    )


def webhook_sink(
    df: DataFrame, post: Callable[[str], None], max_rows_per_batch: int = 10_000
):
    """S8 (qp/ml_IFTTT.py:12-33): webhook push per record via
    ``foreachBatch`` — the separate consumer process collapses into the
    query. ``post`` abstracts the HTTP call (IFTTT/LINE in the reference;
    injected so tests capture instead of POSTing).

    The per-batch collect is bounded: a notification sink that suddenly
    sees more than ``max_rows_per_batch`` payloads is a pipeline bug (or
    needs a distributed sink like foreachPartition + a worker-side HTTP
    pool), and failing loudly beats a silent driver OOM."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        rows = batch.select("payload").limit(max_rows_per_batch + 1).collect()
        if len(rows) > max_rows_per_batch:
            raise ValueError(
                f"webhook_sink batch {batch_id} exceeds {max_rows_per_batch} "
                "payloads; use a distributed sink for bulk delivery"
            )
        for row in rows:
            post(row.payload)

    return df.writeStream.foreachBatch(handle)
