"""Time-series operators over the ``events`` stream table (SURVEY.md §2.10
extension ST5 + §2.12 X5 range/as-of joins).

The reference has no event-time at all (its only clock is the 1 s
micro-batch, qp/ml_k_to_ss.py:61); these are the engine's additions, built
on Spark's documented event-time semantics so the same expressions run
unchanged under Structured Streaming with watermarks (streaming/pipelines.py
wires the streaming variants).

Scale notes:
- The as-of join is the window-function formulation (sort within user
  partition, carry last match forward) — O(n log n), no quadratic join.
- The range join bands on the equi prefix (user_id) first so the theta
  predicate only sees per-user groups; AQE splits skewed users.
- Session windows in batch are gaps-and-islands; in streaming the same
  semantics come from ``session_window`` with a watermark.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


@query(
    "x5_range_join",
    oracle=dedent(
        """
        SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        """
    ),
    tags=("X5", "range-join"),
)
def x5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: purchases within 30 minutes after each click of
    the same user. Equi prefix (user_id) bounds the cross product per user;
    the range predicate filters inside each band.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").alias("c")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    return (
        c.join(
            p,
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") > F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.user_id").alias("user_id"),
        )
    )


@query(
    "x5_asof_join",
    oracle=dedent(
        """
        WITH cp AS (
            SELECT event_id, user_id, ts, event_type,
                   LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_id
            FROM events
            WHERE event_type IN ('click', 'purchase')
        )
        SELECT event_id AS purchase_id, user_id, prior_click_id
        FROM cp WHERE event_type = 'purchase'
        """
    ),
    tags=("X5", "asof-join"),
)
def x5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for every purchase, the most recent strictly
    earlier click by the same user.

    Implemented as the scalable window formulation — union both sides,
    sort once per user partition, carry the last click id forward with
    ``last(..., ignorenulls)`` over ROWS UNBOUNDED PRECEDING..1 PRECEDING.
    One shuffle + one sort; never the quadratic join+argmax form.
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prior_click_id", prior)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "prior_click_id",
        )
    )


@query(
    "x5_asof_forward",
    oracle=dedent(
        """
        WITH cp AS (
            SELECT event_id, user_id, ts, event_type,
                   FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_id,
                   FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
            FROM events
            WHERE event_type IN ('click', 'purchase')
        )
        SELECT event_id AS purchase_id, user_id,
               CASE WHEN next_click_ts <= ts + INTERVAL 1 HOUR
                    THEN next_click_id END AS next_click_id
        FROM cp WHERE event_type = 'purchase'
        """
    ),
    tags=("X5", "asof-join"),
)
def x5_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of FORWARD join with tolerance: for every purchase, the next
    strictly later click by the same user, but only if it arrives within
    1 hour (the tolerance null-out is what distinguishes as-of from plain
    lead). Same single-sort window formulation as the backward form."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_id = F.first(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    next_ts = F.first(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("next_click_id", next_id)
        .withColumn("next_click_ts", next_ts)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(
                F.col("next_click_ts")
                <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                F.col("next_click_id"),
            ).alias("next_click_id"),
        )
    )


@query(
    "st5_tumbling_window",
    oracle=dedent(
        """
        SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY DATE_TRUNC('hour', ts), event_type
        """
    ),
    tags=("ST5", "window"),
)
def st5_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate via ``window()`` — the
    same expression runs on a stream with ``withWatermark``. Batch oracle:
    hour truncation.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query(
    "st5_sliding_window",
    oracle=dedent(
        """
        SELECT CAST(FLOOR(EPOCH(ts) / 1800) AS BIGINT) * 1800 - k.k * 1800 AS window_start_epoch,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS total_value
        FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
        GROUP BY 1
        """
    ),
    tags=("ST5", "window"),
)
def st5_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide — every event lands
    in exactly 2 windows. Oracle expands the two candidate window starts
    per event with the same epoch-grid arithmetic Spark uses (origin 1970).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.to_unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "cnt",
            "total_value",
        )
    )


@query(
    "st5_session_window",
    oracle=dedent(
        """
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL 12 HOUR
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessed AS (
            SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        )
        SELECT user_id,
               STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               STRFTIME(MAX(ts) + INTERVAL 12 HOUR, '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM sessed
        GROUP BY user_id, sess_id
        """
    ),
    tags=("ST5", "session-window"),
)
def st5_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (12-hour inactivity gap) per user via
    ``session_window`` — window end = last event + gap, new session when
    the gap is reached (half-open semantics, hence ``>=`` in the oracle's
    gaps-and-islands formulation).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
