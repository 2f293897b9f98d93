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
from ..functions.money import cents_sql
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


@query(
    "ts_gap_fill",
    oracle=dedent(
        """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   ROUND(AVG(value), 6) AS day_avg
            FROM events GROUP BY 1, 2
        ),
        span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
        spine AS (
            SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM span
        )
        SELECT s.user_id, s.day,
               d.day_avg IS NOT NULL AS observed,
               LAST_VALUE(d.day_avg IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.day
                         ROWS UNBOUNDED PRECEDING) AS value_filled
        FROM spine s
        LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
        """
    ),
    tags=("X5", "gap-fill"),
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + LOCF imputation (the resample/`time_bucket
    gapfill` operator of hypertable engines): build a dense daily spine per
    user with ``sequence``+``explode``, left-join the observed daily
    aggregate, carry the last observation forward with
    ``last(ignorenulls)``.

    Scale shape: the spine is generated, not shuffled (explode runs
    map-side on the per-user span row); the only shuffles are the daily
    aggregate and the spine-to-daily join, both on user_id — co-partitioned
    and reusable. No driver-side date loop.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("day_avg"))
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_avg").isNotNull().alias("observed"),
            F.last("day_avg", ignorenulls=True).over(w).alias("value_filled"),
        )
    )


@query(
    "ts_rollup_hierarchy",
    oracle=dedent(
        """
        WITH hourly AS (
            SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket,
                   COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
            FROM events GROUP BY 1
        )
        SELECT 'hour' AS grain, CAST(epoch(bucket) AS BIGINT) AS bucket_s,
               CAST(n AS BIGINT) AS n,
               CAST(ROUND(sv * 100, 0) AS BIGINT) AS total_cents
        FROM hourly
        UNION ALL
        SELECT 'day', CAST(epoch(date_trunc('day', bucket)) AS BIGINT),
               CAST(SUM(n) AS BIGINT), CAST(ROUND(SUM(sv) * 100, 0) AS BIGINT)
        FROM hourly GROUP BY date_trunc('day', bucket)
        UNION ALL
        SELECT 'week', CAST(epoch(date_trunc('week', bucket)) AS BIGINT),
               CAST(SUM(n) AS BIGINT), CAST(ROUND(SUM(sv) * 100, 0) AS BIGINT)
        FROM hourly GROUP BY date_trunc('week', bucket)
        """
    ),
    tags=("X5", "rollup"),
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-bucket rollup (continuous-aggregate /
    hypertable-rollup pattern): aggregate raw events ONCE at the finest
    grain (hour), then derive day and week grains by re-aggregating the
    hourly partials — at 100 TB the raw table is read a single time and the
    coarser rollups run over ~1/10^4 as many rows.

    The hourly partial is cached for the two re-aggregations. Partial sums
    are carried as DECIMAL(18,6) — decimal addition is exact and
    associative, so re-aggregating hourly partials into day/week grains
    yields bit-identical totals regardless of partitioning or engine
    (float partials re-summed in a different order was the r01 hash
    mismatch).

    The OUTPUT representation is deliberately all-integer (hash-robust by
    construction — the r02 lesson: values matched at repr level yet the
    driver hash still flipped on timestamp/DOUBLE serialization):

    - ``bucket_s``: the bucket as epoch SECONDS (BIGINT). A truncated
      timestamp has no sub-second part, so the cast is exact in both
      engines and immune to timestamp-object serialization differences.
    - ``n``: BIGINT in every grain. The oracle wraps the day/week
      ``SUM(n)`` in ``CAST(... AS BIGINT)`` because DuckDB widens a bare
      SUM over BIGINT to HUGEINT, which hash-diverges from Spark's LONG
      even when the values are equal.
    - ``total_cents``: ``ROUND(sv*100, 0)`` as BIGINT. sv is exact
      DECIMAL, so sv*100 is exact and half-up rounding of a DECIMAL is
      engine-stable — no DOUBLE ever appears in the output.
    """
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
        .localCheckpoint(eager=False)  # one scan of the raw table feeds all grains
    )

    def project(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("grain"),
            F.col("bucket").cast("long").alias("bucket_s"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sv") * 100, 0).cast("long").alias("total_cents"),
        )

    def grain(name: str, df: DataFrame) -> DataFrame:
        agg = df.groupBy(F.date_trunc(name, "bucket").alias("bucket")).agg(
            F.sum("n").alias("n"), F.sum("sv").alias("sv")
        )
        return project(name, agg)

    hour = project("hour", hourly)
    return hour.unionByName(grain("day", hourly)).unionByName(grain("week", hourly))


@query(
    "x5_funnel_stages",
    oracle=dedent(
        """
        WITH v AS (
            SELECT user_id, MIN(ts) AS view_ts FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS click_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.view_ts
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS purchase_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
            GROUP BY 1
        )
        SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
               1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS stages_reached
        FROM v
        LEFT JOIN c ON c.user_id = v.user_id
        LEFT JOIN p ON p.user_id = v.user_id
        """
    ),
    tags=("X5", "funnel"),
)
def x5_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): first view,
    first click strictly after that view, first purchase strictly after
    that click, per user — the sequential-event-match operator of product
    analytics engines.

    Every stage is an aggregate + join on user_id: one partitioning serves
    the whole funnel (no per-stage wide shuffle on different keys), and
    stage N's input is already the survivors of stage N-1, so cardinality
    only shrinks down the funnel. Stage outputs v and c are each consumed
    TWICE (next stage + final join), so they are materialized once via a
    lazy localCheckpoint — without the boundary each consumer re-scans and
    re-aggregates the event table (6 fact scans instead of 3).
    """
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("int")
                + F.col("purchase_ts").isNotNull().cast("int")
            ).alias("stages_reached"),
        )
    )


@query(
    "x5_cdc_merge",
    oracle=dedent(
        """
        WITH ranked AS (
            SELECT user_id, value, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_ops
            FROM events
            WHERE event_type IN ('signup', 'purchase', 'error')
        )
        SELECT user_id, ROUND(value, 2) AS current_value, n_ops,
               ts AS last_op_ts
        FROM ranked
        WHERE rn = 1 AND event_type <> 'error'
        """
    ),
    tags=("X5", "cdc"),
)
def x5_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog merge (MERGE INTO / upsert-apply): treat events as a
    keyed change stream — signup/purchase upsert the user's value, error
    deletes the key — and materialize the final table state: latest
    operation per key wins; keys whose latest op is a delete vanish.

    Single shuffle on the merge key with a rank-1 window — the standard
    scalable compaction (no per-change driver loop, no iterative apply);
    the same plan incrementalizes under Structured Streaming with
    ``applyInPandasWithState`` (streaming/stateful.py).
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 2).alias("current_value"),
            "n_ops",
            F.col("ts").alias("last_op_ts"),
        )
    )


@query(
    "ts_incremental_rollup",
    oracle=dedent(
        """
        SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM events
        GROUP BY 1
        """
    ),
    tags=("X5", "rollup", "incremental"),
)
def ts_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: an hourly rollup is kept
    as MERGEABLE partials (count, sum — never avg) built from data before
    day 25; a late-arriving delta batch (day >= 25) aggregates separately
    and merges by re-summing partials per bucket. The oracle recomputes
    from scratch — merged partials must equal full recompute, which is the
    correctness contract of every incremental-aggregation pipeline.

    Scale shape: the delta pass reads ONLY the new partition's rows (the
    date filter pushes down to the parquet scan), and the merge touches
    just the buckets present in either side — at 100 TB this is the
    difference between an hourly job over 100 TB and one over the last
    hour's slice.
    """
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        )

    base = partials(ev.where(F.col("ts") < cutoff))  # the stored MV state
    delta = partials(ev.where(F.col("ts") >= cutoff))  # the late batch
    return (
        base.unionByName(delta)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sv"), 2).alias("total"))
    )


@query(
    "x5_interval_join_banded",
    oracle=dedent(
        """
        SELECT e.event_id AS error_id,
               COUNT(*) AS n_purchases,
               ROUND(SUM(p.value), 2) AS purchase_value
        FROM events e
        JOIN events p
          ON e.event_type = 'error' AND p.event_type = 'purchase'
         AND p.ts >= e.ts - INTERVAL 5 MINUTE AND p.ts < e.ts
        GROUP BY 1
        """
    ),
    tags=("X5", "range-join", "banding"),
)
def x5_interval_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equi key (purchases across ALL users in the
    5 minutes before each error): the naive plan is a nested-loop join
    with a range predicate — O(|errors| x |purchases|), fatal at scale.
    Banding restores an equi key: both sides bucket by floor(ts/300s);
    since the lookback window equals the band width, each error's window
    overlaps exactly two bands, so errors explode into 2 band keys, the
    join is a plain hash join on the band, and the exact range predicate
    filters inside each band. Each (error, purchase) pair meets exactly
    once because a purchase owns exactly one band. A plan guard asserts
    no CartesianProduct/BroadcastNestedLoopJoin survives."""
    ev = table(spark, sf_dir, "events")
    band = lambda c: F.floor(F.unix_timestamp(c) / 300)  # noqa: E731
    err = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("ets"),
            F.explode(F.array(band(F.col("ts")), band(F.col("ts")) - 1)).alias("b"),
        )
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").alias("pts"), "value", band(F.col("ts")).alias("b")
    )
    return (
        err.join(pur, "b")
        .where(
            (F.col("pts") >= F.col("ets") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("pts") < F.col("ets"))
        )
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("purchase_value"),
        )
    )


# --- Dyadic EWMA + rolling z-score anomaly lanes -------------------------
#
# Both lanes canonicalize events.value to exact integer cents (the
# functions/money.py floor-half-up discipline; value is exact to 2
# decimals in this schema) so every windowed moment is EXACT BIGINT
# arithmetic — float accumulation order never reaches the hashed output.
# The only float ops in either lane are one fixed IEEE expression tree
# over identical integers (divide / sqrt, both correctly rounded by IEEE
# 754), the x4_bm25/x5_hll determinism recipe.

EWMA_K = 16  # lags carried (incl. current); truncation error <= 2^-16
# Integer weights 2^(K-1-k): current row 2^15 ... lag 15 weight 1.  The
# normalized weighted mean equals the alpha=1/2 EWMA restricted to the
# last K observations, renormalized over the lags actually present.
EWMA_WEIGHTS = [1 << (EWMA_K - 1 - k) for k in range(EWMA_K)]

ZSCORE_WIN = 20  # trailing window (rows), current row excluded
ZSCORE_MIN_N = 10  # minimum trailing observations before flagging
ZSCORE_Z2 = 9  # z^2 threshold (|z| > 3)


def _ewma_body(tbl: str) -> str:
    """The ENTIRE ts_ewma query as ONE engine-neutral SQL text (LAG /
    CASE / CAST only — valid verbatim in Spark SQL and DuckDB), so the
    oracle and the Spark twin cannot drift, and the Spark side skips the
    ~2 s of per-build py4j Column calls a 30-term tree costs (the
    x2_simhash r3 lesson).  Inline OVER (not a named WINDOW clause —
    Spark SQL portability); Catalyst collapses the identical window specs
    into one Window node."""
    win = "(PARTITION BY user_id ORDER BY user_id, event_id)"
    lags = ",\n                   ".join(
        f"LAG(c, {k}) OVER {win} AS c{k}" for k in range(1, EWMA_K)
    )
    num = " + ".join(
        [f"{EWMA_WEIGHTS[0]} * c"]
        + [
            f"CASE WHEN c{k} IS NOT NULL THEN {EWMA_WEIGHTS[k]} * c{k} ELSE 0 END"
            for k in range(1, EWMA_K)
        ]
    )
    den = " + ".join(
        [f"{EWMA_WEIGHTS[0]}"]
        + [
            f"CASE WHEN c{k} IS NOT NULL THEN {EWMA_WEIGHTS[k]} ELSE 0 END"
            for k in range(1, EWMA_K)
        ]
    )
    return dedent(
        f"""
        WITH e AS (
            SELECT user_id, event_id, {cents_sql("value")} AS c
            FROM {tbl}
        ),
        l AS (
            SELECT user_id, event_id, c,
                   {lags}
            FROM e
        )
        SELECT user_id, event_id,
               CAST({num} AS BIGINT) AS ewma_num,
               CAST({den} AS BIGINT) AS ewma_den,
               CAST(({num}) AS DOUBLE) / CAST(({den}) AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS ewma
        FROM l
        """
    )


@query("ts_ewma", oracle=_ewma_body("events"), tags=("X5", "timeseries", "ewma"))
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2) of each user's
    event values, as ONE pass of window LAGs — the smoothing primitive
    behind rate limiting, trend detection, and metric dashboards.

    Determinism design: a recursive EWMA (s_n = a*x_n + (1-a)*s_{n-1})
    carries a float accumulation whose error depends on evaluation order;
    instead the dyadic alpha makes every weight an exact power of two, so
    the K-lag truncated EWMA is a ratio of two EXACT BIGINT sums
    (num = sum w_k * cents_k, den = sum of weights present, w_k =
    2^(K-1-k)).  Truncation at K=16 lags differs from the infinite
    recursion by < 2^-16 of the oldest mass — and, unlike the recursion,
    is exactly reproducible on any engine.  The emitted ``ewma`` double
    is one fixed IEEE tree (int/int/100) over those integers.

    Scale shape: ONE hash exchange on user_id; all 15 LAGs ride the same
    window sort.  Max num magnitude = max_cents * (2^16 - 1) ~ 3.2e9 —
    no overflow headroom concerns at any corpus size (window width is
    fixed, not data-dependent).  Ordering contract: (user_id, event_id)
    — event ids are unique and time-ordered within a user in this schema,
    making the frame deterministic under ties (reference consumes frames
    in arrival order, qp/dl_k_to_ss.py micro-batch loop)."""
    ev = table(spark, sf_dir, "events")
    ev.select("user_id", "event_id", "value").createOrReplaceTempView("_ewma_events")
    return spark.sql(_ewma_body("_ewma_events"))


def _zscore_oracle() -> str:
    return dedent(
        f"""
        WITH e AS (
            SELECT user_id, event_id, {cents_sql("value")} AS c
            FROM events
        ),
        w AS (
            SELECT user_id, event_id, c,
                   CAST(COUNT(c) OVER win AS BIGINT) AS n,
                   CAST(SUM(c) OVER win AS BIGINT) AS s,
                   CAST(SUM(c * c) OVER win AS BIGINT) AS ss
            FROM e WINDOW win AS (PARTITION BY user_id ORDER BY user_id, event_id
                                  ROWS BETWEEN {ZSCORE_WIN} PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id, c AS cents, n,
               c * n - s AS dev,
               n * ss - s * s AS var2,
               CAST(c * n - s AS DOUBLE) / SQRT(CAST(n * ss - s * s AS DOUBLE)) AS z
        FROM w
        WHERE n >= {ZSCORE_MIN_N}
          AND (c * n - s) * (c * n - s) > {ZSCORE_Z2} * (n * ss - s * s)
        """
    )


@query(
    "ts_rolling_zscore",
    oracle=_zscore_oracle(),
    tags=("X5", "timeseries", "anomaly"),
)
def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value deviates
    more than 3 population standard deviations from the trailing window of
    the SAME user's previous {ZSCORE_WIN} events — the out-of-distribution
    gate of metrics monitoring and fraud triage (the reference's only
    outlier logic is a fixed score threshold, qp/dl_k_to_ss.py P7; this is
    its adaptive per-entity generalization).

    Exact-integer design: with x, n, s=SUM, ss=SUMSQ all BIGINT over
    cents, z^2 > 9 is EXACTLY (x*n - s)^2 > 9*(n*ss - s^2) — the anomaly
    DECISION is pure integer arithmetic, immune to float summation order,
    and the emitted z is one fixed IEEE tree (divide + correctly-rounded
    sqrt) over those same integers.  Magnitude audit: cents <= ~5e4, so
    dev^2 <= (5e4 * 20)^2 = 1e12 and 9*var2 <= 2e14 — five decades of
    BIGINT headroom, independent of corpus size (the window is fixed
    width, so magnitudes do NOT grow with scale; only user count does).

    Scale shape: one hash exchange on user_id, one window sort shared by
    all three running moments, then a stateless filter.  No skew concern:
    the window is per-user and bounded.  Current row EXCLUDED from its
    own baseline (1 PRECEDING) — a spike must not mask itself."""
    ev = table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select("user_id", "event_id", c.alias("c"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("user_id", "event_id")
        .rowsBetween(-ZSCORE_WIN, -1)
    )
    stats = base.select(
        "user_id",
        "event_id",
        "c",
        F.count("c").over(win).alias("n"),
        F.sum("c").over(win).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("ss"),
    )
    dev = F.col("c") * F.col("n") - F.col("s")
    var2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        stats.where(
            (F.col("n") >= ZSCORE_MIN_N) & (dev * dev > F.lit(ZSCORE_Z2) * var2)
        )
        .select(
            "user_id",
            "event_id",
            F.col("c").alias("cents"),
            "n",
            dev.alias("dev"),
            var2.alias("var2"),
            (dev.cast("double") / F.sqrt(var2.cast("double"))).alias("z"),
        )
    )
