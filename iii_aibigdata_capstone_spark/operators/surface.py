"""Remaining §2 expression/projection/window/structural surface (SURVEY.md):
P4-P6/P10 projection ops, E5/E11/E14-E16 scalar functions, W6 natural sort,
T2/T3 flatten ops, J4 limb-candidate join shape, A6 multi-scale mean.

All pure Catalyst expressions over the driver's parquet tables — no UDFs,
fully oracle-checked. Each query notes the reference lines it re-expresses.
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
    "p10_array_pick",
    oracle=dedent(
        """
        SELECT l_orderkey, l_linenumber,
               ROUND(([l_tax, l_discount, l_quantity / 100.0])[(l_linenumber % 3) + 1],
                     6) AS picked
        FROM lineitem
        WHERE l_quantity IS NOT NULL
        """
    ),
    tags=("P10", "P4", "P5", "P6"),
)
def p10_array_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 confidence-pick (`probability[prediction]`, qp/ml_k_to_ss.py:45-49)
    as `element_at` on an array column with a data-dependent 1-based index;
    P4/P5 column drop + narrow select (qp/ml_model.py:15-17, ml_k_to_ss.py:
    31-32); P9-style null guard. P6's empty-batch guard (ml_k_to_ss.py:17-18)
    is subsumed by Structured Streaming's no-data handling — nothing to
    express in batch."""
    li = table(spark, sf_dir, "lineitem")
    arr = F.array(F.col("l_tax"), F.col("l_discount"), F.col("l_quantity") / 100.0)
    return (
        li.where(F.col("l_quantity").isNotNull())
        .withColumn("picked", F.round(F.element_at(arr, (F.col("l_linenumber") % 3 + 1).cast("int")), 6))
        .drop("l_shipdate", "l_extendedprice")  # P4: drop before downstream
        .select("l_orderkey", "l_linenumber", "picked")  # P5: narrow select
    )


@query(
    "e_string_label_surface",
    oracle=dedent(
        """
        SELECT p_partkey,
               SUBSTRING(p_name, 1, LENGTH(p_name) - 1) AS trimmed,
               LIST_POSITION([CAST(p_size AS DOUBLE), p_retailprice / 100.0,
                              CAST(LENGTH(p_name) AS DOUBLE)],
                             LIST_MAX([CAST(p_size AS DOUBLE), p_retailprice / 100.0,
                                       CAST(LENGTH(p_name) AS DOUBLE)])) AS argmax_idx,
               p_size AS x1, p_size + (p_partkey % 7) AS x2,
               p_partkey % 50 AS y1, p_partkey % 50 + (p_partkey % 11) AS y2,
               CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS bin_label,
               CASE WHEN p_size % 10 = 0 THEN 0 ELSE p_size % 10 END AS digit_label
        FROM part
        """
    ),
    tags=("E5", "E14", "E15", "E16"),
)
def e_string_label_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 string slice (qp/ml_source.py:7-8), E14 argmax over a value array
    (detect.py:116), E15 SVHN-style annotation unpack left/top/width/height ->
    corners (annotation.py:15-33), E16 binary-label collapse + 10->0 remap
    (preprocess.py:56-65) — one scalar projection, no shuffle."""
    p = table(spark, sf_dir, "part")
    vals = F.array(
        F.col("p_size").cast("double"),
        F.col("p_retailprice") / 100.0,
        F.length("p_name").cast("double"),
    )
    return p.select(
        "p_partkey",
        F.substring(F.col("p_name"), 1, F.length("p_name") - 1).alias("trimmed"),
        F.array_position(vals, F.array_max(vals)).alias("argmax_idx"),
        F.col("p_size").alias("x1"),
        (F.col("p_size") + F.col("p_partkey") % 7).alias("x2"),
        (F.col("p_partkey") % 50).alias("y1"),
        (F.col("p_partkey") % 50 + F.col("p_partkey") % 11).alias("y2"),
        F.when(F.col("p_size") > 25, 1).otherwise(0).alias("bin_label"),
        F.when(F.col("p_size") % 10 == 0, 0).otherwise(F.col("p_size") % 10).alias("digit_label"),
    )


@query(
    "e11_linspace_sample",
    oracle=dedent(
        """
        SELECT s_suppkey, UNNEST(RANGE(0, 10)) AS i,
               ROUND(s_acctbal + UNNEST(RANGE(0, 10))
                     * ((s_acctbal + s_suppkey) - s_acctbal) / 9.0, 6) AS x
        FROM supplier
        """
    ),
    tags=("E11",),
)
def e11_linspace_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 `linspace` (pi/dl_k_to_ss.py:155-156): 10 evenly spaced samples
    between two endpoints per row, as sequence(0,9) + arithmetic — the exact
    pattern the PAF line integral samples along a limb segment."""
    s = table(spark, sf_dir, "supplier")
    lo = F.col("s_acctbal")
    hi = F.col("s_acctbal") + F.col("s_suppkey")
    return (
        s.select("s_suppkey", lo.alias("lo"), hi.alias("hi"))
        .select("s_suppkey", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"), "lo", "hi")
        .select(
            "s_suppkey",
            "i",
            F.round(F.col("lo") + F.col("i") * (F.col("hi") - F.col("lo")) / 9.0, 6).alias("x"),
        )
    )


@query(
    "w6_natural_sort",
    oracle=dedent(
        r"""
        WITH names AS (
            SELECT DISTINCT 'img' || (event_id % 120) || '_' || event_type || '.jpg' AS fname
            FROM events
        )
        SELECT fname,
               ROW_NUMBER() OVER (
                   ORDER BY ARRAY_TO_STRING(
                       LIST_TRANSFORM(REGEXP_EXTRACT_ALL(fname, '\d+|\D+'),
                                      c -> CASE WHEN REGEXP_MATCHES(c, '^\d+$')
                                                THEN LPAD(c, 12, '0') ELSE c END),
                       ''), fname) AS rank
        FROM names
        """
    ),
    tags=("W6", "S10"),
)
def w6_natural_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 natural (alphanumeric-chunk) filename sort (file_io.py:15-32):
    split the name into digit / non-digit chunks, zero-pad the numeric
    chunks, sort on the rebuilt key — 'img2' before 'img10'. The sort key is
    computed per row; the only wide op is the final rank."""
    ev = table(spark, sf_dir, "events")
    fname = F.concat(
        F.lit("img"), (F.col("event_id") % 120).cast("string"),
        F.lit("_"), F.col("event_type"), F.lit(".jpg"),
    )
    names = ev.select(fname.alias("fname")).distinct()
    chunks = F.regexp_extract_all(F.col("fname"), F.lit(r"\d+|\D+"), 0)
    key = F.array_join(
        F.transform(
            chunks,
            lambda c: F.when(c.rlike(r"^\d+$"), F.lpad(c, 12, "0")).otherwise(c),
        ),
        "",
    )
    w = Window.orderBy(key, F.col("fname"))
    return names.select("fname", F.row_number().over(w).alias("rank"))


@query(
    "t3_pixel_reshape",
    oracle=dedent(
        """
        SELECT vec_id, UNNEST(RANGE(1, LEN(embedding) + 1)) AS pos,
               ROUND(UNNEST(embedding::DOUBLE[]), 6) AS val
        FROM embeddings
        WHERE vec_id % 10 = 0
        """
    ),
    tags=("T2", "T3"),
)
def t3_pixel_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 image->pixel-rows reshape ((H,W,3) -> (H*W,3), dl_k_to_ss.py:326)
    and T2 list-of-lists flatten (dl_k_to_ss.py:192): `posexplode` of the
    array column — the relational form that feeds the histogram/mode chain
    (A3-A5) and the KMeans color path (M4)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") % 10 == 0)
        .select("vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"))
        .select("vec_id", (F.col("pos") + 1).alias("pos"), F.round("val", 6).alias("val"))
    )


@query(
    "j4_limb_candidates",
    oracle=dedent(
        """
        WITH peaks AS (
            SELECT l_orderkey AS image_id, l_linenumber AS peak_id,
                   l_linenumber % 2 AS part,
                   l_quantity AS x, l_discount * 100 AS y
            FROM lineitem
        )
        SELECT a.image_id, a.peak_id AS a, b.peak_id AS b,
               ROUND(1.0 / (1.0 + SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2))), 6) AS score
        FROM peaks a JOIN peaks b
          ON a.image_id = b.image_id AND a.part = 1 AND b.part = 0
        WHERE SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2)) < 40
          AND 1.0 / (1.0 + SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2))) > 0.03
        """
    ),
    tags=("J4", "E8", "E13"),
)
def j4_limb_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 all-pairs limb-connection candidates (dl_k_to_ss.py:137-173):
    per image, every part-A peak x every part-B peak, scored by proximity
    (E8 Euclidean norm stands in for the PAF integral, which needs the image
    tensor — see e12_paf_integral for the UDF form), filtered by two
    criteria (E13). The equi prefix on image_id bounds the cross product —
    the same banding that keeps J3 viable at scale."""
    li = table(spark, sf_dir, "lineitem")
    peaks = li.select(
        F.col("l_orderkey").alias("image_id"),
        F.col("l_linenumber").alias("peak_id"),
        (F.col("l_linenumber") % 2).alias("part"),
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") * 100).alias("y"),
    )
    a = peaks.where(F.col("part") == 1).alias("a")
    b = peaks.where(F.col("part") == 0).alias("b")
    dist = F.sqrt(
        F.pow(F.col("a.x") - F.col("b.x"), 2) + F.pow(F.col("a.y") - F.col("b.y"), 2)
    )
    score = 1.0 / (1.0 + dist)
    return (
        a.join(b, F.col("a.image_id") == F.col("b.image_id"))
        .where((dist < 40) & (score > 0.03))
        .select(
            F.col("a.image_id").alias("image_id"),
            F.col("a.peak_id").alias("a"),
            F.col("b.peak_id").alias("b"),
            F.round(score, 6).alias("score"),
        )
    )


@query(
    "x5_pivot_status_year",
    oracle=dedent(
        """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders
        GROUP BY EXTRACT(YEAR FROM o_orderdate)
        """
    ),
    tags=("X5",),
)
def x5_pivot_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per year x status, via the native ``pivot()``
    (which plans as a single aggregate with conditional counts — exactly
    the CASE-WHEN form the oracle spells out; explicit value list so no
    extra distinct pass over the data)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "order_year",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


@query(
    "w8_window_frames",
    oracle=dedent(
        """
        SELECT user_id, event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                   AS rolling3,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS n_last_hour
        FROM events
        WHERE user_id % 20 = 0
        """
    ),
    tags=("W1", "X5"),
)
def w8_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames: ROWS BETWEEN rolling and running sums and a
    RANGE BETWEEN (value-based, last-hour) count — the frame kinds beyond
    w1's default RANGE frame. Event-time ordering with a deterministic
    event_id tiebreak for the ROWS frames (ROWS is order-sensitive; RANGE
    is not)."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    by_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    by_epoch = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(by_time.rowsBetween(-2, 0)), 4).alias("rolling3"),
        F.round(
            F.sum("value").over(by_time.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running"),
        F.count(F.lit(1)).over(by_epoch).alias("n_last_hour"),
    )


@query(
    "x5_group_quantiles",
    oracle=dedent(
        """
        SELECT event_type,
               ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90,
               ROUND(QUANTILE_CONT(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
        """
    ),
    tags=("A1", "X5"),
)
def x5_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (`percentile`, the
    latency-report shape: p50/p90/p99). `percentile_approx` is the
    sketch to swap in when a full sort per group is too expensive —
    exercised rows-only in x5_approx_count_distinct's family."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "x5_correlated_subquery",
    oracle=dedent(
        """
        SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS total
        FROM orders o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    ),
    tags=("X5", "J1"),
)
def x5_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above 2x their customer's
    average) written as SQL and left to Catalyst's subquery decorrelation
    — it plans as an aggregate + self-join, the rewrite you'd otherwise
    hand-write."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_corr_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS total
        FROM _corr_orders o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM _corr_orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "x5_nullsafe_join",
    oracle=dedent(
        """
        WITH l AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderkey % 5 END AS grp
            FROM orders
        ),
        r AS (
            SELECT DISTINCT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                 ELSE o_orderkey % 5 END AS grp
            FROM orders
        )
        SELECT l.grp, COUNT(*) AS n
        FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
        GROUP BY l.grp
        """
    ),
    tags=("X5", "P9"),
)
def x5_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping — the semantics difference that
    silently loses rows when a dedup/join key is nullable."""
    o = table(spark, sf_dir, "orders")
    grp_l = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
        F.col("o_orderkey") % 5
    )
    grp_r = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(
        F.col("o_orderkey") % 5
    )
    left = o.select(grp_l.alias("grp"))
    right = o.select(grp_r.alias("grp_r")).distinct()
    return (
        left.join(right, F.col("grp").eqNullSafe(F.col("grp_r")))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "x5_map_type_ops",
    oracle=dedent(
        """
        WITH per_type AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id, event_type, n
        FROM per_type
        WHERE user_id % 50 = 0 AND n >= 2
        """
    ),
    tags=("X5",),
)
def x5_map_type_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per-user event-type counts packed into a map
    column (`map_from_entries` after a groupBy-collect), pruned JVM-side
    with `map_filter`, then exploded back to rows. The relational oracle
    never sees the map — proving pack -> filter -> unpack loses nothing.
    Maps are absent from the reference (SURVEY §1) but are the natural
    schema for ragged per-entity feature bags at scale."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    packed = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("n")))
        ).alias("counts")
    )
    pruned = packed.select(
        "user_id",
        F.map_filter(F.col("counts"), lambda k, v: v >= 2).alias("counts"),
    )
    return pruned.select(
        "user_id", F.explode(F.col("counts")).alias("event_type", "n")
    )


@query("s10_stratified_sample", oracle=None, tags=("S10",))
def s10_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10's sampling half (file_io.py:15-32 random.sample of listed files):
    seeded per-stratum Bernoulli sampling (`sampleBy`) over documents by
    language — the corpus-subsampling primitive (e.g. language rebalancing
    before training). Seeded so reruns are identical; rows-only (Spark's
    sampler and any SQL oracle draw different sequences by construction).
    Tests assert determinism and per-stratum fraction tolerance."""
    docs = table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {lang: (0.5 if i % 2 == 0 else 0.2) for i, lang in enumerate(sorted(langs))}
    sample = docs.sampleBy("lang", fractions=fractions, seed=42)
    return sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("chars_sampled"),
    )


@query(
    "x5_intersect_all_months",
    oracle=dedent(
        """
        SELECT EXTRACT(MONTH FROM o_orderdate) AS m FROM orders WHERE o_custkey % 2 = 0
        INTERSECT ALL
        SELECT EXTRACT(MONTH FROM o_orderdate) AS m FROM orders WHERE o_custkey % 2 = 1
        """
    ),
    tags=("X5",),
)
def x5_intersect_all_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (`intersectAll` — each month kept
    min(count_left, count_right) times), the multiset counterpart of
    x5_intersect_years' set form."""
    o = table(spark, sf_dir, "orders")
    m = F.month("o_orderdate").cast("long").alias("m")
    left = o.where(F.col("o_custkey") % 2 == 0).select(m)
    right = o.where(F.col("o_custkey") % 2 == 1).select(m)
    return left.intersectAll(right)


@query(
    "x5_except_all_months",
    oracle=dedent(
        """
        SELECT EXTRACT(MONTH FROM o_orderdate) AS m FROM orders WHERE o_custkey % 2 = 0
        EXCEPT ALL
        SELECT EXTRACT(MONTH FROM o_orderdate) AS m FROM orders WHERE o_custkey % 2 = 1
        """
    ),
    tags=("X5",),
)
def x5_except_all_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (`exceptAll` — each month survives
    max(count_left - count_right, 0) times)."""
    o = table(spark, sf_dir, "orders")
    m = F.month("o_orderdate").cast("long").alias("m")
    left = o.where(F.col("o_custkey") % 2 == 0).select(m)
    right = o.where(F.col("o_custkey") % 2 == 1).select(m)
    return left.exceptAll(right)


@query(
    "e17_json_extract",
    oracle=dedent(
        """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
        GROUP BY event_type
        """
    ),
    tags=("E1", "S9", "X4"),
)
def e17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (`from_json` with a
    declared schema — schema-on-read with the schema stated, §1 contract;
    `get_json_object` would re-parse per path). Filter + aggregate on the
    extracted field, all JVM-side."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "a6_multiscale_mean",
    oracle=dedent(
        """
        WITH flat AS (
            SELECT vec_id // 4 AS gid,
                   UNNEST(RANGE(1, LEN(embedding) + 1)) AS pos,
                   UNNEST(embedding::DOUBLE[]) AS val
            FROM embeddings
        )
        SELECT gid, pos, ROUND(AVG(val), 6) AS mean_val
        FROM flat GROUP BY gid, pos
        """
    ),
    tags=("A6",),
)
def a6_multiscale_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 multi-scale tensor mean (dl_k_to_ss.py:74-105: running sum / n over
    4 scales): treat each run of 4 consecutive embeddings as one image's 4
    scale outputs and average element-wise — posexplode + groupBy(gid, pos).
    Map-side partial aggregation makes this one shuffle of (gid, pos)
    partials regardless of tensor count."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            (F.col("vec_id") / 4).cast("long").alias("gid"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
        )
        .groupBy("gid", (F.col("pos") + 1).alias("pos"))
        .agg(F.round(F.avg("val"), 6).alias("mean_val"))
    )


@query(
    "x5_scd2_apply",
    oracle=dedent(
        """
        WITH changes AS (
            SELECT c_custkey, ROUND(c_acctbal + 100, 2) AS new_bal
            FROM customer WHERE c_custkey % 10 = 0
        )
        SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal,
               0 AS valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL THEN 1 END AS valid_to
        FROM customer c LEFT JOIN changes ch USING (c_custkey)
        UNION ALL
        SELECT c_custkey, new_bal AS acctbal, 1 AS valid_from,
               CAST(NULL AS INTEGER) AS valid_to
        FROM changes
        """
    ),
    tags=("X5", "J1"),
)
def x5_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 apply — the MERGE-shaped update a
    warehouse dimension needs, expressed engine-agnostically as
    left-join + union (close the current row of every changed key, append
    the new version with an open validity interval). With a transactional
    table format this is one MERGE INTO; the plan shape — broadcast the
    (small) changes batch against the (large) dimension — is identical."""
    cust = table(spark, sf_dir, "customer")
    changes = (
        cust.where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", F.round(F.col("c_acctbal") + 100, 2).alias("new_bal"))
        # the changes batch is consumed twice (broadcast merge side + the
        # appended new versions) — materialize it once, as a real MERGE
        # source would be
        .localCheckpoint(eager=False)
    )
    closed_or_open = (
        cust.join(F.broadcast(changes), "c_custkey", "left")
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.lit(0).alias("valid_from"),
            F.when(F.col("new_bal").isNotNull(), 1).cast("int").alias("valid_to"),
        )
    )
    new_versions = changes.select(
        "c_custkey",
        F.col("new_bal").alias("acctbal"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    return closed_or_open.unionByName(new_versions)


@query(
    "s10_hash_stratified",
    oracle=dedent(
        """
        WITH rates AS (
            SELECT lang,
                   CASE WHEN (ROW_NUMBER() OVER (ORDER BY lang) - 1) % 2 = 0
                        THEN 500 ELSE 200 END AS rate_pm
            FROM (SELECT DISTINCT lang FROM documents)
        ),
        kept AS (
            SELECT d.lang, d.n_chars, r.rate_pm
            FROM documents d JOIN rates r USING (lang)
            WHERE CAST('0x' || SUBSTR(MD5(d.lang || ':' ||
                       CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                  % 1000 < r.rate_pm
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
               MIN(rate_pm) AS rate_pm
        FROM kept GROUP BY lang
        """
    ),
    tags=("S10", "X1", "sampling"),
)
def s10_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling with a FULL oracle — the
    content-addressed twin of ``s10_stratified_sample`` (which keeps
    Spark's native seeded ``sampleBy`` and is rows-only by construction).
    Keep-decision = md5(lang:doc_id) bucket < per-stratum rate in
    integer permille — exactly reproducible across engines, reruns,
    RESHARDING and cluster sizes (a seeded sampler's draw sequence is
    none of those), which is why real corpus pipelines sample by content
    hash. Per-stratum rates alternate 50%/20% over the alphabetical
    stratum index, mirroring the native variant's fraction map; the
    tiny distinct-stratum rate table broadcasts. One pruned scan, one
    final aggregation shuffle."""
    docs = table(spark, sf_dir, "documents")
    w = Window.orderBy("lang")  # distinct-stratum table: a handful of rows
    rates = (
        docs.select("lang")
        .distinct()
        .withColumn("idx", F.row_number().over(w) - 1)
        .select(
            "lang",
            F.when(F.col("idx") % 2 == 0, 500).otherwise(200).alias("rate_pm"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    kept = docs.join(F.broadcast(rates), "lang").where(bucket < F.col("rate_pm"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("chars_sampled"),
        F.min("rate_pm").alias("rate_pm"),
    )
