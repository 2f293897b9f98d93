"""Warehouse-style analytical queries + corpus/training-data operators.

Two groups, both extensions beyond the reference surface (SURVEY.md §2.12,
BASELINE.json north star):

1. TPC-H-shaped analytical queries (q4/q6/q14/q18/q19 analogues on the
   driver's star schema) — they pin the relational core's plan quality:
   predicate pushdown to the parquet scan, semi-join planning for EXISTS,
   conditional aggregation, group-HAVING prefilter before a join, and a
   disjunction-of-conjunctions predicate that Catalyst must CNF-convert to
   push the brand/size prefilter into the part scan.

2. Clickstream/corpus pipeline operators: gap sessionization, cohort
   retention, deterministic weighted sampling (A-ES), content-hash dataset
   splits, Zipf lexical fit, and mergeable HLL sketch rollups — the
   everyday operators of a 100 TB training-data pipeline.

Determinism rule: anything "random" derives from md5(text) so Spark and
the DuckDB oracle agree bit-for-bit (content-addressed, reshard-stable);
`F.rand` never appears in an oracle-checked query.
"""

from __future__ import annotations

import math
from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table, tables
from ..functions.money import cents_col, cents_sql
from ..registry import QuerySpec, make_registrar
from .textual import QUALITY_FEATURES_SQL, STOPWORDS

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q6_forecast_revenue",
    oracle=dedent(
        """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    ),
    tags=("A2", "P7", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure filter + global aggregate. The entire
    predicate set is pushdown-able (`PushedFilters` on the scan shows
    shipdate/discount/quantity); the agg is map-side partial + one 1-row
    exchange — the cheapest possible shape at any scale."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q4_order_priority",
    oracle=dedent(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: EXISTS → left-semi join with a non-equi residual
    (l_shipdate > o_orderdate). The date filter prunes orders before the
    join, so the semi join's build side is the quarter, not the table."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    quarter = o.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    late = quarter.join(
        li,
        (quarter.o_orderkey == li.l_orderkey) & (li.l_shipdate > quarter.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q14_promo_share",
    oracle=dedent(
        """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        """
    ),
    tags=("A2", "J1", "tpch"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: conditional aggregation over a fact⋈dim join.
    The month filter cuts lineitem before the join; part is joined on its
    key (AQE broadcasts it at test scale; at 100 TB it shuffles on
    p_partkey — no code change either way)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    month = li.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    joined = month.join(p, month.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)))
    return joined.agg(
        F.round(100.0 * promo / F.sum(_rev()), 4).alias("promo_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q18_big_orders",
    oracle=dedent(
        """
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        """
    ),
    tags=("A2", "J1", "A10", "tpch"),
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue (large-volume orders): group-HAVING on the fact
    table FIRST, then join the (tiny) surviving key set to orders and
    customer. Aggregating before joining is the scale-critical ordering —
    the join input shrinks from |lineitem| to |big orders|."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "q19_bracket_disjunction",
    oracle=dedent(
        """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 5 AND 20
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 40
               AND l_quantity BETWEEN 20 AND 50)
        """
    ),
    tags=("P7", "J1", "tpch"),
)
def q19_bracket_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: disjunction of conjunctive brackets across both
    join sides. Catalyst CNF-converts the OR so the part-only disjuncts
    (brand ∈ {1,3,5}, size ≤ 40) and the lineitem-only disjunct
    (l_quantity ≤ 50) push below the join — the join sees prefiltered
    inputs, not the raw tables."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(10, 40)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.where(bracket).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "x9_sessionize",
    oracle=dedent(
        """
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        ),
        per_sess AS (
            SELECT user_id, session_id, COUNT(*) AS n,
                   CAST(EPOCH_US(MAX(ts) - MIN(ts)) AS BIGINT) AS dur_us
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n) AS BIGINT) AS n_events,
               ROUND(AVG(n), 6) AS avg_session_events,
               MAX(dur_us) AS max_session_us
        FROM per_sess GROUP BY user_id
        """
    ),
    tags=("X5", "sessionize"),
)
def x9_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >30-min gap
    (lag + running sum of session starts — the standard gaps-and-islands
    formulation). One hash shuffle on user_id serves both windows and the
    two group-bys (same partitioning, reused); ties broken by event_id so
    the session assignment is deterministic."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lag_us = F.lag(us).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(lag_us.isNull() | (us - lag_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.round(F.avg("n"), 6).alias("avg_session_events"),
        F.max("dur_us").alias("max_session_us"),
    )


@query(
    "x9_cohort_retention",
    oracle=dedent(
        """
        WITH first_seen AS (
            SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_ts
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS act_ts FROM events
        )
        SELECT CAST(f.cohort_ts AS DATE) AS cohort_week,
               CAST(DATE_DIFF('day', f.cohort_ts, a.act_ts) // 7 AS INTEGER)
                   AS week_offset,
               COUNT(*) AS n_users
        FROM first_seen f JOIN activity a USING (user_id)
        GROUP BY 1, 2
        """
    ),
    tags=("X5", "cohort"),
)
def x9_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted in
    every subsequent week they return (distinct user-week activity ⋈ the
    per-user cohort). The cohort table is |users| rows — broadcast to the
    activity side, so the only large shuffle is the distinct."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_ts")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_ts")
    ).distinct()
    joined = activity.join(F.broadcast(first_seen), "user_id")
    return joined.groupBy(
        F.to_date("cohort_ts").alias("cohort_week"),
        F.floor(
            F.datediff(F.to_date("act_ts"), F.to_date("cohort_ts")) / 7
        ).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


def _md5_bucket(col: str, mod: int) -> F.Column:
    """First 8 hex digits of md5 as a uniform integer in [0, mod) —
    content-addressed pseudo-randomness both engines compute identically
    (the split survives resharding/repartitioning, unlike rand(seed))."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long") % mod
    )


@query(
    "x9_weighted_sample",
    oracle=dedent(
        """
        WITH scored AS (
            SELECT doc_id, source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   (CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % 999983 + 1)
                       / 999984.0 AS u
            FROM documents
        ),
        keyed AS (
            SELECT doc_id, source, n_tokens,
                   POW(u, 1.0 / n_tokens) AS k
            FROM scored
        )
        SELECT source, doc_id, n_tokens, ROUND(k, 6) AS sample_key, rk AS sample_rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY k DESC, doc_id) AS rk
              FROM keyed)
        WHERE rk <= 5
        """
    ),
    tags=("X1", "X4", "sampling"),
)
def x9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k=5 per source, weight =
    token count — the A-ES / exponential-sort scheme (key = u^(1/w), keep
    top-k). Distributed shape: one scan computes keys map-side, one
    shuffle on source ranks them; u is content-hash-derived so the sample
    is deterministic and oracle-checkable (a real pipeline swaps in a
    seeded hash). Mergeable: per-partition top-k pre-prune would bound
    the shuffle at 100 TB (Spark's window top-k does this via rank
    pushdown in 3.5+)."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    u = (_md5_bucket("text", 999983) + 1) / 999984.0
    keyed = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.pow(u, 1.0 / n_tokens.cast("double")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "source",
            "doc_id",
            "n_tokens",
            F.round("k", 6).alias("sample_key"),
            F.col("rk").alias("sample_rank"),
        )
    )


@query(
    "x9_hash_split",
    oracle=dedent(
        """
        WITH h AS (
            SELECT source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % 100 AS b
            FROM documents
        )
        SELECT source,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM h GROUP BY 1, 2
        """
    ),
    tags=("X1", "X4", "split"),
)
def x9_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/val/test split (80/10/10 by md5 bucket):
    assignment depends only on the text, so it is stable under resharding,
    re-ingestion, and dedup reruns — the property rand(seed) lacks (seeded
    rand is partition-layout-dependent). Pure map + one tiny aggregation."""
    docs = table(spark, sf_dir, "documents")
    b = _md5_bucket("text", 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        docs.select(
            "source",
            split,
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


@query(
    "x4_zipf_fit",
    oracle=dedent(
        """
        WITH tf AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
        ),
        counts AS (SELECT term, COUNT(*) AS freq FROM tf GROUP BY term),
        ranked AS (
            SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank
            FROM counts
        )
        SELECT COUNT(*) AS n_terms,
               CAST(SUM(freq) AS BIGINT) AS n_tokens,
               ROUND(REGR_SLOPE(LN(freq), LN(rank)), 6) AS zipf_slope,
               ROUND(REGR_INTERCEPT(LN(freq), LN(rank)), 6) AS zipf_intercept,
               ROUND(REGR_R2(LN(freq), LN(rank)), 6) AS zipf_r2
        FROM ranked
        """
    ),
    tags=("X4", "statistics"),
)
def x4_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lexical health check: fit log(freq) ~ log(rank) (Zipf's law;
    natural corpora slope ≈ -1, synthetic/templated corpora deviate).
    Token counting is the only big stage (explode + hash agg, map-side
    partial); the regression runs over the vocabulary, which is tiny
    relative to the corpus, with mergeable regr_* aggregates."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = counts.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term")))
    )
    ln_f, ln_r = F.log(F.col("freq").cast("double")), F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("freq").alias("n_tokens"),
        F.round(F.regr_slope(ln_f, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_f, ln_r), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_f, ln_r), 6).alias("zipf_r2"),
    )


@query(
    "q7_nation_trade",
    oracle=dedent(
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY 1, 2, 3
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue (bilateral trade): a 5-way join where the two
    nation dims broadcast (25 rows at every SF — catalog.ALWAYS_BROADCAST)
    and the pair disjunction lands on the post-broadcast-join rows, so the
    nation filter prunes supplier/customer BEFORE the fact joins. The big
    shuffles are lineitem⋈orders and orders⋈customer on their keys."""
    s, li, o, c, n = tables(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = F.col("supp_nation").isin("NATION_3", "NATION_7") & F.col(
        "cust_nation"
    ).isin("NATION_3", "NATION_7") & (F.col("supp_nation") != F.col("cust_nation"))
    return (
        s.join(n1, s.s_nationkey == F.col("s_nk"))
        .where(F.col("supp_nation").isin("NATION_3", "NATION_7"))
        .join(li, F.col("s_suppkey") == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            c.join(n2, c.c_nationkey == F.col("c_nk")).where(
                F.col("cust_nation").isin("NATION_3", "NATION_7")
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q8_market_share",
    oracle=dedent(
        """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(CASE WHEN n1.n_name = 'NATION_4'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue (national market share): the numerator condition
    rides the aggregation (conditional SUM), NOT a second scan — one pass
    computes a nation's share of a region's revenue per year. region and
    both nation roles broadcast; the region filter prunes customers before
    the orders join."""
    li, s, o, c, n, r = tables(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    asia = F.broadcast(
        r.where(F.col("r_name") == "ASIA").select(F.col("r_regionkey").alias("rk"))
    )
    cust_asia = c.join(n2, c.c_nationkey == F.col("c_nk")).join(
        asia, F.col("c_rk") == F.col("rk")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_asia, o.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_4", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q10_returned_items",
    oracle=dedent(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(c.c_acctbal, 2) AS c_acctbal
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY 1, 2, 3, c.c_acctbal
        ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c.c_custkey
        LIMIT 20
        """
    ),
    tags=("X5", "J1", "W1", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue (top returned-revenue customers): quarter filter
    on orders and returnflag filter on lineitem both push to the scans;
    the global top-20 runs as per-partition top-20 + single-partition
    merge (TakeOrderedAndProject), never a full sort of the aggregate.
    Ties broken by c_custkey so LIMIT is deterministic."""
    c, o, li, n = tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    quarter = o.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    returned = li.where(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(quarter, F.col("c_custkey") == F.col("o_custkey"))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_rev()).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("_rev", 2).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
    )


@query(
    "q13_custdist",
    oracle=dedent(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue (customer order-count distribution): LEFT OUTER
    join with a predicate INSIDE the join condition (not a post-filter —
    that would drop the zero-order customers the query exists to count),
    then a two-level aggregation. The second group-by input is |customers|
    rows, so only the first shuffle is large."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"), "left"
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity",
    oracle=dedent(
        """
        SELECT ROUND(SUM(l.l_extendedprice), 2) AS total_price,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
              FROM lineitem GROUP BY l_partkey) t
          ON t.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < t.half_avg
        """
    ),
    tags=("X5", "A2", "tpch"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue (small-quantity orders): the correlated
    AVG-per-part subquery becomes an explicit pre-aggregation joined back
    on l_partkey — at scale both sides shuffle on partkey once; the
    brand filter broadcasts through the part dim."""
    li, p = tables(spark, sf_dir, "lineitem", "part")
    half_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    brand = p.where(F.col("p_brand") == "Brand#1")
    return (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .join(half_avg, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_sole_late_supplier",
    oracle=dedent(
        """
        WITH lines AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS is_late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                       AS n_late_supp
            FROM lines GROUP BY l_orderkey
        ),
        blamed AS (
            SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lines l
            JOIN per_order p ON l.l_orderkey = p.l_orderkey
            WHERE p.n_supp > 1 AND p.n_late_supp = 1 AND l.is_late = 1
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue (suppliers who kept multi-supplier orders
    waiting), adapted to this schema: late = shipped >60 days after the
    order date (no commit/receipt dates here). The EXISTS/NOT-EXISTS pair
    of the original collapses into one grouped pass over the order's
    lines — per order, count distinct suppliers and distinct LATE
    suppliers; blame the sole late supplier on multi-supplier orders.
    The grouped-subquery-plus-join-back formulation would shuffle the
    joined lines TWICE on l_orderkey (once to aggregate, once to join
    back); windowed collect_set over the same partition key computes both
    per-order counts in ONE shuffle, and the later distinct runs on the
    already-tiny blamed set."""
    li, o, s = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    lines = (
        li.join(o.where(F.col("o_orderstatus") == "F"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
    )
    per_order = Window.partitionBy("l_orderkey")
    counted = lines.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(per_order)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).over(per_order)
        ).alias("n_late_supp"),
    )
    blamed = (
        counted.where(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q22_idle_balances",
    oracle=dedent(
        """
        WITH avg_bal AS (
            SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_mktsegment, COUNT(*) AS numcust,
               ROUND(SUM(c.c_acctbal), 2) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_mktsegment
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue (well-funded customers gone idle), adapted: no
    phone prefixes in this schema, so the cohort is above-average-balance
    customers with no order since 2000. The scalar AVG broadcasts as a
    1-row cross join (no collect — the plan stays fully declarative) and
    the NOT EXISTS is a left-anti join against the date-pruned orders."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = o.where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_DENYLIST = ("the", "a", "table", "value")


@query(
    "x4_denylist_scrub",
    oracle=dedent(
        f"""
        WITH scrubbed AS (
            SELECT source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   t -> t IN {_DENYLIST!r})) AS n_masked,
                   LENGTH(ARRAY_TO_STRING(
                       LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                      t -> CASE WHEN t IN {_DENYLIST!r}
                                                THEN '<mask>' ELSE t END),
                       ' ')) AS scrub_chars
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_masked) AS BIGINT) AS n_masked,
               ROUND(SUM(n_masked) / CAST(SUM(n_tokens) AS DOUBLE), 6) AS mask_rate,
               CAST(SUM(scrub_chars) AS BIGINT) AS scrub_chars
        FROM scrubbed GROUP BY source
        """
    ),
    tags=("X4", "curation"),
)
def x4_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing: mask blocklisted tokens in place and account
    for what was removed — the blocklist-filtering stage of a training
    corpus pipeline. The denylist is a literal IN-set here (broadcast
    hash set inside codegen); a production list of millions of terms
    becomes a broadcast join on token instead. All array ops
    (transform/filter) run JVM-side — no Python in the row path; the
    scrub_chars checksum pins the actual rewritten text, not just counts."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    masked = F.transform(
        toks,
        lambda t: F.when(t.isin(*_DENYLIST), F.lit("<mask>")).otherwise(t),
    )
    per_doc = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*_DENYLIST))).cast("long").alias(
            "n_masked"
        ),
        F.length(F.array_join(masked, " ")).cast("long").alias("scrub_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_masked").alias("n_masked"),
        F.round(F.sum("n_masked") / F.sum("n_tokens").cast("double"), 6).alias(
            "mask_rate"
        ),
        F.sum("scrub_chars").alias("scrub_chars"),
    )


PACK_BIN_TOKENS = 256  # context-bin token budget — ONE definition shared
# by x9_doc_packing and the x9_data_factory packing stage (curation.py)
MANIFEST_SHARDS = 16  # training-shard count — ONE definition shared by
# x9_shard_manifest and the x9_data_factory shard stage (curation.py)


@query(
    "x9_doc_packing",
    oracle=dedent(
        f"""
        WITH toks AS (
            SELECT source, doc_id,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens
            FROM documents
        ),
        binned AS (
            SELECT source, doc_id, n_tokens,
                   CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) // {PACK_BIN_TOKENS} AS INTEGER) AS bin
            FROM toks
        )
        SELECT source, bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               ROUND(SUM(n_tokens) / {PACK_BIN_TOKENS}.0, 6) AS fill_ratio
        FROM binned GROUP BY source, bin
        """
    ),
    tags=("X4", "X1", "packing"),
)
def x9_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents stream into
    256-token context bins in deterministic (source, doc_id) order — bin
    id = tokens-before-me // budget, the contiguous-fill formulation that
    a window cumsum expresses exactly (no sequential loop, unlike
    first-fit-decreasing). One shuffle on source serves the window AND
    the per-bin rollup (same partitioning, exchange reused). fill_ratio
    >1 flags bins whose last doc overflows the budget — the consumer
    truncates or spills those at tokenization time."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    binned = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BIN_TOKENS).cast("int"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / float(PACK_BIN_TOKENS), 6).alias("fill_ratio"),
    )


@query(
    "x4_unigram_logprob",
    oracle=dedent(
        """
        WITH tok AS (
            SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS term
            FROM documents
        ),
        model AS (
            SELECT term,
                   COUNT(*) / CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) AS p
            FROM tok GROUP BY term
        ),
        doc_nll AS (
            SELECT t.doc_id, t.source, AVG(-LN(m.p)) AS nll
            FROM tok t JOIN model m USING (term)
            GROUP BY t.doc_id, t.source
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(nll), 6) AS avg_nll,
               ROUND(MIN(nll), 6) AS min_nll,
               ROUND(MAX(nll), 6) AS max_nll
        FROM doc_nll GROUP BY source
        """
    ),
    tags=("X4", "quality", "curation"),
)
def x4_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, the unigram case: score every
    document by its mean token surprisal −ln p(token) under the corpus's
    own unigram distribution (the cheap stand-in for the perplexity
    filters used to rank web-crawl text). Distributed shape: the token
    table is materialized once (localCheckpoint) because the model and the
    scoring pass both consume it; the model join is deliberately UNhinted —
    a web-scale vocabulary is unbounded (billions of raw tokens), so
    Catalyst broadcasts it while it fits and falls back to a shuffle join
    on term beyond that (a production variant would frequency-cut the
    vocab to make the broadcast unconditional). Probabilities are exact
    corpus frequencies (no smoothing needed: every scored token is in the
    model by construction)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).localCheckpoint(eager=False)
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("total"))
    model = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .select("term", (F.col("freq") / F.col("total")).alias("p"))
    )
    doc_nll = (
        tok.join(model, "term")
        .groupBy("doc_id", "source")
        .agg(F.avg(-F.log("p")).alias("nll"))
    )
    return doc_nll.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


@query(
    "x5_variant_json",
    oracle=dedent(
        """
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS value_total
        FROM events
        GROUP BY 1, 2
        """
    ),
    tags=("X5", "E17", "variant"),
)
def x5_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics on the VARIANT type (Spark 4): parse the
    JSON props column once into a binary variant and extract typed paths
    with variant_get — unlike from_json there is no up-front schema, and
    unlike get_json_object repeated paths don't re-parse the string. At
    scale the parse is the whole cost; it runs map-side in one pass."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", F.floor(k / 10).cast("bigint").alias("k_decade"), "value")
        .groupBy("event_type", "k_decade")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_total"),
        )
    )


def _interleave_bits_spark(x: F.Column, y: F.Column, bits: int = 16) -> F.Column:
    """Z-value: interleave the low ``bits`` of x (even positions) and y
    (odd positions) — a pure closed-form expression, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _interleave_bits_sql(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "x8_zorder_layout",
    oracle=dedent(
        f"""
        WITH keyed AS (
            SELECT ({_interleave_bits_sql('(user_id & 65535)',
                                          '(event_id & 65535)')}) AS zval,
                   user_id, event_id
            FROM events
        )
        SELECT CAST(zval >> 24 AS INTEGER) AS zprefix,
               COUNT(*) AS n_rows,
               MIN(user_id) AS min_user, MAX(user_id) AS max_user,
               MIN(event_id) AS min_event, MAX(event_id) AS max_event
        FROM keyed GROUP BY 1
        """
    ),
    tags=("X5", "layout", "zorder"),
)
def x8_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key (the multi-dimensional layout technique
    behind OPTIMIZE ZORDER): interleave the bits of two filter dimensions
    into one sort key, so range-sorting by it co-locates rows that are
    close in BOTH dimensions — per-file min/max stats then prune scans
    for predicates on either column. The query computes the z-value as a
    closed-form bit expression (32 shift-and-or terms, fully codegen'd,
    no UDF) and reports per-prefix occupancy + per-dimension bounds —
    exactly the file-skipping statistics a writer would get from
    ``df.repartitionByRange(F.col('zval')).sortWithinPartitions('zval')``.
    The proof it works is min/max tightness per bucket in BOTH columns."""
    ev = table(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535)).cast("long")
    y = F.col("event_id").bitwiseAND(F.lit(65535)).cast("long")
    keyed = ev.select(
        _interleave_bits_spark(x, y).alias("zval"), "user_id", "event_id"
    )
    return keyed.groupBy(
        F.shiftright("zval", 24).cast("int").alias("zprefix")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


@query(
    "x4_source_divergence",
    oracle=dedent(
        """
        WITH tok AS (
            SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term
            FROM documents WHERE source IN ('src0','src1','src2','src3','src4')
        ),
        dist AS (
            SELECT source, term,
                   COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY source)
                                   AS DOUBLE) AS p
            FROM tok GROUP BY source, term
        ),
        both_terms AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   SUM(a.p * LN(2 * a.p / (a.p + b.p))) AS kl_a_both,
                   SUM(b.p * LN(2 * b.p / (a.p + b.p))) AS kl_b_both,
                   SUM(a.p) AS mass_a, SUM(b.p) AS mass_b
            FROM dist a JOIN dist b
              ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b,
               ROUND(0.5 * (kl_a_both + LN(2) * (1 - mass_a))
                   + 0.5 * (kl_b_both + LN(2) * (1 - mass_b)), 6) AS jsd
        FROM both_terms
        """
    ),
    tags=("X4", "statistics", "drift"),
)
def x4_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the drift detector for training-mix curation (a source
    whose JSD against its peers jumps between snapshots changed its
    content). Relational trick: JSD needs the UNION of supports, but
    terms exclusive to one side contribute exactly p*ln2 — so an INNER
    self-join on term covers the overlap and the exclusive mass falls out
    of 1 - sum(overlap p), no full-outer join, no null handling. The
    per-source distribution is one shuffle on (source, term); the pair
    join shuffles on term only (pairs are formed per-term, never a
    cross product of documents)."""
    docs = table(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    )
    tok = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("term"))
    w = Window.partitionBy("source")
    dist = (
        tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "source",
            "term",
            (F.col("cnt") / F.sum("cnt").over(w).cast("double")).alias("p"),
        )
    )
    a = dist.select(
        F.col("source").alias("src_a"), F.col("term").alias("term_a"), F.col("p").alias("pa")
    )
    b = dist.select(
        F.col("source").alias("src_b"), F.col("term").alias("term_b"), F.col("p").alias("pb")
    )
    pairs = a.join(b, (a.term_a == b.term_b) & (a.src_a < b.src_b))
    both = pairs.groupBy("src_a", "src_b").agg(
        F.sum(F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb")))).alias(
            "kl_a_both"
        ),
        F.sum(F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb")))).alias(
            "kl_b_both"
        ),
        F.sum("pa").alias("mass_a"),
        F.sum("pb").alias("mass_b"),
    )
    ln2 = float(__import__("math").log(2.0))
    return both.select(
        "src_a",
        "src_b",
        F.round(
            0.5 * (F.col("kl_a_both") + ln2 * (1 - F.col("mass_a")))
            + 0.5 * (F.col("kl_b_both") + ln2 * (1 - F.col("mass_b"))),
            6,
        ).alias("jsd"),
    )


@query("x5_hll_sliding", oracle=None, tags=("X5", "sketch", "window"))
def x5_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users from tumbling sketch partials: build
    ONE hourly HLL sketch per hour, then every 3-hour window ending at
    hour H is the sketch-union of hours [H-2, H] — the fact table is
    scanned once no matter how many window lengths ride on the partials
    (a second window size is another explode fan-out, not another 100 TB
    scan; exact distinct cannot merge this way). Fan-out is explode over
    3 rows per hourly sketch (~KB each), then a union-agg per window.
    ``x5_hll_sliding_explicit`` is the hash-checkable engine-neutral twin."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    contributes = hourly.select(
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr("INTERVAL 2 HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("win_end"),
        "sk",
    )
    return (
        contributes.groupBy("win_end")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
        .select("win_end", "approx_users")
    )


@query("x5_hll_rollup", oracle=None, tags=("X5", "sketch"))
def x5_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's hll_sketch_agg): per-event-type user sketches, then a sketch
    UNION — not a re-scan — for the overall row. This is the 100 TB
    rollup pattern: partials are ~KB each, re-aggregatable to any grouping
    without touching the fact table again. Non-SQL-expressible for the
    DuckDB oracle (different sketch family); accuracy vs exact distinct is
    pinned in tests/test_analytics.py. ``x5_hll_explicit`` is the
    hash-checkable engine-neutral twin."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).localCheckpoint(eager=False)  # consumed twice: per-type rows + union row
    per = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    total = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return per.unionByName(total)


HLL_M = 64  # registers (p = 6 bucket bits); raw-regime for n >= 2.5*m = 160
HLL_WBITS = 54  # 60-bit md5 hash minus the 6 bucket bits
_HLL_TWOP = 1 << (HLL_WBITS + 1)  # 2^55: the zero-register term


def _hll_j_rho(id_col: str) -> tuple[F.Column, F.Column]:
    """(bucket, rank) columns of the explicit-HLL hash split — the 60-bit
    md5 of the id's string form: low 6 bits pick the register, the 54-bit
    suffix's leading-zero count (+1) is the rank, derived integer-only via
    LENGTH(BIN(w))."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return h.bitwiseAND(F.lit(HLL_M - 1)).alias("j"), rho.alias("rho")


def _hll_sden(regs_u: DataFrame, group_col: str) -> DataFrame:
    """Per-group harmonic denominator S = SUM(2^(55-M)) + zeros*2^55 over a
    (group, j, m) register table — exact BIGINT (max 64*2^55 = 2^61)."""
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_WBITS + 1} - m AS INT))")
    return regs_u.groupBy(group_col).agg(
        (
            F.sum(term) + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_TWOP)
        ).alias("sden")
    )


def _hll_est(sden_col: str = "sden") -> F.Column:
    """alpha * m^2 * 2^55 / S as one fixed IEEE expression tree — raw
    double, bit-identical cross-engine on identical integer sden."""
    return (
        F.lit(0.709)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(_HLL_TWOP))
        / F.col(sden_col).cast("double")
    )


# The same three steps as DuckDB SQL fragments (f-string-interpolated into
# the hll oracles): rho CASE, register term, and the estimate projection.
_HLL_RHO_SQL = (
    f"CASE WHEN h // {HLL_M} = 0 THEN {HLL_WBITS + 1} "
    f"ELSE {HLL_WBITS + 1} - LENGTH(BIN(h // {HLL_M})) END"
)
_HLL_SDEN_SQL = (
    f"CAST(SUM(CAST(1 AS BIGINT) << ({HLL_WBITS + 1} - m)) AS BIGINT) "
    f"+ ({HLL_M} - COUNT(*)) * CAST({_HLL_TWOP} AS BIGINT)"
)
def _hll_est_sql(sden_col: str = "sden") -> str:
    """The `_hll_est` IEEE tree as a DuckDB fragment over ``sden_col`` —
    same literal order and association as the Spark column, so identical
    integer denominators yield bit-identical raw doubles."""
    return (
        f"CAST(0.709 AS DOUBLE) * CAST({HLL_M * HLL_M} AS DOUBLE) "
        f"* CAST({_HLL_TWOP} AS DOUBLE) / CAST({sden_col} AS DOUBLE)"
    )


_HLL_EST_SQL = _hll_est_sql()


@query(
    "x5_hll_explicit",
    oracle=dedent(
        f"""
        WITH base AS MATERIALIZED (
            SELECT event_type, event_id,
                   CAST('0x' || SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
            FROM events
        ),
        hrows AS (
            SELECT event_type, event_id, h % {HLL_M} AS j,
                   {_HLL_RHO_SQL} AS rho
            FROM base
        ),
        regs AS MATERIALIZED (
            SELECT event_type, j, MAX(rho) AS m FROM hrows GROUP BY 1, 2
        ),
        regs_u AS (
            SELECT * FROM regs
            UNION ALL
            SELECT 'ALL' AS event_type, j, MAX(m) AS m FROM regs GROUP BY 2
        ),
        s AS (
            SELECT event_type, {_HLL_SDEN_SQL} AS sden
            FROM regs_u GROUP BY 1
        ),
        exact AS (
            SELECT event_type, COUNT(DISTINCT event_id) AS exact_ids
            FROM hrows GROUP BY 1
            UNION ALL
            SELECT 'ALL', COUNT(DISTINCT event_id) FROM hrows
        )
        SELECT s.event_type,
               {_HLL_EST_SQL} AS approx_ids,
               CAST(e.exact_ids AS BIGINT) AS exact_ids
        FROM s JOIN exact e ON e.event_type = s.event_type
        """
    ),
    tags=("X5", "sketch", "hll"),
)
def x5_hll_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT HyperLogLog as pure dataflow with a FULL oracle — the
    hash-checkable twin of ``x5_hll_rollup`` (DataSketches' hash family is
    JVM-internal, so that one is rows-only). Distinct event_ids per
    event_type plus an ALL row obtained by MERGING the per-type registers
    (element-wise MAX) — never a re-scan of the fact table, which is the
    whole point of a mergeable sketch at 100 TB: per-group partials are
    {HLL_M} small integers, re-aggregatable to any coarser grouping.

    Every step is engine-neutral integer arithmetic: the 60-bit md5 hash
    splits into a {HLL_M}-bucket index and a {HLL_WBITS}-bit suffix whose
    leading-zero count (via LENGTH(BIN(w)) — no floats) gives the
    register rank; the harmonic denominator is carried as
    SUM(2^({HLL_WBITS + 1} - M)) in exact BIGINT (max {HLL_M} * 2^55 =
    2^61, overflow-safe; DuckDB's HUGEINT widen re-cast per the r3
    lesson), with absent registers contributing 2^55 each. The single
    float step — alpha * m^2 * 2^55 / S — is one fixed IEEE expression
    tree over identical integers, so the RAW double matches bit-for-bit.
    m = {HLL_M} keeps every group in the raw-estimate regime (n >= 2.5m)
    at every test SF, so no linear-counting branch (and no cross-engine
    ln()) is needed; accuracy vs exact is pinned in tests (theoretical
    error 1.04/sqrt({HLL_M}) = 13%)."""
    ev = table(spark, sf_dir, "events")
    j, rho = _hll_j_rho("event_id")
    hrows = ev.select("event_type", "event_id", j, rho).localCheckpoint(
        eager=False
    )  # consumed twice: registers + exact
    regs = (
        hrows.groupBy("event_type", "j")
        .agg(F.max("rho").alias("m"))
        .localCheckpoint(eager=False)  # consumed twice: per-type + merged ALL
    )
    regs_u = regs.unionByName(
        regs.groupBy("j")
        .agg(F.max("m").alias("m"))
        .select(F.lit("ALL").alias("event_type"), "j", "m")
    )
    s = _hll_sden(regs_u, "event_type")
    exact = (
        hrows.select("event_type", "event_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_ids"))
        .unionByName(
            hrows.select("event_id")
            .distinct()
            .agg(F.count(F.lit(1)).alias("exact_ids"))
            .select(F.lit("ALL").alias("event_type"), "exact_ids")
        )
    )
    return s.join(exact, "event_type").select(
        "event_type", _hll_est().alias("approx_ids"), "exact_ids"
    )


@query(
    "x5_hll_sliding_explicit",
    oracle=dedent(
        f"""
        WITH base AS (
            SELECT DATE_TRUNC('day', ts) AS d, event_id,
                   CAST('0x' || SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
            FROM events
        ),
        dayregs AS MATERIALIZED (
            SELECT d, h % {HLL_M} AS j, MAX({_HLL_RHO_SQL}) AS m
            FROM base GROUP BY 1, 2
        ),
        winregs AS (
            SELECT win_end, j, MAX(m) AS m FROM (
                SELECT UNNEST([d, d + INTERVAL 1 DAY, d + INTERVAL 2 DAY])
                           AS win_end,
                       j, m
                FROM dayregs
            ) GROUP BY 1, 2
        ),
        s AS (
            SELECT win_end, {_HLL_SDEN_SQL} AS sden
            FROM winregs GROUP BY 1
        )
        SELECT CAST(EPOCH(win_end) AS BIGINT) AS win_end,
               {_HLL_EST_SQL} AS approx_ids
        FROM s
        """
    ),
    tags=("X5", "sketch", "window", "hll"),
)
def x5_hll_sliding_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct counts from MERGED DAILY REGISTER PARTIALS,
    fully hash-checkable — the engine-neutral twin of ``x5_hll_sliding``:
    one pass builds {HLL_M} explicit-HLL registers per day, then every
    3-day window ending at day D is the element-wise MAX of days
    [D-2, D]'s registers. The fact table is scanned ONCE no matter how
    many window lengths ride on the partials — the sketch property that
    replaces a per-window 100 TB re-scan; the fan-out is 3 rows per
    (day, register), KB-sized. Register merge is exact integer MAX, so
    merge-equals-rescan holds BIT-EXACTLY (pinned in tests by rebuilding
    windows directly from events and comparing estimates); window ends
    are emitted as epoch seconds (the all-integer timestamp contract).
    Day-partial cardinalities at test SF sit below the raw-estimate
    regime, so ``approx_ids`` is the deterministic raw estimate — the
    parity contract here is exact reproducibility of sketch state and
    estimate, accuracy being ``x5_hll_explicit``'s department."""
    ev = table(spark, sf_dir, "events")
    j, rho = _hll_j_rho("event_id")
    dayregs = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("d"), j, rho)
        .groupBy("d", "j")
        .agg(F.max("rho").alias("m"))
    )
    winregs = (
        dayregs.select(
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.col("d") + F.expr("INTERVAL 2 DAYS"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("win_end"),
            "j",
            "m",
        )
        .groupBy("win_end", "j")
        .agg(F.max("m").alias("m"))
    )
    s = _hll_sden(winregs, "win_end")
    return s.select(
        F.col("win_end").cast("long").alias("win_end"),
        _hll_est().alias("approx_ids"),
    )


_SETOPS_EST_A = _hll_est_sql("sden_a")
_SETOPS_EST_B = _hll_est_sql("sden_b")
_SETOPS_EST_U = _hll_est_sql("sden_u")


@query(
    "x5_hll_setops",
    oracle=dedent(
        f"""
        WITH seg_rows AS MATERIALIZED (
            SELECT CASE WHEN YEAR(o_orderdate) = 1996 THEN 'A' ELSE 'B' END
                       AS seg,
                   o_custkey,
                   CAST('0x' || SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
            FROM orders
            WHERE YEAR(o_orderdate) IN (1996, 1997)
        ),
        jr AS (
            SELECT seg, h % {HLL_M} AS j, {_HLL_RHO_SQL} AS rho FROM seg_rows
        ),
        regs AS MATERIALIZED (
            SELECT seg, j, MAX(rho) AS m FROM jr GROUP BY 1, 2
        ),
        regs_u AS (
            SELECT * FROM regs
            UNION ALL
            SELECT 'U' AS seg, j, MAX(m) AS m FROM regs GROUP BY 2
        ),
        s AS (
            SELECT seg, {_HLL_SDEN_SQL} AS sden FROM regs_u GROUP BY 1
        ),
        sp AS (
            SELECT MAX(CASE WHEN seg = 'A' THEN sden END) AS sden_a,
                   MAX(CASE WHEN seg = 'B' THEN sden END) AS sden_b,
                   MAX(CASE WHEN seg = 'U' THEN sden END) AS sden_u
            FROM s
        ),
        flags AS (
            SELECT o_custkey,
                   MAX(CASE WHEN seg = 'A' THEN 1 ELSE 0 END) AS in_a,
                   MAX(CASE WHEN seg = 'B' THEN 1 ELSE 0 END) AS in_b
            FROM seg_rows GROUP BY 1
        ),
        ex AS (
            SELECT CAST(SUM(in_a) AS BIGINT) AS exact_a,
                   CAST(SUM(in_b) AS BIGINT) AS exact_b,
                   CAST(COUNT(*) AS BIGINT) AS exact_u,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS exact_i
            FROM flags
        )
        SELECT 'A' AS segment, {_SETOPS_EST_A} AS approx_keys,
               exact_a AS exact_keys FROM sp, ex
        UNION ALL
        SELECT 'B', {_SETOPS_EST_B}, exact_b FROM sp, ex
        UNION ALL
        SELECT 'UNION', {_SETOPS_EST_U}, exact_u FROM sp, ex
        UNION ALL
        SELECT 'INTERSECT',
               (({_SETOPS_EST_A}) + ({_SETOPS_EST_B})) - ({_SETOPS_EST_U}),
               exact_i FROM sp, ex
        """
    ),
    tags=("X5", "sketch", "hll", "setops"),
)
def x5_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA on explicit-HLL registers, fully hash-checkable:
    segment A = customers ordering in 1996, B = in 1997. |A| and |B| come
    from each segment's {HLL_M} registers, |A ∪ B| from their element-wise
    MAX merge (never a combined re-scan — the mergeable-sketch property
    that makes pre-computed per-partition/per-day partials composable at
    100 TB), and |A ∩ B| by inclusion-exclusion est(A)+est(B)-est(U) — the
    standard HLL intersection estimator (HLL supports union natively;
    intersection only via I-E, with error scaling on the UNION's
    cardinality — both facts pinned in tests against the exact counts
    emitted alongside). One orders scan feeds both the register build and
    the exact flags; every estimate is the shared `_hll_est` IEEE tree
    over exact-integer denominators, so raw doubles — including the
    three-term I-E expression — match the oracle bit-for-bit."""
    ords = table(spark, sf_dir, "orders")
    j, rho = _hll_j_rho("o_custkey")
    rows = (
        ords.where(F.year("o_orderdate").isin(1996, 1997))
        .select(
            F.when(F.year("o_orderdate") == 1996, "A").otherwise("B").alias("seg"),
            "o_custkey",
            j,
            rho,
        )
        .localCheckpoint(eager=False)  # consumed twice: registers + exact flags
    )
    regs = (
        rows.groupBy("seg", "j")
        .agg(F.max("rho").alias("m"))
        .localCheckpoint(eager=False)  # consumed twice: per-segment + merged U
    )
    regs_u = regs.unionByName(
        regs.groupBy("j")
        .agg(F.max("m").alias("m"))
        .select(F.lit("U").alias("seg"), "j", "m")
    )
    sp = _hll_sden(regs_u, "seg").agg(
        F.max(F.when(F.col("seg") == "A", F.col("sden"))).alias("sden_a"),
        F.max(F.when(F.col("seg") == "B", F.col("sden"))).alias("sden_b"),
        F.max(F.when(F.col("seg") == "U", F.col("sden"))).alias("sden_u"),
    )
    ex = (
        rows.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("seg") == "A", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("seg") == "B", 1).otherwise(0)).alias("in_b"),
        )
        .agg(
            F.sum("in_a").alias("exact_a"),
            F.sum("in_b").alias("exact_b"),
            F.count(F.lit(1)).alias("exact_u"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("exact_i"),
        )
    )
    est_a, est_b, est_u = _hll_est("sden_a"), _hll_est("sden_b"), _hll_est("sden_u")
    return (
        sp.crossJoin(ex)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("A").alias("segment"),
                        est_a.alias("approx_keys"),
                        F.col("exact_a").alias("exact_keys"),
                    ),
                    F.struct(
                        F.lit("B").alias("segment"),
                        est_b.alias("approx_keys"),
                        F.col("exact_b").alias("exact_keys"),
                    ),
                    F.struct(
                        F.lit("UNION").alias("segment"),
                        est_u.alias("approx_keys"),
                        F.col("exact_u").alias("exact_keys"),
                    ),
                    F.struct(
                        F.lit("INTERSECT").alias("segment"),
                        ((est_a + est_b) - est_u).alias("approx_keys"),
                        F.col("exact_i").alias("exact_keys"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )


@query(
    "x8_table_stats",
    oracle=dedent(
        f"""
        WITH stacked AS MATERIALIZED (
            SELECT 'o_custkey' AS col_name, CAST(o_custkey AS VARCHAR) AS canon,
                   CAST(o_custkey AS DOUBLE) AS nval, CAST(NULL AS VARCHAR) AS sval
            FROM orders
            UNION ALL
            SELECT 'o_totalprice',
                   CAST({cents_sql()} AS VARCHAR),
                   o_totalprice, NULL
            FROM orders
            UNION ALL
            SELECT 'o_orderdate',
                   CAST(CAST(EPOCH(o_orderdate) AS BIGINT) AS VARCHAR),
                   CAST(CAST(EPOCH(o_orderdate) AS BIGINT) AS DOUBLE), NULL
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', o_orderstatus, NULL, o_orderstatus FROM orders
            UNION ALL
            SELECT 'o_orderpriority', o_orderpriority, NULL, o_orderpriority
            FROM orders
        ),
        hrows AS (
            SELECT col_name, CAST('0x' || SUBSTR(MD5(canon), 1, 15) AS BIGINT) AS h
            FROM stacked WHERE canon IS NOT NULL
        ),
        jr AS (SELECT col_name, h % {HLL_M} AS j, {_HLL_RHO_SQL} AS rho FROM hrows),
        regs AS (SELECT col_name, j, MAX(rho) AS m FROM jr GROUP BY 1, 2),
        s AS (SELECT col_name, {_HLL_SDEN_SQL} AS sden FROM regs GROUP BY 1),
        stats AS (
            SELECT col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(canon) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT canon) AS BIGINT) AS ndv_exact,
                   MIN(nval) AS min_num, MAX(nval) AS max_num,
                   MIN(sval) AS min_str, MAX(sval) AS max_str,
                   CASE WHEN COUNT(sval) > 0
                        THEN CAST(SUM(LENGTH(sval)) AS DOUBLE)
                             / CAST(COUNT(sval) AS DOUBLE)
                   END AS avg_len
            FROM stacked GROUP BY 1
        )
        SELECT st.col_name, n_rows, n_null, ndv_exact,
               {_HLL_EST_SQL} AS ndv_hll,
               min_num, max_num, min_str, max_str, avg_len
        FROM stats st JOIN s ON s.col_name = st.col_name
        """
    ),
    tags=("X8", "stats", "hll", "layout"),
)
def x8_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column statistics — the optimizer-stats
    collection (`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`) every
    100 TB warehouse runs before CBO join reordering can work. One orders
    scan is stacked into (column, value) rows via a 5-wide explode (the
    fan-out is map-local; exchanges downstream carry only per-column
    partials and {HLL_M}-register sketches), then per column: row/null
    counts, typed min/max (numeric as DOUBLE — dates as epoch seconds —
    strings lexicographic), mean string length, exact NDV, and the
    explicit-HLL NDV estimate. Exact NDV (COUNT DISTINCT) is the
    test-scale ground truth; at 100 TB it is the column whose shuffle you
    refuse to pay — `ndv_hll` from the shared 64-register sketch is the
    at-scale path, its error pinned in tests for the columns in the
    raw-estimate regime (n >= 2.5m). The two low-cardinality string
    columns (3 and 5 NDV) report the deterministic raw estimate, which is
    FAR OFF at tiny n by design: a production ANALYZE would switch to
    linear counting there, but that branch needs ln(), which is not
    bit-reproducible cross-engine — determinism is this lane's contract,
    and tiny-NDV columns are exactly where exact COUNT DISTINCT is cheap
    anyway. Values are
    canonicalized engine-neutrally before hashing (ints/strings verbatim,
    money as FLOOR(v*100+0.5) cents, timestamps as epoch seconds) so the
    md5-derived registers — and hence the raw-double estimate — match the
    oracle bit-for-bit; doubles never pass through a string cast (Spark
    and DuckDB format them differently)."""
    ords = table(spark, sf_dir, "orders")

    def ent(name: str, canon: F.Column, nval: F.Column, sval: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("col_name"),
            canon.alias("canon"),
            nval.alias("nval"),
            sval.alias("sval"),
        )

    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    cents = cents_col()
    # parquet o_orderdate is TIMESTAMP_NTZ: hop via LTZ (session TZ is UTC,
    # so the naive value is read as UTC — exactly DuckDB's EPOCH semantics)
    epochs = F.col("o_orderdate").cast("timestamp_ltz").cast("long")
    entries = F.array(
        ent(
            "o_custkey",
            F.col("o_custkey").cast("string"),
            F.col("o_custkey").cast("double"),
            null_s,
        ),
        ent("o_totalprice", cents.cast("string"), F.col("o_totalprice"), null_s),
        ent("o_orderdate", epochs.cast("string"), epochs.cast("double"), null_s),
        ent("o_orderstatus", F.col("o_orderstatus"), null_d, F.col("o_orderstatus")),
        ent(
            "o_orderpriority",
            F.col("o_orderpriority"),
            null_d,
            F.col("o_orderpriority"),
        ),
    )
    j, rho = _hll_j_rho("canon")
    stacked = (
        ords.select(F.explode(entries).alias("e"))
        .select("e.*")
        .select("col_name", "canon", "nval", "sval", j, rho)
        .localCheckpoint(eager=False)  # consumed twice: stats + registers
    )
    stats = stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("canon")).alias("n_null"),
        F.countDistinct("canon").alias("ndv_exact"),
        F.min("nval").alias("min_num"),
        F.max("nval").alias("max_num"),
        F.min("sval").alias("min_str"),
        F.max("sval").alias("max_str"),
        F.when(
            F.count("sval") > 0,
            F.sum(F.length("sval")).cast("double") / F.count("sval").cast("double"),
        ).alias("avg_len"),
    )
    regs = (
        stacked.where(F.col("canon").isNotNull())
        .groupBy("col_name", "j")
        .agg(F.max("rho").alias("m"))
    )
    s = _hll_sden(regs, "col_name")
    return stats.join(s, "col_name").select(
        "col_name",
        "n_rows",
        "n_null",
        "ndv_exact",
        _hll_est().alias("ndv_hll"),
        "min_num",
        "max_num",
        "min_str",
        "max_str",
        "avg_len",
    )


# --- X8: one-pass Pearson correlation matrix over the quality features ------

CORR_FEATS = ("n_tokens", "n_stop", "n_uniq", "n_chars")
_CORR_PAIRS = [
    (i, j) for i in range(len(CORR_FEATS)) for j in range(i + 1, len(CORR_FEATS))
]


def _corr_moments_sql() -> str:
    """The single moments row (n, 4 feature sums, 10 product sums) over a
    feature CTE named ``f`` — ONE generated aggregate list shared by both
    engines. All moments are EXACT integer sums (features are small
    ints). Integer headroom: the downstream n*Sxy terms stay under 2^63
    to about n ~ 10^7 docs of this shape; past that the partials move to
    DECIMAL(38,0) (exact, associative) with the same tree."""
    k = len(CORR_FEATS)
    sums = ", ".join(f"CAST(SUM(f{i}) AS BIGINT) AS s{i}" for i in range(k))
    prods = ", ".join(
        f"CAST(SUM(f{i} * f{j}) AS BIGINT) AS s{i}_{j}"
        for i in range(k)
        for j in range(i, k)
    )
    return f"SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}, {prods} FROM f"


def _corr_expr_sql(i: int, j: int) -> str:
    """corr(i,j) = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))
    as ONE text both engines evaluate over identical exact integers — a
    fixed IEEE tree, raw-double hash-green. NULLIF guards a zero-variance
    feature (Spark's non-ANSI divide would yield NULL where DuckDB yields
    Inf — the bootstrap lesson)."""
    return (
        f"CAST(n * s{i}_{j} - s{i} * s{j} AS DOUBLE)"
        f" / NULLIF(SQRT(CAST(n * s{i}_{i} - s{i} * s{i} AS DOUBLE)"
        f" * CAST(n * s{j}_{j} - s{j} * s{j} AS DOUBLE)), CAST(0 AS DOUBLE))"
    )


def _corr_oracle() -> str:
    """DuckDB side: feature CTE + moments row (both MATERIALIZED — the
    emit references ``s`` six times and inlining would re-run the scan
    per pair, the exact flaw the Spark side avoids with inline-over-one-
    row), then the 6 upper-triangle emits."""
    emits = "\n        UNION ALL ".join(
        f"SELECT '{CORR_FEATS[i]}' AS feat_a, '{CORR_FEATS[j]}' AS feat_b, n,\n"
        f"               {_corr_expr_sql(i, j)} AS corr\n"
        f"        FROM s"
        for i, j in _CORR_PAIRS
    )
    return f"""
        WITH f AS MATERIALIZED (
            SELECT CAST(n_tokens AS BIGINT) AS f0, CAST(n_stop AS BIGINT) AS f1,
                   CAST(n_uniq AS BIGINT) AS f2, CAST(n_chars AS BIGINT) AS f3
            FROM (SELECT {QUALITY_FEATURES_SQL}, n_chars FROM documents)
        ),
        s AS MATERIALIZED (
            {_corr_moments_sql()}
        )
        {emits}
        """


@query("x8_corr_matrix", oracle=_corr_oracle(), tags=("X8", "stats"))
def x8_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-family companion to x8_table_stats: the Pearson correlation
    matrix of the 4 quality features (token/stopword/distinct-token/char
    counts — the x4 quality model's inputs) in ONE documents scan. All 15
    moment sums (n, 4 feature sums, 10 product sums) ride a single
    map-side-combinable aggregation — one exchange of one 15-column row —
    and the 6 upper-triangle correlations are each one fixed IEEE
    expression over those exact integers, so the doubles hash bit-equal
    cross-engine. This is how a feature-engineering pass decides which
    quality signals are redundant before fitting anything: at 100 TB the
    plan is scan + partial moments + 15-number reduce, the cheapest
    possible shape (a corr() call per pair would re-scan per pair).
    Token array is pre-projected in its own SELECT before the three
    size() consumers (CollapseProject won't inline the multi-referenced
    split, keeping it computed once — the r5 shingling lesson)."""
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    docs.select("text", "n_chars").createOrReplaceTempView("_corr_docs")
    moments = spark.sql(
        f"""
        WITH f AS (
            SELECT CAST(size(t) AS BIGINT) AS f0,
                   CAST(size(filter(t, x -> x IN {STOPWORDS!r})) AS BIGINT) AS f1,
                   CAST(size(array_distinct(t)) AS BIGINT) AS f2,
                   CAST(n_chars AS BIGINT) AS f3
            FROM (SELECT split(text, ' ') AS t, n_chars FROM _corr_docs)
        )
        {_corr_moments_sql()}
        """
    )
    # emit the 6 pairs by INLINE over the single moments row — a UNION of
    # six SELECTs would inline the moments CTE six times (6 scans, 6
    # aggregations; measured before this shape)
    return moments.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(CORR_FEATS[i]).alias("feat_a"),
                        F.lit(CORR_FEATS[j]).alias("feat_b"),
                        F.col("n"),
                        F.expr(_corr_expr_sql(i, j)).alias("corr"),
                    )
                    for i, j in _CORR_PAIRS
                ]
            )
        )
    )


BOOT_B = 16  # bootstrap replicas
BOOT_FIELD = 15  # bits of uniform per replica; 4 disjoint fields per digest
BOOT_DIGESTS = BOOT_B // 4  # one 60-bit md5 digest yields 4 replica uniforms
# Poisson(1) inverse-CDF thresholds on a 15-bit uniform (w = #thresholds
# exceeded, capped at 5; CDF mass beyond 5 is 6e-4) — ONE definition feeds
# both engines' CASE ladders so a B / field-layout / cap change cannot
# desynchronize them.
BOOT_T = []
_acc, _term = 0.0, math.exp(-1.0)
for _k in range(5):
    _acc += _term
    BOOT_T.append(int(_acc * (1 << BOOT_FIELD)))
    _term /= _k + 1


def _boot_w_ladder(u: str) -> str:
    """The Poisson(1) CASE ladder over a 15-bit uniform expression —
    IDENTICAL text in both engines (only the shift syntax inside ``u``
    differs), generated from the single BOOT_T list."""
    arms = " ".join(f"WHEN {u} < {BOOT_T[k]} THEN {k}" for k in range(len(BOOT_T)))
    return f"CASE {arms} ELSE {len(BOOT_T)} END"


def _boot_sql(tbl, digest, shift, wrap_open, wrap_close, lo, hi):
    """The WHOLE bootstrap query as generated SQL, shared by both engines
    (x2_simhash lesson: 50+ generated expression columns cost seconds of
    py4j driver time as Column objects but nothing as one SQL string).
    Engine-specific bits are injected: digest(d) (conv vs '0x' cast),
    shift(d, i) (shiftright() vs >>), the sort wrapper, and the 0- vs
    1-based rank indices. Everything else — the threshold ladder, the
    exact-integer partial sums, the mean divisions — is literally the
    same text, so the two engines cannot drift."""
    digests = ", ".join(f"{digest(d)} AS h{d}" for d in range(BOOT_DIGESTS))
    wcols = ", ".join(
        f"{_boot_w_ladder(shift(*divmod(b, 4)))} AS w{b}" for b in range(BOOT_B)
    )
    aggs = ", ".join(
        f"CAST(SUM(w{b} * cents) AS BIGINT) AS swx{b}, "
        f"CAST(SUM(w{b}) AS BIGINT) AS sw{b}"
        for b in range(BOOT_B)
    )
    # NULLIF guards the degenerate replica (all weights 0, P = e^-n per
    # group): Spark's non-ANSI Divide yields NULL on a zero divisor while
    # DuckDB's IEEE division yields Inf — and the two engines would then
    # sort the poisoned mean to OPPOSITE ends. With NULLIF both produce
    # NULL, and both sort wrappers place NULLs first (Spark sort_array's
    # documented order; DuckDB told so explicitly below).
    means = ", ".join(
        f"CAST(swx{b} AS DOUBLE) / CAST(NULLIF(sw{b}, 0) AS DOUBLE)"
        for b in range(BOOT_B)
    )
    return f"""
        WITH base AS (
            SELECT o_orderpriority,
                   {cents_sql()} AS cents,
                   {digests}
            FROM {tbl}
        ),
        w AS (SELECT o_orderpriority, cents, {wcols} FROM base),
        a AS (
            SELECT o_orderpriority,
                   CAST(SUM(cents) AS BIGINT) AS sx,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {aggs}
            FROM w GROUP BY 1
        ),
        m AS (
            SELECT o_orderpriority, n,
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
                   {wrap_open}{means}{wrap_close} AS arr
            FROM a
        )
        SELECT o_orderpriority, n AS n_orders, mean_cents,
               arr[{lo}] AS ci_lo_cents, arr[{hi}] AS ci_hi_cents
        FROM m
    """


_BOOT_MASK = (1 << BOOT_FIELD) - 1
_BOOT_ORACLE_SQL = _boot_sql(
    "orders",
    lambda d: (
        "CAST('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR) || "
        f"'#{d}'), 1, 15) AS BIGINT)"
    ),
    lambda d, i: f"((h{d} >> {BOOT_FIELD * i}) & {_BOOT_MASK})",
    "LIST_SORT([",
    "], 'ASC', 'NULLS FIRST')",
    2,
    BOOT_B - 1,
)
_BOOT_SPARK_SQL = _boot_sql(
    "_boot_orders",
    lambda d: (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), "
        f"'#{d}')), 1, 15), 16, 10) AS BIGINT)"
    ),
    lambda d, i: f"(shiftright(h{d}, {BOOT_FIELD * i}) & {_BOOT_MASK})",
    "sort_array(array(",
    "))",
    1,
    BOOT_B - 2,
)


@query(
    "x5_bootstrap_ci",
    oracle=_BOOT_ORACLE_SQL,
    tags=("X5", "stats", "bootstrap"),
)
def x5_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS multiplier bootstrap (Poisson(1) weights — the streaming
    bootstrap of Chamandy et al., the shape that replaces B resampled
    data copies at 100 TB): per order-priority group, {BOOT_B} replica
    means of the order value and the rank-based central interval of
    their distribution (2nd smallest / 2nd largest ~ 87.5% CI at
    B={BOOT_B}). Every replica weight derives from md5(o_orderkey # d):
    one digest yields 4 disjoint {BOOT_FIELD}-bit uniforms (the Bloom
    lane's one-digest/k-fields economy — {BOOT_DIGESTS} hashes per row,
    not {BOOT_B}), pushed through the shared integer threshold ladder.
    The whole computation is ONE map-side-combinable aggregation
    carrying 2x{BOOT_B}+2 exact-integer partials (weighted cent sums and
    weight sums — never a float accumulation, the r1 summation-order
    lesson), so the single exchange is {2 * BOOT_B + 2} small columns
    per group and every emitted double is one division (or a rank pick
    from a sorted array) over identical integers — bit-equal
    cross-engine. Both engines run the SAME generated SQL text modulo
    digest/shift/sort syntax (see `_boot_sql`). A degenerate replica
    (every weight 0 — probability e^-n per group, real only for tiny
    groups) yields a NULL mean that sorts FIRST in both engines (NULLIF
    guard — see `_boot_sql`), so even then the engines agree; its rank
    slot widens the CI downward, a conservative failure mode."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("_boot_orders")
    return spark.sql(_BOOT_SPARK_SQL)


# ---------------------------------------------------------------------------
# Remaining TPC-H analogues (q2/q9/q11/q12/q15/q16/q20) — completes the
# 22-query set. This schema has no partsupp table and no
# shipmode/commitdate/receiptdate columns, so the partsupp-derived facts
# are re-derived from lineitem: "supply cost" = min unit price a supplier
# ever charged for a part (min of per-row division — bit-deterministic
# across engines, unlike an avg whose summation order differs), and
# "availability" = shipped quantity. Late-ness = shipped > N days after
# the order date, as in q21.
# ---------------------------------------------------------------------------


def _supply(li: DataFrame) -> DataFrame:
    """Per-(part, supplier) unit cost derived from lineitem — the stand-in
    for partsupp.ps_supplycost. One shuffle on the compound key; output is
    |part x supplier-pairs| rows, tiny next to the fact table."""
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))


@query(
    "q2_min_cost_supplier",
    oracle=dedent(
        """
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        eligible AS (
            SELECT p.p_partkey, s.s_name, s.s_acctbal, n.n_name, sp.unit_cost,
                   MIN(sp.unit_cost) OVER (PARTITION BY p.p_partkey) AS best_cost
            FROM supply sp
            JOIN part p     ON p.p_partkey = sp.l_partkey
            JOIN supplier s ON s.s_suppkey = sp.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            JOIN region r   ON r.r_regionkey = n.n_regionkey
            WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
        )
        SELECT s_name, n_name, p_partkey,
               ROUND(s_acctbal, 2) AS s_acctbal,
               ROUND(unit_cost, 6) AS unit_cost
        FROM eligible WHERE unit_cost = best_cost
        ORDER BY s_acctbal DESC, s_name, p_partkey
        LIMIT 100
        """
    ),
    tags=("X5", "J1", "W4", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue (minimum-cost supplier): for every STANDARD
    size-15 part, the ASIA supplier(s) charging the lowest unit price.
    The correlated MIN subquery of the original becomes a window MIN over
    the already-aggregated supply table — the only big shuffle is the
    (partkey, suppkey) aggregation of lineitem; part/supplier/nation/
    region all broadcast, and the part filter prunes supply rows BEFORE
    the window. unit_cost is a min of per-row divisions, so Spark and the
    oracle agree bit-for-bit (an avg would not — summation order)."""
    li, p, s, n, r = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    wanted = F.broadcast(
        p.where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")).select("p_partkey")
    )
    asia_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sp = (
        _supply(li)
        .join(wanted, F.col("ps_partkey") == F.col("p_partkey"))
        .join(asia_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    best = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        sp.withColumn("best_cost", best)
        .where(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle=dedent(
        """
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue (product-type profit by nation and year): no
    partsupp here, so cost = 60% of the part's retail price per unit.
    The name filter shrinks part to ~13% and that filtered dim broadcasts,
    pruning lineitem before the one big shuffle (the orders join);
    supplier and nation ride along as broadcasts."""
    li, p, s, n, o = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    red = F.broadcast(
        p.where(F.col("p_name").contains("red")).select("p_partkey", "p_retailprice")
    )
    snat = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(snat, li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle=dedent(
        """
        WITH v AS (
            SELECT l.l_partkey AS p_partkey, SUM(l.l_extendedprice) AS value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name IN ('NATION_1', 'NATION_6')
            GROUP BY 1
        )
        SELECT p_partkey, ROUND(value, 2) AS value
        FROM v
        WHERE value > (SELECT 0.001 * SUM(value) FROM v)
        """
    ),
    tags=("X5", "A2", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue (important stock): per-part traded value from
    two nations' suppliers, keeping parts above 0.1% of the total. The
    global-sum scalar subquery re-aggregates the MATERIALIZED per-part
    table (localCheckpoint) — |parts| rows — and joins back as a 1-row
    broadcast nested loop; the fact table is scanned exactly once."""
    li, s, n = tables(spark, sf_dir, "lineitem", "supplier", "nation")
    supp = F.broadcast(
        s.join(F.broadcast(n.where(F.col("n_name").isin("NATION_1", "NATION_6"))),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    v = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("l_extendedprice").alias("value"))
        .localCheckpoint(eager=False)  # consumed twice: rows + global sum
    )
    threshold = v.agg((0.001 * F.sum("value")).alias("cut"))
    return (
        v.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("cut"))
        .select("p_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q12_priority_lateness",
    oracle=dedent(
        """
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1
        """
    ),
    tags=("X5", "J1", "tpch"),
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue (shipping-priority audit): this schema has no
    shipmode, so lines group by returnflag lane; late = shipped >30 days
    after ordering. The year filter pushes to the lineitem scan; the
    cross-table lateness predicate evaluates post-join; both priority
    counts ride one aggregation as conditional sums."""
    o, li = tables(spark, sf_dir, "orders", "lineitem")
    year = li.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(year, o.o_orderkey == year.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=dedent(
        """
        WITH rev AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev, 2) AS total_rev
        FROM rev r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        """
    ),
    tags=("X5", "A2", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue (top supplier): quarter revenue per supplier,
    keep the max. The view + scalar-MAX of the original becomes one
    materialized aggregate consumed twice (rows + 1-row max joined back
    as a broadcast); the equality compares values computed once within
    this engine, so float determinism holds."""
    li, s = tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev"))
        .localCheckpoint(eager=False)  # consumed twice: rows + max
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev"))
    )


@query(
    "q16_supplier_count",
    oracle=dedent(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#3'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """
    ),
    tags=("X5", "A2", "tpch"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue (supplier-relationship count): distinct
    suppliers per (brand, type, size) bucket, excluding negative-balance
    suppliers — the NOT IN becomes a broadcast LEFT ANTI join (valid
    because s_suppkey is never null). The part predicate prunes the
    broadcast dim before it reaches the fact scan, and the distinct
    aggregate expands to the standard two-phase plan."""
    li, p, s = tables(spark, sf_dir, "lineitem", "part", "supplier")
    bucket = F.broadcast(
        p.where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = F.broadcast(s.where(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(bucket, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_dominant_supplier",
    oracle=dedent(
        """
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ),
        dominant AS (
            SELECT DISTINCT sh.l_suppkey
            FROM (SELECT l_partkey, l_suppkey, qty,
                         SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
                  FROM shipped) sh
            JOIN part p ON p.p_partkey = sh.l_partkey
            WHERE p.p_name LIKE 'small%' AND sh.qty > 0.5 * sh.part_qty
        )
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
        """
    ),
    tags=("X5", "W4", "tpch"),
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue (dominant promo supplier): suppliers who shipped
    more than half of some 'small*' part's 1997 volume. The correlated
    per-part total becomes a window SUM over the (part, supplier)
    aggregate. Unlike the oracle SQL (window before the part filter), the
    plan applies the part semi-filter BEFORE both the aggregation and the
    window — dropping whole partkey partitions never changes a
    partitionBy(partkey) window, and at 100 TB it shrinks the shuffle by
    the name-filter's selectivity (~13%). Quantities are integer-valued
    doubles, so the window sum and the 0.5x comparison are exact in both
    engines. The final IN collapses to broadcast semi joins."""
    li, p, s, n = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    small = F.broadcast(p.where(F.col("p_name").startswith("small")).select("p_partkey"))
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .join(small, li.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_qty = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        shipped.withColumn("part_qty", part_qty)
        .where(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
    )


@query("x5_heavy_hitters", oracle=None, tags=("X5", "sketch", "topk"))
def x5_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (top-20 corpus terms) via the
    approx_top_k sketch aggregate — the mergeable frequent-items path for
    100 TB streams where an exact groupBy-then-sort would shuffle the
    full term table every time: partials are fixed-size item sketches
    merged on one reducer, and the token explode is the only wide input.
    Estimates are exact whenever a partition tracks <= maxItemsTracked
    distinct items (pinned against exact counts in tests). Rows-only for
    the oracle (DuckDB has no matching sketch); ``x5_countmin_terms`` is
    the hash-checkable engine-neutral twin."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    sk = words.agg(F.expr("approx_top_k(term, 20)").alias("tk"))
    return (
        sk.select(F.posexplode("tk").alias("rank0", "e"))
        .select(
            (F.col("rank0") + 1).alias("rank"),
            F.col("e.item").alias("term"),
            F.col("e.count").alias("est_count"),
        )
    )


CMS_D = 4  # count-min hash rows
CMS_W = 1024  # counters per row


def cms_hash_col(r_col, term_col):
    """The counter index of ``term`` in sketch row ``r``: 60-bit md5 of
    "r:term" mod CMS_W — ONE spelling shared by the batch lane and
    streaming/countmin.py, so the batch==stream twin property cannot
    drift (review r8)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(r_col.cast("string"), F.lit(":"), term_col)),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


@query(
    "x5_countmin_terms",
    oracle=dedent(
        f"""
        WITH words AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
        ),
        keyed AS MATERIALIZED (
            SELECT term, COUNT(*) AS n FROM words WHERE term <> '' GROUP BY 1
        ),
        hashed AS MATERIALIZED (
            SELECT r.r, k.term, k.n,
                   CAST('0x' || SUBSTR(MD5(CAST(r.r AS VARCHAR) || ':' || k.term),
                        1, 15) AS BIGINT) % {CMS_W} AS c
            FROM keyed k, (SELECT UNNEST(RANGE(0, {CMS_D})) AS r) r
        ),
        counters AS MATERIALIZED (
            SELECT r, c, CAST(SUM(n) AS BIGINT) AS cnt FROM hashed GROUP BY 1, 2
        ),
        probes AS (SELECT term, n FROM keyed ORDER BY n DESC, term LIMIT 20),
        est AS (
            SELECT p.term, p.n, MIN(co.cnt) AS cms_n
            FROM probes p
            JOIN hashed h ON h.term = p.term
            JOIN counters co ON co.r = h.r AND co.c = h.c
            GROUP BY 1, 2
        )
        SELECT ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank, term,
               CAST(n AS BIGINT) AS exact_n, cms_n,
               cms_n - CAST(n AS BIGINT) AS overcount
        FROM est
        """
    ),
    tags=("X5", "sketch", "topk"),
)
def x5_countmin_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT Count-Min sketch as pure dataflow with a FULL oracle — the
    hash-checkable twin of ``x5_heavy_hitters`` (approx_top_k's item
    sketch is JVM-internal). {CMS_D} rows x {CMS_W} counters, each
    counter the exact BIGINT sum of every term whose md5-derived row-hash
    lands there; a term's estimate is the MIN across its {CMS_D} counters
    — the classic one-sided bound, cms_n >= exact_n ALWAYS (pinned in
    tests), with overestimate bounded by colliding mass. Probes here are
    the exact top-20 terms so the output exposes (exact, estimate,
    overcount) side by side.

    Scale shape: the only corpus-wide work is the word-count aggregation
    (map-side combinable; the explode is repartitioned first — compact
    single-file inputs otherwise explode on one core). Everything
    downstream operates on the VOCABULARY (|V| x {CMS_D} hash rows ->
    {CMS_D * CMS_W} counters, KB-sized and mergeable by plain addition —
    the property that lets a 1000-executor job keep per-partition
    sketches and combine them in one reduce)."""
    nparts = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(nparts, "doc_id")
    words = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    keyed = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # consumed twice: hash rows + probes
    )
    rs = spark.range(CMS_D).select(F.col("id").cast("long").alias("r"))
    c = cms_hash_col(F.col("r"), F.col("term"))
    hashed = (
        keyed.crossJoin(F.broadcast(rs))
        .select("r", "term", "n", c.alias("c"))
        .localCheckpoint(eager=False)  # consumed twice: counters + probe lookup
    )
    counters = hashed.groupBy("r", "c").agg(F.sum("n").alias("cnt"))
    probes = keyed.orderBy(F.desc("n"), F.asc("term")).limit(20)
    est = (
        F.broadcast(probes)
        .join(hashed.select("r", "term", "c"), "term")
        .join(F.broadcast(counters), ["r", "c"])
        .groupBy("term", "n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    w_rank = Window.orderBy(F.desc("n"), F.asc("term"))  # 20 rows: single task is fine
    return est.select(
        F.row_number().over(w_rank).alias("rank"),
        "term",
        F.col("n").alias("exact_n"),
        "cms_n",
        (F.col("cms_n") - F.col("n")).alias("overcount"),
    )


@query("x5_spacesaving_topk", oracle=None, tags=("X5", "sketch", "topk"))
def x5_spacesaving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch SpaceSaving heavy hitters — the driver-checked batch twin of
    ``streaming/spacesaving.py`` (restores the batch==stream symmetry
    every other sketch lane has): terms shard by the SHARED
    ``ss_shard_col`` hash, per-shard exact counts aggregate
    map-side-combinably, and each shard's sorted (term, count) list folds
    through the SHARED ``apply_spacesaving`` eviction kernel (one copy of
    the rule for the streaming op, this lane, and the pytest replay).
    Deterministic: counts are exact, the fold order is lexicographic, and
    the whole corpus arrives as ONE chunk — so a single-micro-batch drain
    of the streaming twin emits bit-identical summaries (pinned).
    Rows-only for the driver (a sequential fold with eviction has no SQL
    form); ``x5_countmin_terms`` / ``x5_heavy_hitters`` are the
    hash-checkable frequency relatives.

    Scale shape: the corpus-wide work is one map-side-combinable term
    count; the python fold sees only the VOCABULARY of its shard (|V| /
    SS_SHARDS rows, not corpus rows) and carries a CAP=SS_CAP (32)
    candidate map — at 100 TB, raise SS_SHARDS to bound per-shard
    vocabulary; the union of shard summaries stays a valid global
    summary because sharding partitions the item space exactly."""
    import pandas as pd

    from ..streaming.spacesaving import (
        SS_CAP,
        apply_spacesaving,
        ss_shard_col,
    )

    nparts = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(nparts, "doc_id")
    words = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    counts = words.groupBy(
        ss_shard_col(F.col("term")).alias("shard"), "term"
    ).agg(F.count(F.lit(1)).alias("n"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        summary: dict[str, tuple[int, int]] = {}
        adds = sorted(zip(pdf["term"], pdf["n"]))  # lexicographic fold order
        apply_spacesaving(summary, [(t, int(n)) for t, n in adds], SS_CAP)
        kept = sorted(summary)
        return pd.DataFrame(
            {
                "shard": int(pdf["shard"].iloc[0]),
                "term": kept,
                "est": [summary[t][0] for t in kept],
                "err": [summary[t][1] for t in kept],
            }
        )

    return counts.groupBy("shard").applyInPandas(
        fold, "shard long, term string, est long, err long"
    )


@query(
    "x5_unpivot_metrics",
    oracle=dedent(
        """
        WITH a AS (
            SELECT c_mktsegment,
                   ROUND(SUM(c_acctbal), 2) AS total_bal,
                   ROUND(AVG(c_acctbal), 4) AS avg_bal,
                   COUNT(*)::DOUBLE AS n_cust
            FROM customer GROUP BY 1
        )
        SELECT c_mktsegment, metric, value
        FROM a UNPIVOT (value FOR metric IN (total_bal, avg_bal, n_cust))
        """
    ),
    tags=("X5", "unpivot"),
)
def x5_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (DataFrame.melt): per-segment balance metrics
    melt into (segment, metric, value) rows — the metrics-table layout a
    monitoring sink wants. The melt is a narrow projection fan-out (3
    rows per input row, no shuffle beyond the feeding aggregation);
    column-to-row explosion happens AFTER the group-by, so the wide scan
    aggregates once and the unpivot touches |segments| rows."""
    c = table(spark, sf_dir, "customer")
    a = c.groupBy("c_mktsegment").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.count(F.lit(1)).cast("double").alias("n_cust"),
    )
    return a.melt(
        ids=["c_mktsegment"],
        values=["total_bal", "avg_bal", "n_cust"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "w10_ntile_deciles",
    oracle=dedent(
        """
        SELECT c_mktsegment, decile, COUNT(*) AS n,
               ROUND(MIN(c_acctbal), 2) AS lo,
               ROUND(MAX(c_acctbal), 2) AS hi
        FROM (
            SELECT c_mktsegment, c_acctbal,
                   NTILE(10) OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey) AS decile
            FROM customer
        )
        GROUP BY 1, 2
        """
    ),
    tags=("W1", "X5", "ntile"),
)
def w10_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count decile banding per market segment (NTILE): the
    balance-tier report a pricing team asks for. The tie-break on
    c_custkey makes bucket assignment a total order, so Spark and the
    oracle agree row-for-row (NTILE on a partial order is
    engine-dependent for tied rows). One shuffle on the segment key; the
    decile aggregation reuses the window's partitioning."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


@query(
    "x9_shard_manifest",
    oracle=dedent(
        f"""
        SELECT doc_id,
               CAST(CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % {MANIFEST_SHARDS} AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % {MANIFEST_SHARDS}
                    ORDER BY MD5(text), doc_id) AS BIGINT) AS pos
        FROM documents
        """
    ),
    tags=("X1", "X9", "shuffle"),
)
def x9_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards — the manifest a
    pretraining data loader consumes: every document gets a (shard, pos)
    address, shard by content-hash bucket, position by hash order within
    the shard. Content addressing makes the ORDER a property of the corpus,
    not of partition layout or a seed — rerunning after re-ingestion or on
    a different cluster yields byte-identical epoch order (the property
    `rand(seed)`/`repartition` shuffles lack, and the reason dataloader
    "shuffle manifests" are built offline like this at all).

    Plan shape: one window = shuffle into 16 hash partitions + per-shard
    sort — exactly the physical layout of the shard WRITE that follows
    (`partitionBy(shard)` + sorted files), so at 100 TB the sort cost IS
    the write path's sort, not an extra pass; per-shard data is corpus/16,
    and the shard count is the scale knob (a deployment sizes it so a
    shard's manifest fits one task's sort buffer, e.g. 8k shards for a
    100 TB corpus)."""
    docs = table(spark, sf_dir, "documents")
    shard = _md5_bucket("text", MANIFEST_SHARDS).cast("int")
    pos = F.row_number().over(
        Window.partitionBy(shard).orderBy(F.md5("text"), F.col("doc_id"))
    )
    return docs.select(
        "doc_id", shard.alias("shard"), pos.cast("long").alias("pos")
    )


@query(
    "x4_bigram_nll",
    oracle=dedent(
        """
        WITH toks AS (
            SELECT doc_id, source, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        bi AS (
            SELECT doc_id, source,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i])) AS w1,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i+1])) AS w2
            FROM toks WHERE LEN(t) >= 2
        ),
        bi_model AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bi GROUP BY 1, 2),
        prefix AS (SELECT w1, SUM(c_bi) AS c_prefix FROM bi_model GROUP BY 1),
        doc_nll AS (
            SELECT b.doc_id, b.source,
                   AVG(-LN(m.c_bi / CAST(p.c_prefix AS DOUBLE))) AS nll
            FROM bi b
            JOIN bi_model m ON m.w1 = b.w1 AND m.w2 = b.w2
            JOIN prefix p ON p.w1 = b.w1
            GROUP BY 1, 2
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(nll), 6) AS avg_nll,
               ROUND(MIN(nll), 6) AS min_nll,
               ROUND(MAX(nll), 6) AS max_nll
        FROM doc_nll GROUP BY source
        """
    ),
    tags=("X4", "quality", "curation"),
)
def x4_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, the conditional (bigram) case:
    score each document by its mean surprisal −ln p(w_i | w_{i-1}) under
    the corpus's own bigram model — the next step up from
    ``x4_unigram_logprob`` toward the CCNet/KenLM perplexity filters that
    rank web-crawl text (conditional probabilities catch word-salad text
    that unigram frequency alone scores as fluent). Distributed shape: the
    bigram table is materialized once and feeds model counts, prefix
    (context) counts and the scoring join; probabilities are exact corpus
    frequencies (every scored bigram is in the model by construction, so
    no smoothing term is needed); the model joins are unhinted — a
    web-scale bigram vocabulary outgrows any broadcast, and Catalyst picks
    broadcast-vs-shuffle by size. Doc scores aggregate per source."""
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    toks = docs.select("doc_id", "source", t.alias("t")).where(F.size(t) >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(F.col("t")) - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + F.lit(1)).alias("w2"),
        ),
    )
    bi = (
        toks.select("doc_id", "source", F.explode(pairs).alias("p"))
        .select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .localCheckpoint(eager=False)  # feeds model, prefix and scoring
    )
    bi_model = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    prefix = bi_model.groupBy("w1").agg(F.sum("c_bi").alias("c_prefix"))
    doc_nll = (
        bi.join(bi_model, ["w1", "w2"])
        .join(prefix, "w1")
        .groupBy("doc_id", "source")
        .agg(F.avg(-F.log(F.col("c_bi") / F.col("c_prefix").cast("double"))).alias("nll"))
    )
    return doc_nll.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


BLOOM_M = 16384  # filter bits (2^14); sized for the TEST-SF build cardinality
BLOOM_K = 4  # hash functions = disjoint bit fields of ONE 60-bit digest
BLOOM_FIELD = 15  # bits per field (60 / BLOOM_K); low 14 of each are used
BLOOM_SEG = "BUILDING"  # the dim-side predicate whose keys the filter carries


def _bloom_h(key: F.Column) -> F.Column:
    """The ONE per-key digest: 60-bit md5 of the key's string form. All
    BLOOM_K bit positions are disjoint {BLOOM_FIELD}-bit fields of this
    single value — one hash evaluation per row on the probe hot path, not
    k (the standard one-digest/k-fields construction; md5 bits are
    independent, and 2^{BLOOM_FIELD} is a multiple of BLOOM_M so each
    field is uniform mod BLOOM_M)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _bloom_field(i: int, h: str = "h") -> F.Column:
    """Bit position i: field i of the digest column, masked to BLOOM_M."""
    return F.shiftright(F.col(h), BLOOM_FIELD * i).bitwiseAND(F.lit(BLOOM_M - 1))


# The same two steps as DuckDB SQL fragments — ONE definition each, shared
# by the oracle's build and probe sides so a BLOOM_K / field-layout change
# cannot desynchronize them (or the Spark twin).
def _bloom_h_sql(key: str) -> str:
    return (
        f"CAST('0x' || SUBSTR(MD5(CAST({key} AS VARCHAR)), 1, 15) AS BIGINT)"
    )


def _bloom_field_sql(i: int, h: str = "h") -> str:
    return f"(({h} >> {BLOOM_FIELD * i}) & {BLOOM_M - 1})"


_BLOOM_HIT_SQL = [
    f"(COALESCE(w{i}.fw, 0) & (CAST(1 AS BIGINT) << (pr.p{i} % 63))) <> 0"
    for i in range(BLOOM_K)
]
_BLOOM_JOIN_SQL = [
    f"LEFT JOIN words w{i} ON w{i}.word = pr.p{i} // 63" for i in range(BLOOM_K)
]


@query(
    "x5_bloom_semijoin",
    oracle=dedent(
        f"""
        WITH build AS MATERIALIZED (
            SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEG}'
        ),
        bh AS (SELECT {_bloom_h_sql('c_custkey')} AS h FROM build),
        pos AS (
            SELECT UNNEST([{', '.join(_bloom_field_sql(i) for i in range(BLOOM_K))}])
                       AS p
            FROM bh
        ),
        words AS MATERIALIZED (
            SELECT p // 63 AS word,
                   BIT_OR(CAST(1 AS BIGINT) << (p % 63)) AS fw
            FROM pos GROUP BY 1
        ),
        ph AS (
            SELECT YEAR(o_orderdate) AS yr, o_custkey,
                   {_bloom_h_sql('o_custkey')} AS h
            FROM orders
        ),
        probe AS (
            SELECT yr, o_custkey,
                   {', '.join(f'{_bloom_field_sql(i)} AS p{i}' for i in range(BLOOM_K))}
            FROM ph
        ),
        h AS (
            SELECT pr.yr,
                   ({' AND '.join(_BLOOM_HIT_SQL)}) AS pass,
                   (b.c_custkey IS NOT NULL) AS mem
            FROM probe pr
            {' '.join(_BLOOM_JOIN_SQL)}
            LEFT JOIN build b ON b.c_custkey = pr.o_custkey
        )
        SELECT yr, CAST(COUNT(*) AS BIGINT) AS probed,
               CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS bloom_pass,
               CAST(SUM(CASE WHEN mem THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_match,
               CAST(SUM(CASE WHEN pass AND NOT mem THEN 1 ELSE 0 END) AS BIGINT)
                   AS false_pos,
               CAST(SUM(CASE WHEN mem AND NOT pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS false_neg,
               CAST(COUNT(*) - SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS pruned
        FROM h GROUP BY 1
        """
    ),
    tags=("X5", "sketch", "bloom"),
)
def x5_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT Bloom-filter semi-join with a FULL oracle — the
    hash-checkable twin of the runtime bloom filters Spark itself injects
    under joins (the ``bloom_filter_agg`` subqueries the plan sweep
    exempts): build a {BLOOM_M}-bit / {BLOOM_K}-position filter over the
    custkeys of one market segment (the filtered dim side), probe every
    orders row (the fact side), and report per order-year how many probe
    rows the filter would prune before the real join ever shuffles —
    alongside the exact semi-join truth, so false positives are measured,
    and false_neg is computed (and must be 0: a Bloom filter's one hard
    guarantee, pinned in tests).

    Everything is engine-neutral integer arithmetic: ONE 60-bit md5
    digest per key yields all {BLOOM_K} bit positions as disjoint
    {BLOOM_FIELD}-bit fields (one hash evaluation per probe row, not k);
    the filter is {BLOOM_M}/63 ~ 261 BIGINT words (63 usable bits each,
    sign bit unused) built by one map-side-combinable BIT_OR aggregation;
    each probe is {BLOOM_K} broadcast lookups + mask tests — no floats
    anywhere, so every count hash-matches, and the position/word/mask
    formulas are single definitions shared by the Spark code and both
    oracle sides.

    Scale shape: the filter is ~2 KB total — it broadcasts to every
    executor and the probe stays MAP-ONLY (4 tiny broadcast joins + the
    broadcast membership join; zero fact-side exchanges before the final
    per-year aggregation — pinned by a plan test). That is the 100 TB
    point of a bloom semi-join: the fact table is pruned at scan-adjacent
    cost before any shuffle happens. At the tested SFs the measured
    non-member pass rate tracks the textbook (1 - e^(-kn/m))^k curve
    (~0 at sf0.01's n~300, ~7% at sf0.1's n~3000); in production m scales
    with the build-side cardinality estimate exactly as Spark's own
    spark.sql.optimizer.runtime.bloomFilter.* sizing does."""
    cust = table(spark, sf_dir, "customer")
    build = (
        cust.where(F.col("c_mktsegment") == BLOOM_SEG)
        .select("c_custkey")
        .localCheckpoint(eager=False)  # consumed twice: filter build + truth
    )
    pos = build.select(_bloom_h(F.col("c_custkey")).alias("h")).select(
        F.explode(
            F.array(*[_bloom_field(i) for i in range(BLOOM_K)])
        ).alias("p")
    )
    words = (
        pos.groupBy(F.expr("p DIV 63").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))")
            ).alias("fw")
        )
        .localCheckpoint(eager=False)  # consumed BLOOM_K times by the probe
    )
    # md5 once per probe row in its own projection; the per-position
    # fields are cheap integer shifts over that one digest column
    probe = (
        table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").alias("yr"),
            "o_custkey",
            _bloom_h(F.col("o_custkey")).alias("h"),
        )
        .select(
            "yr",
            "o_custkey",
            *[_bloom_field(i).alias(f"p{i}") for i in range(BLOOM_K)],
        )
    )
    j = probe
    hits = []
    for i in range(BLOOM_K):
        wi = words.select(
            F.col("word").alias(f"word{i}"), F.col("fw").alias(f"fw{i}")
        )
        j = j.join(
            F.broadcast(wi), F.expr(f"p{i} DIV 63") == F.col(f"word{i}"), "left"
        )
        hits.append(
            F.expr(
                f"(coalesce(fw{i}, CAST(0 AS BIGINT)) & "
                f"shiftleft(CAST(1 AS BIGINT), CAST(p{i} % 63 AS INT))) != 0"
            )
        )
    j = j.join(
        F.broadcast(build), F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    passed = hits[0]
    for h in hits[1:]:
        passed = passed & h
    flags = j.select(
        "yr",
        passed.alias("pass"),
        F.col("c_custkey").isNotNull().alias("mem"),
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return flags.groupBy("yr").agg(
        F.count(F.lit(1)).alias("probed"),
        one(F.col("pass")).alias("bloom_pass"),
        one(F.col("mem")).alias("exact_match"),
        one(F.col("pass") & ~F.col("mem")).alias("false_pos"),
        one(F.col("mem") & ~F.col("pass")).alias("false_neg"),
        (F.count(F.lit(1)) - one(F.col("pass"))).alias("pruned"),
    )
