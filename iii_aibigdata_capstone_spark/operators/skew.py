"""Skew-mitigation operators (BASELINE.json north star: '100 TB scale').

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew transparently. These operators are the
EXPLICIT forms for the cases AQE cannot fix:

- a hot grouping key whose single reducer OOMs -> two-phase salted
  aggregation (partial per (key, salt), final per key);
- a hot join key in a large-large join -> salt the fact side, replicate the
  dim side per salt, join on (key, salt).

Both are oracle-checked equal to their unsalted equivalents — salting is a
physical rewrite, never a semantic one.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

N_SALTS = 16


@query(
    "x7_salted_agg",
    oracle=dedent(
        """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY user_id
        """
    ),
    tags=("X5", "skew"),
)
def x7_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: partial agg on (user_id, salt) spreads
    a hot user over N_SALTS reducers, final agg on user_id combines the
    partials. Identical result to the direct groupBy (the oracle); the salt
    only reshapes the shuffle. Count/sum re-aggregate losslessly — for
    non-decomposable aggs (median, exact distinct) use this shape with
    sketch partials instead."""
    ev = table(spark, sf_dir, "events")
    salt = F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(N_SALTS))
    partial = (
        ev.withColumn("salt", salt)
        .groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"), F.round(F.sum("pv"), 2).alias("total_value")
    )


@query(
    "x7_salted_join",
    oracle=dedent(
        """
        WITH user_orders AS (
            SELECT o_custkey AS user_id, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT e.user_id, COUNT(*) AS n_events, MIN(u.n_orders) AS n_orders
        FROM events e JOIN user_orders u ON e.user_id = u.user_id
        GROUP BY e.user_id
        """
    ),
    tags=("X5", "skew"),
)
def x7_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted large-large equi join: the fact side gets a random-but-
    deterministic salt in [0, N_SALTS); the other side is replicated once
    per salt value (explode of a sequence — N_SALTS x dim rows, NOT a
    broadcast: this shape is for dims too big to broadcast whose join key
    is hot). Join on (key, salt) splits each hot key across N_SALTS
    reducers. Result is oracle-identical to the plain join."""
    ev = table(spark, sf_dir, "events")
    user_orders = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    fact = ev.withColumn(
        "salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(N_SALTS))
    )
    dim = user_orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    joined = fact.join(dim, ["user_id", "salt"])
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.min("n_orders").alias("n_orders")
    )


@query(
    "x8_copartition_pipeline",
    oracle=dedent(
        """
        WITH li AS (
            SELECT l_orderkey, COUNT(*) AS n_items,
                   SUM(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(li.n_items) AS BIGINT) AS n_items, ROUND(SUM(li.revenue), 2) AS revenue
        FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
        """
    ),
    tags=("X5", "copartition"),
)
def x8_copartition_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning reuse — the bucketing story without a metastore: both
    fact tables are explicitly hash-repartitioned on the join key ONCE;
    the per-order aggregation and the orders join then both satisfy their
    distribution requirement from that same exchange (EnsureRequirements
    inserts no further shuffle — asserted in tests/test_plans.py). At
    cluster scale the same co-location comes from bucketed tables on disk
    (`bucketBy(orderkey)`, tested in tests/test_bucketing.py) so even the
    initial exchanges disappear."""
    li = table(spark, sf_dir, "lineitem").repartition(F.col("l_orderkey"))
    o = table(spark, sf_dir, "orders").repartition(F.col("o_orderkey"))
    # revenue stays unrounded until the final aggregate: rounding partials
    # hits half-cent boundaries differently across engines (see verify skill)
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    joined = per_order.join(o, per_order.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_items").alias("n_items"),
        F.round(F.sum("revenue"), 2).alias("revenue"),
    )


@query("x8_compaction", oracle=None, tags=("X8", "maintenance"))
def x8_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the table-maintenance operator every
    100 TB lake runs nightly: a fragmented ingest layout (here: the events
    table scattered across 64 tiny parquet files, the shape micro-batch
    sinks produce) is rewritten by measuring the ACTUAL on-disk bytes and
    bin-packing into ceil(bytes / target_file_size) range-partitioned,
    sorted output files. repartitionByRange + sortWithinPartitions gives
    the rewrite a clustering key for free (the z-order-lite layout
    x8_zorder_layout measures), so compaction doubles as data-layout
    optimization. Returns the before/after layout manifest; filesystem
    effect, hence rows-only for the oracle."""
    import math
    import os
    import shutil
    import tempfile

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = tempfile.mkdtemp(prefix="compaction_")
    try:
        frag_dir, comp_dir = f"{base}/fragmented", f"{base}/compacted"
        ev.repartition(64).write.mode("overwrite").parquet(frag_dir)

        def layout(path: str) -> tuple[int, int]:
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            return len(files), sum(os.path.getsize(f) for f in files)

        n_frag, frag_bytes = layout(frag_dir)
        target = 4 * 1024 * 1024  # bytes/file; a deployment knob (~128 MiB on a lake)
        n_out = max(1, math.ceil(frag_bytes / target))
        (
            spark.read.parquet(frag_dir)
            .repartitionByRange(n_out, "event_id")
            .sortWithinPartitions("event_id")
            .write.mode("overwrite")
            .parquet(comp_dir)
        )
        n_comp, _ = layout(comp_dir)
        rows = [
            ("fragmented", n_frag, spark.read.parquet(frag_dir).count()),
            ("compacted", n_comp, spark.read.parquet(comp_dir).count()),
        ]
    finally:
        # the manifest rows above are fully computed (counts are actions),
        # so the staging copies can go — ADVICE r2: don't leak 2x the
        # events table into /tmp per invocation
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "layout string, n_files int, n_rows long")
