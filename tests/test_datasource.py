"""Custom Python DataSource tests: batch partitioning, determinism across
slicings, and the micro-batch stream reaching the same total multiset."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from iii_aibigdata_capstone_spark.sources import register


def _read(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_read_counts_and_schema(spark):
    register(spark)
    df = _read(spark, rows=500, partitions=8)
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert df.select("event_id").distinct().count() == 500


def test_batch_read_deterministic_across_partitioning(spark):
    register(spark)
    a = sorted(map(tuple, _read(spark, rows=300, partitions=3).collect()))
    b = sorted(map(tuple, _read(spark, rows=300, partitions=7).collect()))
    assert a == b


def test_stream_reaches_batch_total(spark):
    register(spark)
    chk = tempfile.mkdtemp(prefix="ds_chk_")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 250)
        .option("rowsPerBatch", 60)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM synth_stream").collect()))
    want = sorted(map(tuple, _read(spark, rows=250, partitions=4).collect()))
    assert got == want  # stream slicing reproduces the batch multiset


def test_filters_apply_on_top(spark):
    register(spark)
    df = _read(spark, rows=400, partitions=4)
    purchases = df.where(F.col("event_type") == "purchase")
    assert purchases.count() == df.collect().__len__() - df.where(
        F.col("event_type") != "purchase"
    ).count()
