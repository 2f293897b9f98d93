"""Partition pruning: a date-partitioned copy of events must be read with
PartitionFilters at the scan — at 100 TB the partition layout, not the row
filter, is what turns a full-corpus scan into a single-day read."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from iii_aibigdata_capstone_spark.catalog import table

from .conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def partitioned_events(spark):
    d = tempfile.mkdtemp(prefix="events_part_")
    shutil.rmtree(d, ignore_errors=True)
    ev = table(spark, TEST_SF_DIR, "events").withColumn(
        "day", F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(d)
    return d


def test_day_filter_becomes_partition_filter(spark, partitioned_events):
    df = (
        spark.read.parquet(partitioned_events)
        .where(F.col("day") == "2024-03-01")
        .select("event_id", "user_id")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the day predicate must live in PartitionFilters, not the data filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line, plan


def test_partitioned_read_matches_unpartitioned(spark, partitioned_events):
    part = (
        spark.read.parquet(partitioned_events)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        table(spark, TEST_SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, plain.collect()))


def test_partitioned_index_store_serve_prunes_cells(spark):
    """THE STORE LAYOUT KNOB, exercised end to end (r13 verdict ask #4):
    the IVF-PQ index saved with ``partition_by={"invl": ["cid"]}`` and
    loaded with ``scan_members=("invl",)`` (plain scan, no checkpoint)
    must serve a probe batch through a DYNAMICALLY PARTITION-PRUNED
    inverted-list scan — the probed cells' broadcast join plants a
    dynamicpruning expression on the store scan's partition filters, so
    at 100 TB each batch reads O(probed cells) of the corpus-sized
    member instead of all of it. Values stay hash-identical to serving
    the in-session index (layout independence)."""
    import os
    import tempfile

    from iii_aibigdata_capstone_spark.operators.similarity import (
        _resident_probe_ids,
        ivf_pq_index,
        ivf_pq_index_load,
        ivf_pq_index_save,
        ivf_pq_serve,
    )

    path = tempfile.mkdtemp(prefix="ivfpq_part_store_")
    try:
        idx = ivf_pq_index(spark, TEST_SF_DIR)
        ivf_pq_index_save(idx, path, partition_by={"invl": ["cid"]})
        # hive-style cell directories on disk — the physical layout
        assert any(
            name.startswith("cid=") for name in os.listdir(os.path.join(path, "invl"))
        )
        loaded = ivf_pq_index_load(spark, path, scan_members=("invl",))
        served = ivf_pq_serve(loaded, _resident_probe_ids(spark))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            served.explain("formatted")
        plan = buf.getvalue()
        assert "dynamicpruning" in plan.lower(), plan
        got = sorted(map(tuple, served.collect()))
        want = sorted(
            map(tuple, ivf_pq_serve(idx, _resident_probe_ids(spark)).collect())
        )
        assert got and got == want
    finally:
        shutil.rmtree(path, ignore_errors=True)
