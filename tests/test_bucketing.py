"""Bucketed-table co-located join: writing both sides bucketed on the join
key lets the join run with NO shuffle exchange at all — the disk layout IS
the partitioning. This is the 100 TB form of x8_copartition_pipeline."""

from __future__ import annotations

import contextlib
import io

import pytest

from iii_aibigdata_capstone_spark.catalog import table

from .conftest import TEST_SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tbl = f"bkt_{name}"
        if not spark.catalog.tableExists(tbl):
            # the in-memory catalog forgets tables between runs but their
            # warehouse directories persist; clear before re-creating
            shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
            (
                table(spark, TEST_SF_DIR, name)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(tbl)
            )
    return "bkt_lineitem", "bkt_orders"


@contextlib.contextmanager
def no_auto_broadcast(spark):
    """At test SF everything fits a broadcast, which would bypass the
    bucketed path entirely; disable it to exercise the at-scale plan."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_orderstatus")
    with no_auto_broadcast(spark):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # bucket layout satisfies distribution
        assert "SortMergeJoin" in plan
        assert joined.count() == table(spark, TEST_SF_DIR, "lineitem").count()


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), spark.table(li_t).l_orderkey == spark.table(o_t).o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    li = table(spark, TEST_SF_DIR, "lineitem")
    o = table(spark, TEST_SF_DIR, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_compaction_preserves_rows_and_packs_files(spark):
    """x8_compaction: the rewrite must preserve the row multiset size and
    strictly reduce the file count of the fragmented layout (bin-packed to
    the byte target, so tiny inputs collapse to one file)."""
    from iii_aibigdata_capstone_spark.queries import registry

    rows = {
        r.layout: r
        for r in registry()["x8_compaction"].builder(spark, TEST_SF_DIR).collect()
    }
    assert rows["fragmented"].n_rows == rows["compacted"].n_rows
    assert rows["fragmented"].n_files == 64
    assert 1 <= rows["compacted"].n_files < rows["fragmented"].n_files
