"""Physical-plan regression guards: the plans we shipped are the plans we
keep. A correctness-neutral edit that drops a broadcast, un-pushes a filter,
or widens a parquet scan is a 100 TB regression that sf0.001 wall-clock will
never notice — so assert the plan shape itself."""

from __future__ import annotations

import contextlib
import io

import pytest

from iii_aibigdata_capstone_spark.queries import flagship, registry

from .conftest import TEST_SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_broadcasts_dims_no_smj(spark):
    p = plan_of(flagship(spark, TEST_SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims broadcast; facts auto-sized by AQE


def test_q1_scan_is_pruned_and_pushed(spark):
    p = plan_of(registry()["q1_pricing_summary"].builder(spark, TEST_SF_DIR))
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    # q1 needs exactly 7 lineitem columns; a wider ReadSchema means pruning broke
    import re

    widths = [len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", p) if s]
    assert widths and max(widths) <= 7, f"scan reads too many columns: {widths}"


def test_p1_filter_reaches_parquet(spark):
    p = plan_of(registry()["p1_scan_project_filter"].builder(spark, TEST_SF_DIR))
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p


def test_j1_dim_side_is_broadcast(spark):
    p = plan_of(registry()["j1_lookup_left_join"].builder(spark, TEST_SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_copartition_pipeline_reuses_exchanges(spark):
    """x8: the explicit repartitions on the join key must be the ONLY data
    exchanges before the final small group-by — the per-order aggregation
    and the join both satisfy their requirement from them. Auto-broadcast
    is disabled to see the at-scale plan (at test SF everything would
    broadcast)."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(registry()["x8_copartition_pipeline"].builder(spark, TEST_SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # exchanges: li repartition, orders repartition, final orderstatus agg
    assert len(re.findall(r"Exchange hashpartitioning", p)) <= 3, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p  # co-located, not broadcast


@pytest.mark.parametrize("qname", ["w2_nms_greedy", "t4_person_assembly"])
def test_grouped_kernels_shuffle_once(spark, qname):
    """Grouped kernels: exactly one hash exchange on the group key feeds the
    Python map (plus AQE bookkeeping); a second data exchange means the
    single-shuffle design regressed."""
    p = plan_of(registry()[qname].builder(spark, TEST_SF_DIR))
    import re

    data_exchanges = re.findall(r"Exchange hashpartitioning", p)
    assert len(data_exchanges) <= 2, p  # initial + AQE-final rendering of the same exchange
    assert "MapInPandas" in p or "mapInPandas" in p.lower()
