"""Assemble the full query registry from the operator modules.

``__spark_entry__.py`` (the driver contract) is a thin adapter over this
module: ``queries()``/``oracle_sql()`` are derived from :data:`ALL_SPECS`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .catalog import table
from .registry import QuerySpec


# Queries that already earned a fully-green driver CORRECTNESS row in round 1
# (rows + schema + hash, or the intended rows-only record for sketch queries).
# The driver verifies queries in registration order and may stop early on a
# time budget, so anything in this set registers LAST — never-verified queries
# get first claim on the driver's oracle budget. ``ts_rollup_hierarchy`` is
# deliberately absent (hash FAIL in r01; must re-verify).
_VERIFIED_R01: frozenset[str] = frozenset(
    {
        "p1_scan_project_filter", "p3_csv_schema_roundtrip", "p11_conditional_message",
        "e_expression_surface", "q1_pricing_summary", "a1_group_median",
        "a4_histogram_share", "a5_mode_per_user", "a8_detector_eval",
        "a10_group_prune_having", "p8_angles_exists_filter", "w1_rank_and_lag",
        "w4_relative_top_area", "w5_digit_compose", "j1_lookup_left_join",
        "j2_zip_by_rownumber", "j3_iou_theta_join", "j5_nearest_centroid",
        "q3_top_revenue_orders", "q5_region_revenue", "t1_union_by_name",
        "t5_pos_neg_labeling", "x5_semi_join", "x5_anti_join",
        "x5_intersect_years", "x5_except_years", "x5_rollup_region_nation",
        "x5_cube_status_priority", "x5_grouping_sets", "x5_count_distinct",
        "x5_approx_count_distinct", "x5_approx_quantiles", "x5_histogram_bins",
        "w9_distribution_ranks", "x5_snapshot_diff", "x5_regression_stats",
        "x5_range_join", "x5_asof_join", "x5_asof_forward",
        "st5_tumbling_window", "st5_sliding_window", "st5_session_window",
        "ts_gap_fill", "x5_funnel_stages", "x5_cdc_merge",
        "ts_incremental_rollup", "x5_interval_join_banded", "x1_exact_dedup",
        "x1_content_hash_dedup",
    }
)


def _collect_specs() -> list[QuerySpec]:
    from .operators import relational

    modules = [relational]
    for name in (
        "timeseries",
        "dedup",
        "similarity",
        "textual",
        "grouped",
        "multimodal",
        "surface",
        "io_formats",
        "kernels",
        "replay",
        "skew",
        "curation",
        "graph",
        "analytics",
    ):
        try:
            module = __import__(f"{__package__}.operators.{name}", fromlist=["SPECS"])
        except ImportError:
            continue
        modules.append(module)
    try:
        from .ml import cluster, quarter

        modules.extend([quarter, cluster])
    except ImportError:
        pass
    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for module in modules:
        for spec in module.SPECS:
            if spec.name in seen:
                raise ValueError(f"duplicate query name {spec.name!r}")
            seen.add(spec.name)
            specs.append(spec)
    # Stable partition: driver-unverified queries first (they need a
    # CORRECTNESS row this round), round-1-green queries last. Within each
    # group the module order above is preserved.
    specs.sort(key=lambda spec: spec.name in _VERIFIED_R01)
    return specs


ALL_SPECS: list[QuerySpec] = _collect_specs()


def registry() -> dict[str, QuerySpec]:
    return {spec.name: spec for spec in ALL_SPECS}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end query: scan -> filter -> 5-way join ->
    aggregate -> window rank (SURVEY.md §7's 'relational spine').

    Revenue per nation with a per-region rank, top 3 nations per region.
    region/nation broadcast; one shuffle for the big join spine, one for
    the (tiny) windowed ranking.
    """
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_nation = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("revenue"), F.asc("n_name"))
    return (
        per_nation.withColumn("rank_in_region", F.row_number().over(w))
        .where(F.col("rank_in_region") <= 3)
        .select("r_name", "n_name", "revenue", "n_lines", "rank_in_region")
    )
