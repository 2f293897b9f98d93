"""Local mirror of the driver's correctness gate: every registered query
with an oracle must match DuckDB exactly (row count + column names +
order-insensitive values) on the sf0.001 tables.
"""

from __future__ import annotations

import pytest

from iii_aibigdata_capstone_spark.queries import ALL_SPECS, flagship

from .conftest import TEST_SF_DIR, normalize_rows

ORACLE_SPECS = [s for s in ALL_SPECS if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in ALL_SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_query_matches_oracle(spec, spark, oracle_con):
    sdf = spec.builder(spark, TEST_SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = oracle_con.sql(spec.oracle)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{spec.name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{spec.name}: row count {len(s_rows)} != {len(d_rows)}"

    _, s_norm = normalize_rows(s_cols, s_rows)
    _, d_norm = normalize_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)}/{len(s_norm)} rows differ; first: "
        f"spark={mismatches[0][0]!r} duckdb={mismatches[0][1]!r}"
    )


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS] or ["none"])
def test_rows_only_query_runs(spec, spark):
    if spec == "none":
        pytest.skip("no rows-only specs")
    sdf = spec.builder(spark, TEST_SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_flagship_entry(spark):
    df = flagship(spark, TEST_SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "n_name", "revenue", "n_lines", "rank_in_region"]
