"""Driver-contract shape tests (the probes from the verify recipe, made
permanent): entry() is idempotent, bad paths fail loudly, and every oracle
key maps to a real query."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_entry_runs_twice(spark):
    a = E.entry(spark).collect()
    b = E.entry(spark).collect()
    assert len(a) == len(b) > 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_oracle_keys_subset_of_queries():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 75  # registry should only grow


def test_bogus_sf_dir_raises(spark):
    from pyspark.errors import AnalysisException

    qs = E.queries()
    with pytest.raises(AnalysisException):
        qs["q1_pricing_summary"](spark, "/root/testdata/sf_does_not_exist").collect()


def test_all_queries_have_unique_sorted_columns():
    """The driver sorts columns by name before hashing — duplicate column
    names in any query output would make the comparison ambiguous."""
    from iii_aibigdata_capstone_spark.queries import ALL_SPECS

    assert len({s.name for s in ALL_SPECS}) == len(ALL_SPECS)


def test_temp_view_queries_are_idempotent(spark):
    """Queries that register temp views (grouping sets, UDTF) must be
    re-runnable in one session — createOrReplaceTempView, never create."""
    qs = E.queries()
    for name in ("x5_grouping_sets", "x4_sentence_spans"):
        a = sorted(map(tuple, qs[name](spark, "/root/testdata/sf0.001").collect()))
        b = sorted(map(tuple, qs[name](spark, "/root/testdata/sf0.001").collect()))
        assert a == b and len(a) > 0
