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


def test_rotation_touched_lanes_outrank_stale_greens():
    """r15 rotation contract (VERDICT r14 item 3): within the
    driver-verified group, every lane whose builder module was committed
    AFTER the lane's last green CORRECTNESS artifact must register ahead
    of every unchanged lane — changed code's old green row is weaker
    evidence than any unchanged lane's staleness. Skips cleanly when git
    metadata is unavailable (the documented fallback is pure staleness)."""
    import pytest

    from iii_aibigdata_capstone_spark import queries as Q

    touched = Q._touched_since_green(Q.ALL_SPECS)
    if not touched:
        pytest.skip("no git metadata or nothing touched since last green")
    verified_order = [
        s.name
        for s in Q.ALL_SPECS
        if s.name in Q._DRIVER_HASH_VERIFIED
        or (s.oracle is None and s.name in Q._DRIVER_ROWS_ONLY)
    ]
    untouched_idx = [
        i for i, n in enumerate(verified_order) if n not in touched
    ]
    touched_idx = [i for i, n in enumerate(verified_order) if n in touched]
    if touched_idx and untouched_idx:
        assert max(touched_idx) < min(untouched_idx), (
            "a touched-since-green lane registers behind an unchanged lane"
        )


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


def _sf1_dir():
    import os

    d = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/_testdata/sf1")
    return d if os.path.isdir(d) else None


def test_sf1_unroll_slack_guards():
    """When the perf-probe sf1 slice exists (tools/gen_sf1.py), re-assert
    the fixed-unroll slack arguments one decade up: BFS seed-set
    eccentricity and community-LPA fixpoint depth must still fit their
    8-round unrolls (the probe times a TRUNCATED run otherwise, silently).
    Pure-python replay over the thinned purchase graph — no Spark."""
    import duckdb
    import pytest

    from .graph_replay import build_adjacency, h60, python_bfs, python_lpa_fixpoint

    sf1 = _sf1_dir()
    if sf1 is None:
        pytest.skip("sf1 perf slice not generated")
    from iii_aibigdata_capstone_spark.operators.graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        COMM_ROUNDS,
        COMM_SEED_MOD,
        COMM_SHIFT,
        COMM_UNREACHED,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT o.o_custkey, l.l_suppkey + 1000000 "
        f"FROM '{sf1}/lineitem.parquet' l "
        f"JOIN '{sf1}/orders.parquet' o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_quantity >= 45"
    ).fetchall()
    con.close()
    adj = build_adjacency(rows)

    seeds = {
        n for n in adj if n >= 1_000_000 and (n - 1_000_000) % BFS_SEED_MOD == 0
    }
    assert seeds
    _lvl, depth = python_bfs(adj, seeds)
    assert depth - 1 <= BFS_ROUNDS, f"sf1 eccentricity {depth - 1} exceeds unroll"

    cseeds = {n for n in adj if h60(str(n)) % COMM_SEED_MOD == 0}
    _p, rounds = python_lpa_fixpoint(
        adj, cseeds, COMM_SHIFT, COMM_UNREACHED * COMM_SHIFT
    )
    assert rounds <= COMM_ROUNDS, f"sf1 LPA fixpoint {rounds} exceeds unroll"
