"""Shared fixtures: one SparkSession and one DuckDB oracle per test run."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iii_aibigdata_capstone_spark.catalog import TABLES
from iii_aibigdata_capstone_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    n = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    session = get_spark(
        app_name="iii-capstone-tests", master=f"local[{n}]", shuffle_partitions=int(n)
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def oracle_con():
    """DuckDB connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TEST_SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize_rows(columns, rows):
    """Mirror the driver's compare: sort columns by name, then sort rows.

    Values are kept exact (no tolerance) — queries are responsible for
    rounding floats so both engines agree bit-for-bit.
    """
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # normalize -0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r))
    return [c for _, c in sorted(zip(range(len(columns)), columns), key=lambda p: columns[p[0]])], out
