"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`iii_aibigdata_capstone_spark.queries` — the engine's
query registry. Each registry entry pairs a Spark DataFrame builder with an
ANSI-SQL DuckDB oracle (or ``None`` for non-SQL-expressible operators such
as greedy NMS / LSH / model scoring, which get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iii_aibigdata_capstone_spark import queries as q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: spec.builder for spec in q.ALL_SPECS}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables. Omitted for non-SQL-expressible operators."""
    return {spec.name: spec.oracle for spec in q.ALL_SPECS if spec.oracle is not None}
