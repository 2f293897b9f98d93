"""Table catalog over the driver-provided parquet directories.

The reference has no table abstraction (SURVEY.md §1): it reads CSVs on the
driver and captures them in closures. Here every input is a named parquet
relation loaded through ``spark.read.parquet`` so Catalyst gets column
pruning + filter pushdown + partition-sized splits for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that stay tiny at ANY scale factor (TPC-H semantics:
# region=5 rows, nation=25 rows forever). Always broadcast them.
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong=true surfaced epoch-nanos; floor to micros and make a
        # naive (NTZ) timestamp — matches DuckDB's ns->us parquet read.
        import pyspark.sql.functions as F

        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in names]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
