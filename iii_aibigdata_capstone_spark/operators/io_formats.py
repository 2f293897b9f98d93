"""File-format sources (SURVEY.md §2.1 S3-S5, S9): CSV with and without
header, raw text lines, and JSON — each materialized to a scratch directory
from the driver's parquet, then read back through the engine's source path
with an explicit ``StructType`` (never ``inferSchema``: schema-on-read with a
declared schema is the §1 contract).

The round-trip IS the test: the oracle reads the original parquet, so any
loss in the write->scan path (quoting, header handling, type coercion,
encoding) shows up as a hash mismatch.
"""

from __future__ import annotations

import os
from textwrap import dedent

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

SCRATCH = "/tmp/iii_capstone_io"

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

_NATION_ORACLE = dedent(
    """
    SELECT n_nationkey, n_name, CAST(n_regionkey AS INTEGER) AS n_regionkey
    FROM nation
    """
)


def _scratch(sf_dir: str, name: str) -> str:
    return os.path.join(SCRATCH, os.path.basename(sf_dir.rstrip("/")), name)


def _nation_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("int"),
    )


@query("s4_csv_explicit_schema", oracle=_NATION_ORACLE, tags=("S4", "S3"))
def s4_csv_explicit_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 headerless CSV scan with declared column names (pi/dl_k_to_ss.py:
    66, 420): write nation as headerless CSV, read it back with an explicit
    schema. S3's header variant is the same reader with header=True
    (qp/ml_model.py:8) — minus the inferSchema, by design."""
    path = _scratch(sf_dir, "nation_csv")
    _nation_df(spark, sf_dir).write.mode("overwrite").option("header", False).csv(path)
    return spark.read.schema(NATION_SCHEMA).option("header", False).csv(path)


@query("s5_text_lines", oracle=_NATION_ORACLE, tags=("S5", "P2", "E5"))
def s5_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 text-file line source with header skip + delimited split
    (qp/ml_source.py:4-8 reads lines, drops the header, strips the trailing
    newline; the consumer splits on ','): read as raw lines, filter the
    header out by content, split positionally, cast."""
    path = _scratch(sf_dir, "nation_txt")
    _nation_df(spark, sf_dir).write.mode("overwrite").option("header", True).csv(path)
    lines = spark.read.text(path)
    parts = F.split(F.rtrim(F.col("value")), ",")
    return (
        lines.where(F.col("value") != "n_nationkey,n_name,n_regionkey")
        .select(
            parts.getItem(0).cast("long").alias("n_nationkey"),
            parts.getItem(1).alias("n_name"),
            parts.getItem(2).cast("int").alias("n_regionkey"),
        )
    )


@query(
    "s9_json_roundtrip",
    oracle=dedent(
        """
        SELECT s_suppkey, s_name, CAST(s_nationkey AS INTEGER) AS s_nationkey,
               ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        """
    ),
    tags=("S9",),
)
def s9_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 JSON IO (pi/digit_detector/file_io.py:54-77): write supplier as
    JSON lines, read back with an explicit schema (no sampling-based
    inference pass — at 100 TB an inference pre-scan is a full extra read)."""
    path = _scratch(sf_dir, "supplier_json")
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )
    sup.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(path).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@query(
    "s6_binary_file_scan",
    oracle=dedent(
        """
        SELECT doc_id,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               SHA256(text) AS sha
        FROM documents
        WHERE doc_id % 10 = 0
        """
    ),
    tags=("S6", "S10"),
)
def s6_binary_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 image-file scan (pi/dl_source1.py:7-8 cv2.imread of files on disk)
    + S10 recursive listing (file_io.py:136-181): materialize every 10th
    document as its own binary file under a nested directory tree (one
    subdir per lang), scan with the ``binaryFile`` source +
    ``recursiveFileLookup``, recover the id from the path. The digest ties
    each scanned blob back to the original row — a lost/duplicated/mangled
    file fails the oracle."""
    import shutil

    root = _scratch(sf_dir, "blobs")
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "lang", "text")
    )
    shutil.rmtree(root, ignore_errors=True)
    for row in docs.toLocalIterator():  # source *preparation*, not the operator
        d = os.path.join(root, row.lang)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{row.doc_id}.bin"), "wb") as f:
            f.write(row.text.encode("utf-8"))
    blobs = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.bin")
        .load(root)
    )
    return blobs.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.octet_length(F.col("content")).cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha"),
    )


@query(
    "s_orc_roundtrip",
    oracle=dedent(
        """
        SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        """
    ),
    tags=("S9", "orc"),
)
def s_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: write the documents metadata columns as ORC
    (columnar, predicate-pushdown-capable — the other first-class columnar
    format besides parquet), read back with the declared schema. Any type
    coercion or row loss in the ORC write->scan path fails the oracle.
    """
    path = _scratch(sf_dir, "documents_orc")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    docs.write.mode("overwrite").orc(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.read.schema(schema).orc(path)
