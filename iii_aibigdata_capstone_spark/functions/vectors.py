"""Vector math over ``array<float/double>`` columns as Catalyst expressions.

All of these stay JVM-side (higher-order functions ``zip_with`` /
``aggregate``), so embedding similarity never crosses into Python. The
float -> double upcast happens once per vector, not per pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (left-fold accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def l2_dist_sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def int_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<bigint> columns in exact int64 — the
    quantized-code path (SQ8/PQ): no float rounding can enter the
    accumulation, so the result is engine-reproducible by construction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Project (vec_id, v: array<double>, norm) from an embeddings table —
    upcast and norm computed once, reused across every pairwise comparison.
    """
    out = embeddings.select(
        "vec_id",
        *(c for c in embeddings.columns if c not in ("vec_id", vec_col)),
        as_double_array(F.col(vec_col)).alias("v"),
    )
    return out.withColumn("norm", l2_norm(F.col("v")))
