"""Dominant-color KMeans (SURVEY.md §2.9 M4) and the model evaluator (M8).

Reference: pi/dl_k_to_ss.py:326-336 reshapes one torso crop to pixel rows
(T3), runs sklearn KMeans(k=5) over them (M4), histograms the labels
(A3/A4) and takes the argmax cluster (A5) as the dominant jersey color.
qp/ml_model.py:31-33 intends (commented out) a BinaryClassificationEvaluator
(M8).

Rebuild: the pixel table is relational (posexplode), KMeans is MLlib over
the distributed pixel rows — the batch-scale variant SURVEY.md §2.9 calls
for (the per-image variant stays inside the color UDF). Histogram + argmax
are pure Catalyst.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


def pixel_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 pixel table: consecutive embedding triples as (r,g,b)-like rows,
    scaled to 0..255. Deterministic, derived from the embeddings parquet."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    trip = F.transform(
        F.sequence(F.lit(0), F.floor(F.size(v) / 3).cast("int") - 1),
        lambda i: F.struct(
            F.element_at(v, i * 3 + 1).alias("r"),
            F.element_at(v, i * 3 + 2).alias("g"),
            F.element_at(v, i * 3 + 3).alias("b"),
        ),
    )
    return (
        e.select("vec_id", F.posexplode(trip).alias("pix_idx", "p"))
        .select(
            "vec_id",
            "pix_idx",
            (F.col("p.r") * 128 + 128).alias("r"),
            (F.col("p.g") * 128 + 128).alias("g"),
            (F.col("p.b") * 128 + 128).alias("b"),
        )
    )


@query("m4_kmeans_dominant", oracle=None, tags=("M4", "T3", "A3", "A4", "A5", "ml"))
def m4_kmeans_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 KMeans(k=5, fixed seed) over the distributed pixel table, then the
    A3-A5 chain relationally: label histogram, share normalization (count /
    sum over ()), dominant flag via max_by comparison. Rows-only (cluster
    assignment is not SQL-expressible); row count is pinned at k=5."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    px = pixel_rows(spark, sf_dir)
    feats = VectorAssembler(inputCols=["r", "g", "b"], outputCol="features").transform(px)
    model = KMeans(k=5, seed=42, featuresCol="features", predictionCol="cluster").fit(feats)
    labeled = model.transform(feats)
    hist = labeled.groupBy("cluster").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    dominant = F.max("cnt").over(Window.partitionBy())
    return (
        hist.select(
            "cluster",
            "cnt",
            F.round(F.col("cnt") / total, 6).alias("share"),  # A4
            (F.col("cnt") == dominant).alias("is_dominant"),  # A5
        )
        .orderBy("cluster")
    )


@query("m8_binary_evaluator", oracle=None, tags=("M8", "ml"))
def m8_binary_evaluator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 BinaryClassificationEvaluator (qp/ml_model.py:31-33, commented out
    in the reference — implemented here): areaUnderROC + areaUnderPR of the
    quarter model on a held-out slice (game_id % 5 == 0, never trained on a
    distinct slice — the reference evaluates in-sample; we keep its scoring
    frame but report both metrics)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from .quarter import LABEL_COL, fit_quarter_model, quarter_stats_frame

    model = fit_quarter_model(spark, sf_dir)
    holdout = quarter_stats_frame(spark, sf_dir).where(F.col("game_id") % 5 == 0)
    scored = model.transform(holdout)
    rows = []
    for metric in ("areaUnderROC", "areaUnderPR"):
        ev = BinaryClassificationEvaluator(
            labelCol=LABEL_COL, rawPredictionCol="rawPrediction", metricName=metric
        )
        rows.append((metric, round(ev.evaluate(scored), 6)))
    return spark.createDataFrame(rows, "metric string, value double")
