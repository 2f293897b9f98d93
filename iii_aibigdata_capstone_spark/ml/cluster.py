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
from ..operators.textual import STOPWORDS
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
    frame but report both metrics). Since r5 the metrics run through the
    DISTRIBUTED rank-statistics path (ml/metrics.binary_rank_metrics) —
    Catalyst window/aggregate over the scored rows, no driver-side
    ``evaluate()`` loop — which is the shape that scores 100 TB; equality
    with MLlib's evaluator is pinned in tests/test_ml_quarter.py. Still
    rows-only for the driver (RF probabilities are seeded MLlib); the
    hash-checked twin over deterministic logits is m8_rank_metrics."""
    from pyspark.ml.functions import vector_to_array

    from .metrics import binary_rank_metrics
    from .quarter import LABEL_COL, fit_quarter_model, quarter_stats_frame

    model = fit_quarter_model(spark, sf_dir)
    holdout = quarter_stats_frame(spark, sf_dir).where(F.col("game_id") % 5 == 0)
    scored = model.transform(holdout).select(
        F.element_at(vector_to_array("probability"), 2).alias("score"),
        F.col(LABEL_COL).alias("y"),
    )
    return binary_rank_metrics(scored, "score", "y").select(
        "metric", F.round("value", 6).alias("value")
    )


# --- M9: the training LOOP as dataflow -------------------------------------

GD_ITERS = 8
GD_LR = 0.5
GD_SCALE = 100
_GD_LR_SQL = f"CAST({GD_LR} AS DOUBLE)"
_GD_SCALE_SQL = f"CAST({GD_SCALE} AS DOUBLE)"


def _gd_oracle() -> str:
    """Unrolled full-batch gradient descent as MATERIALIZED CTEs (the
    PageRank technique). Each iteration: per-doc sigmoid under the
    previous weights (CROSS JOIN of the 1-row weight table), one AVG
    aggregation per gradient component, broadcast-shaped weight update.
    All constants forced DOUBLE; the sigmoid/gradient expression trees
    match the Spark side term for term, so only float-summation order
    diverges (~1e-14 after 8 iterations, invisible at round-6)."""
    steps = []
    dot = " + ".join(f"w{j} * x{j}" for j in range(5))
    for k in range(1, GD_ITERS + 1):
        grads = ", ".join(
            f"AVG((1 / (1 + EXP(-({dot}))) - y) * x{j}) AS g{j}" for j in range(5)
        )
        upd = ", ".join(f"w{j} - {_GD_LR_SQL} * g{j} AS w{j}" for j in range(5))
        steps.append(
            f""",
        g{k} AS MATERIALIZED (
            SELECT {grads} FROM f CROSS JOIN w{k - 1}
        ),
        w{k} AS MATERIALIZED (
            SELECT {upd} FROM w{k - 1} CROSS JOIN g{k}
        )"""
        )
    unpivots = "\n            UNION ALL ".join(
        f"SELECT {j} AS feature_idx, ROUND(w{j}, 6) AS weight FROM w{GD_ITERS}"
        for j in range(5)
    )
    return f"""
        WITH f AS MATERIALIZED (
            SELECT CAST(1 AS DOUBLE) AS x0,
                   LEN(STRING_SPLIT(text, ' ')) / {_GD_SCALE_SQL} AS x1,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   t -> t IN {STOPWORDS!r})) / {_GD_SCALE_SQL} AS x2,
                   LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) / {_GD_SCALE_SQL} AS x3,
                   n_chars / {_GD_SCALE_SQL} AS x4,
                   CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
                        ELSE CAST(0 AS DOUBLE) END AS y
            FROM documents
        ),
        w0 AS MATERIALIZED (
            SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                   CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3,
                   CAST(0 AS DOUBLE) AS w4
        ){"".join(steps)}
        SELECT CAST(feature_idx AS BIGINT) AS feature_idx, weight
        FROM ({unpivots})
        """


@query("m9_gd_training_loop", oracle=_gd_oracle(), tags=("M9", "X4", "iterative"))
def m9_gd_training_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M9 training LOOP re-expressed as dataflow (reference
    digit_detector/train.py:11-71 — a single-node Keras fit). Training a
    CNN is out of engine scope (the engine consumes weights), but the
    LOOP ITSELF — the part that must scale with data — is distributed
    logistic regression by full-batch gradient descent: per iteration,
    each document computes its sigmoid under the broadcast weights (one
    narrow pass), the gradient is ONE map-side-combined aggregation (5
    AVGs -> a single row), and the weight update is a 1-row-by-1-row
    cross join — the parameter-server-less data-parallel shape every
    distributed trainer lowers to. No driver action anywhere in the
    loop; ``localCheckpoint`` per iteration keeps the plan flat (the
    PageRank discipline). Features are the quality model's (scaled);
    the label (lang='en') is deliberately weak — determinism of the
    trajectory, not accuracy, is the contract, and the unrolled-CTE
    oracle checks all 8 iterations of it exactly."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scale = F.lit(GD_SCALE).cast("double")
    f = docs.select(
        F.lit(1).cast("double").alias("x0"),
        (F.size(toks) / scale).alias("x1"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
            / scale
        ).alias("x2"),
        (F.size(F.array_distinct(toks)) / scale).alias("x3"),
        (F.col("n_chars") / scale).alias("x4"),
        F.when(F.col("lang") == "en", F.lit(1).cast("double"))
        .otherwise(F.lit(0).cast("double"))
        .alias("y"),
    ).localCheckpoint(eager=False)  # consumed once per iteration

    w = f.sparkSession.range(1).select(
        *[F.lit(0).cast("double").alias(f"w{j}") for j in range(5)]
    )
    for k in range(GD_ITERS):
        joined = f.crossJoin(F.broadcast(w))
        dot = sum((F.col(f"w{j}") * F.col(f"x{j}") for j in range(1, 5)),
                  F.col("w0") * F.col("x0"))
        p = F.lit(1).cast("double") / (F.lit(1).cast("double") + F.exp(-dot))
        grad = joined.agg(
            *[F.avg((p - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}") for j in range(5)]
        )
        w = (
            w.crossJoin(F.broadcast(grad))
            .select(
                *[
                    (F.col(f"w{j}") - F.lit(GD_LR).cast("double") * F.col(f"g{j}")).alias(
                        f"w{j}"
                    )
                    for j in range(5)
                ]
            )
            .localCheckpoint(eager=False)
        )
    rows = [
        w.select(
            F.lit(j).cast("long").alias("feature_idx"),
            F.round(F.col(f"w{j}"), 6).alias("weight"),
        )
        for j in range(5)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
