"""Quarter-prediction MLlib pipeline (SURVEY.md §2.9 M1-M3, M8; §3.3).

Reference: qp/ml_model.py trains OneHotEncoderEstimator -> VectorAssembler
-> RandomForestClassifier(maxDepth=6, numTrees=14, entropy) on
train_data.csv and saves three separate artifacts; qp/ml_k_to_ss.py then
RELOADS AND RE-FITS the encoder on every 1-second micro-batch
(ml_k_to_ss.py:22-23) — a correctness bug (category indices can shift
per batch) and a performance bug (3 disk loads/batch on the driver).

Rebuild: ONE ``Pipeline`` fit ONCE, applied as a single ``PipelineModel``
everywhere (batch + stream). The per-batch refit disappears by
construction; tests pin stable category encoding across disjoint slices.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

# 15-column quarter_stats schema (FIXTURES.md §1; train_data.csv:1).
FEATURE_COLS = [
    "teamNumber",
    "enemyNumber",
    "fastBreak",
    "restrictedNumber",
    "perimeterNumber",
    "threeNumber",
    "freethrowNumber",
    "assist",
    "steal",
    "block",
    "foul",
    "turnover",
    "enemyPeriodScore",
]
LABEL_COL = "winPeriod"
CATEGORICAL_COL = "enemyStyle"


def quarter_stats_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quarter_stats-shaped table derived from ``orders`` —
    same schema and value ranges as the reference's train_data.csv
    (FIXTURES.md §1), keyed arithmetic so every run sees identical rows.
    The label has real signal (teamNumber vs enemyNumber + turnovers) so
    the RF learns structure, as in the reference data."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    df = o.select(
        k.alias("game_id"),
        (k % 3).cast("int").alias("enemyStyle"),
        (5 + k % 9).cast("int").alias("teamNumber"),
        (5 + (k * 3 + 1) % 10).cast("int").alias("enemyNumber"),
        ((k * 7) % 6).cast("int").alias("fastBreak"),
        ((k * 11) % 14).cast("int").alias("restrictedNumber"),
        ((k * 13) % 9).cast("int").alias("perimeterNumber"),
        ((k * 17) % 24).cast("int").alias("threeNumber"),
        ((k * 19) % 9).cast("int").alias("freethrowNumber"),
        ((k * 23) % 7).cast("int").alias("assist"),
        ((k * 29) % 11).cast("int").alias("steal"),
        ((k * 31) % 4).cast("int").alias("block"),
        ((k * 37) % 6).cast("int").alias("foul"),
        ((k * 41) % 9).cast("int").alias("turnover"),
        ((k * 43) % 25).cast("int").alias("enemyPeriodScore"),
    )
    label = (
        (F.col("teamNumber") - F.col("enemyNumber")) * 3
        + F.col("fastBreak")
        - F.col("turnover")
        + (F.col("game_id") % 5)  # noise term
        > 0
    )
    return df.withColumn(LABEL_COL, label.cast("int"))


def build_pipeline():
    """Pipeline(OneHotEncoder -> VectorAssembler -> RandomForest) with the
    reference's hyperparameters (ml_model.py:10-29): maxDepth=6,
    numTrees=14, impurity=entropy. Seeded for reproducibility."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import OneHotEncoder, VectorAssembler

    ohe = OneHotEncoder(
        inputCols=[CATEGORICAL_COL], outputCols=[f"{CATEGORICAL_COL}_vec"]
    )
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS + [f"{CATEGORICAL_COL}_vec"], outputCol="features"
    )
    rf = RandomForestClassifier(
        labelCol=LABEL_COL,
        featuresCol="features",
        maxDepth=6,
        numTrees=14,
        impurity="entropy",
        seed=42,
    )
    return Pipeline(stages=[ohe, assembler, rf])


def fit_quarter_model(spark: SparkSession, sf_dir: str):
    """Fit on a deterministic slice (every 8th game): model quality
    plateaus long before the full synthetic frame (the reference trains on
    262 rows), and training cost should not scale with the corpus being
    SCORED — at 100 TB you train on a sample and score everything."""
    train = quarter_stats_frame(spark, sf_dir).where(F.col("game_id") % 8 == 0)
    return build_pipeline().fit(train)


def score(model, df: DataFrame) -> DataFrame:
    """Score quarter rows -> (prediction, win_probability, message).

    Replaces the reference's select+rdd.map x2+zip (ml_k_to_ss.py:31-34,
    P5/P10/J2) with one projection: ``vector_to_array(probability)`` +
    ``element_at`` picks the predicted class's confidence (P10), and the
    win/lose message (P11, ml_IFTTT.py:17-23) is built inline (E2/E3)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    prob = F.element_at(
        vector_to_array(F.col("probability")), F.col("prediction").cast("int") + 1
    )
    return scored.select(
        "game_id",
        F.col(LABEL_COL),
        F.col("prediction").cast("int").alias("prediction"),
        F.round(prob, 4).alias("win_probability"),
        F.when(
            F.col("prediction") == 1,
            F.format_string("We will win this quarter (%.0f%%)", prob * 100),
        )
        .otherwise(F.format_string("We will lose this quarter (%.0f%%)", prob * 100))
        .alias("message"),
    )


@query("m3_quarter_pipeline", oracle=None, tags=("M1", "M2", "M3", "ml"))
def m3_quarter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end M1-M3: derive quarter stats, fit the pipeline once,
    score the same frame, and summarize accuracy per true label.
    Rows-only check (RF output is not SQL-expressible); schema and row
    count (2 label groups) are stable across runs via the fixed seed."""
    model = fit_quarter_model(spark, sf_dir)
    scored = score(model, quarter_stats_frame(spark, sf_dir))
    return (
        scored.groupBy(F.col(LABEL_COL).alias("true_label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("prediction") == F.col(LABEL_COL)).cast("int")).alias("n_correct"),
        )
        .orderBy("true_label")
    )
