"""Distributed binary-classifier metrics as rank statistics (SURVEY.md
§2.9 M8).

Reference: qp/ml_model.py:31-33 intends a ``BinaryClassificationEvaluator``
(areaUnderROC / areaUnderPR). MLlib's evaluator computes both on the
driver via ``evaluate()`` — fine for a validation slice, wrong shape for
scoring 100 TB. Both metrics are pure RANK statistics, so they lower to
Catalyst aggregations over the scored rows:

- **areaUnderROC** is the Mann-Whitney U statistic with midranks:
  ``AUC = (sum of positive midranks - P(P+1)/2) / (P * N)``. With scores
  grouped (ties share a group) the midrank sum is exact INTEGER
  arithmetic — ``2*rank_sum = Σ np * (2*below + n + 1)`` — and the one
  final division is bit-identical in any IEEE engine, so the metric
  carries a full DuckDB oracle. Tie handling (midranks) is exactly the
  trapezoidal ROC with tied scores collapsed — what MLlib computes.
- **areaUnderPR** follows MLlib's curve convention: one point per
  distinct score descending, ``(recall, precision)`` from cumulative
  counts, a first segment from ``(0, p₁)`` (MLlib prepends it), trapezoid
  between points. Per-segment terms are pure divisions/multiplications
  (bit-identical cross-engine); the segment SUM is the one float
  reduction whose ORDER matters, so it is a strict left-to-right fold in
  both engines — Spark ``F.aggregate`` over the score-desc-sorted curve
  array, DuckDB ``LIST_REDUCE`` over ``LIST(term ORDER BY score DESC)``
  (the e12 sequential-fold discipline).

Scale shape: one ``groupBy(score)`` shuffle reduces the corpus to the
DISTINCT-SCORE curve table; every window/fold after that runs over curve
points, not rows. For heavily-tied scores (integer logits, calibrated
bins) the curve is tiny at any corpus size. For continuous scores,
quantize first (``F.round(score, k)``) — the exact analogue of MLlib's
``numBins`` down-sampling — or the curve grows with the data.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


def _score_curve(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """The distinct-score curve table ``(score, n, np)`` — the ONE pass
    over the scored corpus. Module-level so plan tests can audit the
    pre-checkpoint shape (single scan, single scoring map, one exchange)."""
    return scored.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("np"),
    )


def binary_rank_metrics(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """areaUnderROC + areaUnderPR of ``scored`` as distributed rank
    statistics — ``(metric string, value double)``, two rows. Needs at
    least one positive and one negative label. Equality with MLlib's
    ``BinaryClassificationEvaluator`` (below its numBins down-sampling
    threshold) is pinned in tests/test_ml_quarter.py."""
    # ONE corpus pass: the curve table is materialized once (lazy
    # localCheckpoint) — s2 / totals / the PR curve all consume it, and
    # without the boundary each branch would re-run the full scan +
    # scoring map (4 corpus passes at 100 TB for a 2-row answer)
    g = _score_curve(scored, score_col, label_col).localCheckpoint(eager=False)
    tot = g.agg(F.sum("np").alias("p"), (F.sum("n") - F.sum("np")).alias("neg"))

    # --- ROC: exact integer midrank sums, ONE final division ------------
    # Intermediates run in DECIMAL(38,0) (DuckDB: HUGEINT): the midrank
    # sum is ~2*P*R and the U denominator 2*P*N, both past int64 once
    # P*N > ~4.6e18 (a few billion scored rows — exactly the scale this
    # module targets). Decimal->double of an exact integer is correctly
    # rounded in both engines, so the bit-identical contract holds.
    dec = "decimal(38,0)"
    w_asc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s2 = (
        g.withColumn("below", F.sum("n").over(w_asc) - F.col("n"))
        .agg(
            F.sum(
                F.col("np").cast(dec) * (2 * F.col("below") + F.col("n") + 1).cast(dec)
            ).alias("s2")
        )
    )
    roc = s2.crossJoin(F.broadcast(tot)).select(
        F.lit("areaUnderROC").alias("metric"),
        (
            (F.col("s2") - F.col("p").cast(dec) * (F.col("p") + 1).cast(dec)).cast("double")
            / (2 * F.col("p").cast(dec) * F.col("neg").cast(dec)).cast("double")
        ).alias("value"),
    )

    # --- PR: per-point terms, then a strict left-to-right fold ----------
    w_desc_rows = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_desc = Window.orderBy(F.desc("score"))
    curve = g.crossJoin(F.broadcast(tot)).select(
        "score",
        (F.sum("np").over(w_desc_rows).cast("double") / F.col("p").cast("double")).alias(
            "rec"
        ),
        (
            F.sum("np").over(w_desc_rows).cast("double")
            / F.sum("n").over(w_desc_rows).cast("double")
        ).alias("prec"),
    )
    terms = curve.select(
        "score",
        (
            (F.col("rec") - F.coalesce(F.lag("rec").over(w_desc), F.lit(0.0)))
            * (F.col("prec") + F.coalesce(F.lag("prec").over(w_desc), F.col("prec")))
            / F.lit(2.0)
        ).alias("term"),
    )
    # curve table only (distinct scores), never raw rows, reaches this array
    arr = F.sort_array(F.collect_list(F.struct("score", "term")), asc=False)
    pr = terms.agg(
        F.aggregate(
            arr, F.lit(0.0), lambda acc, s: acc + s["term"]
        ).alias("value")
    ).select(F.lit("areaUnderPR").alias("metric"), "value")
    return roc.unionByName(pr)


def _rank_metrics_oracle() -> str:
    from ..operators.textual import QUALITY_FEATURES_SQL, QUALITY_LOGIT_SQL

    return dedent(
        f"""
        WITH feat AS (
            SELECT lang,
                   {QUALITY_FEATURES_SQL},
                   n_chars
            FROM documents
        ),
        s AS (
            SELECT CAST({QUALITY_LOGIT_SQL} AS BIGINT) AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM feat
        ),
        g AS (
            SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS np
            FROM s GROUP BY score
        ),
        tot AS (
            SELECT CAST(SUM(np) AS BIGINT) AS p,
                   CAST(SUM(n - np) AS BIGINT) AS neg
            FROM g
        ),
        s2 AS (
            SELECT SUM(CAST(np AS HUGEINT) * (2 * below + n + 1)) AS s2
            FROM (
                SELECT n, np,
                       CAST(SUM(n) OVER (ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n AS BIGINT) AS below
                FROM g
            )
        ),
        curve AS (
            SELECT score,
                   CAST(SUM(np) OVER w AS DOUBLE) / CAST(p AS DOUBLE) AS rec,
                   CAST(SUM(np) OVER w AS DOUBLE)
                       / CAST(SUM(n) OVER w AS DOUBLE) AS prec
            FROM g, tot
            WINDOW w AS (ORDER BY score DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            SELECT score,
                   (rec - COALESCE(LAG(rec) OVER (ORDER BY score DESC),
                                   CAST(0 AS DOUBLE)))
                   * (prec + COALESCE(LAG(prec) OVER (ORDER BY score DESC),
                                      prec))
                   / CAST(2 AS DOUBLE) AS term
            FROM curve
        )
        SELECT 'areaUnderROC' AS metric,
               CAST(s2 - CAST(p AS HUGEINT) * (p + 1) AS DOUBLE)
                   / CAST(2 * CAST(p AS HUGEINT) * neg AS DOUBLE) AS value
        FROM s2, tot
        UNION ALL
        SELECT 'areaUnderPR' AS metric,
               LIST_REDUCE(
                   LIST_PREPEND(CAST(0 AS DOUBLE),
                                LIST(term ORDER BY score DESC)),
                   (a, b) -> a + b) AS value
        FROM terms
        """
    )


@query("m8_rank_metrics", oracle=_rank_metrics_oracle(), tags=("M8", "X4", "ml", "metrics"))
def m8_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 with a FULL oracle (VERDICT r4 item 1): areaUnderROC +
    areaUnderPR of the deterministic quality-model logits
    (x4_quality_model_score) against the lang='en' label, computed
    entirely as Catalyst rank statistics — no driver-side ``evaluate()``
    loop anywhere. The logits are exact BIGINT, so the score groups, rank
    sums and curve counts match DuckDB exactly; AUC-ROC is one division
    of exact integers and AUC-PR a left-to-right fold of bit-identical
    per-segment doubles, so both RAW double outputs hash-match.
    ``m8_binary_evaluator`` (ml/cluster.py) reports the RF lane through
    this same distributed path."""
    from ..operators.textual import score_documents

    scored = score_documents(table(spark, sf_dir, "documents")).select(
        F.col("logit_milli").alias("score"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    return binary_rank_metrics(scored, "score", "y")


def _calibration_oracle() -> str:
    from ..operators.textual import QUALITY_FEATURES_SQL, QUALITY_LOGIT_SQL

    return dedent(
        f"""
        WITH feat AS (
            SELECT lang,
                   {QUALITY_FEATURES_SQL},
                   n_chars
            FROM documents
        ),
        s AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   1.0 / (1.0 + EXP(-(CAST({QUALITY_LOGIT_SQL} AS BIGINT)
                                      / 1000.0))) AS p
            FROM feat
        ),
        r AS (
            SELECT y,
                   CAST(LEAST(FLOOR(p * 10), 9) AS INT) AS bin,
                   CAST(FLOOR(p * 1000000 + 0.5) AS BIGINT) AS conf_micro,
                   CAST(FLOOR((p - y) * (p - y) * 1000000 + 0.5) AS BIGINT)
                       AS brier_micro
            FROM s
        )
        SELECT bin,
               COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(conf_micro) AS BIGINT) // COUNT(*) AS avg_conf_micro,
               1000000 * CAST(SUM(y) AS BIGINT) // COUNT(*) AS obs_micro,
               ABS(CAST(SUM(conf_micro) AS BIGINT) // COUNT(*)
                   - 1000000 * CAST(SUM(y) AS BIGINT) // COUNT(*)) AS gap_micro,
               CAST(SUM(brier_micro) AS BIGINT) AS brier_sum_micro
        FROM r GROUP BY bin
        """
    )


@query(
    "m8_calibration",
    oracle=_calibration_oracle(),
    tags=("M8", "X4", "ml", "metrics", "eval"),
)
def m8_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier partials for the quality model
    — the CALIBRATION evaluation that completes the M8 family beside the
    rank metrics (AUC says the model ORDERS well; calibration says its
    probabilities MEAN something — the gate threshold the factory applies
    is only interpretable if they do). Fixed-width probability bins
    (floor(10p), clamped to 9 — the standard diagram), confidence
    p = sigmoid(logit/1000) with the logit computed ENGINE-side
    (quality_logit_col, zero Python).

    Float discipline: p is ONE IEEE tree over the exact BIGINT logit,
    and every per-row float is floored to micro-units BEFORE any
    aggregation (conf_micro, brier_micro), so only exact integers are
    summed and every output column is integer — accumulation order
    never reaches the hash. avg-confidence, observed rate, and the
    |gap| are integer division on those sums. TOLERATED RISK (ADVICE
    r10): the cross-engine equality of the floored values rests on
    exp() agreeing across JVM/libm/CPython at these inputs — Java
    Math.exp guarantees only 1-ulp semi-monotonicity, so a p landing
    within ~1 ulp of a FLOOR(p*1e6+0.5) boundary could flip a micro
    unit in one engine only. Guarded, not assumed:
    tests/test_ml_quarter.py::test_calibration_boundary_margin asserts
    every distinct logit at sf0.001/0.01/0.1 yields p whose floored
    expressions (conf, both Brier branches, the bin edge) sit >= 1e-6
    units from the nearest boundary — six orders above a 1-ulp wiggle
    (<= ~4e-10 in micro units).

    Scale shape: binning is MAP-SIDE (no rank/NTILE — an equal-count
    decile would global-sort the corpus in one task; fixed-width bins
    keep the plan one map-combinable aggregation to <= 10 rows), so the
    whole evaluation is one scan + one 10-row hash aggregate at any
    corpus size. Brier ships as per-bin SUMS (exact, mergeable) — the
    consumer divides by n once, the partials-handoff discipline."""
    from ..operators.textual import quality_logit_col

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    z = quality_logit_col(toks, F.col("n_chars")).cast("long") / F.lit(1000.0)
    s = docs.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("p"),
    )
    p, y = F.col("p"), F.col("y")
    r = s.select(
        "y",
        F.least(F.floor(p * 10), F.lit(9)).cast("int").alias("bin"),
        F.floor(p * 1000000 + 0.5).cast("long").alias("conf_micro"),
        F.floor((p - y) * (p - y) * 1000000 + 0.5).cast("long").alias("brier_micro"),
    )
    agg = r.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("conf_micro").alias("conf_sum"),
        F.sum("brier_micro").alias("brier_sum_micro"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.expr("conf_sum DIV n").alias("avg_conf_micro"),
        F.expr("1000000 * n_pos DIV n").alias("obs_micro"),
        F.abs(
            F.expr("conf_sum DIV n") - F.expr("1000000 * n_pos DIV n")
        ).alias("gap_micro"),
        "brier_sum_micro",
    )
