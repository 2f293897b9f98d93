"""RF model APPLICATION as engine-side dataflow (SURVEY.md §2.9 M3).

Reference: qp/ml_k_to_ss.py:28-34 — the flagship prediction join applies
the fitted quarter RandomForest to every incoming stats row. Training is
(correctly) MLlib (ml/quarter.py); but SCORING is what runs at 100 TB,
and a fitted forest is just data: 14 depth-≤6 trees, each a nested
if/else over 15 feature columns. This module exports the fitted trees to
a literal structure and scores entirely in Catalyst as a generated CASE
cascade — whole-stage-codegen'd comparisons, no model object, no Python,
no JVM MLlib on the scoring path — bit-identical to
``RandomForestClassificationModel.transform`` (pinned in
tests/test_ml_quarter.py):

- per tree, the leaf contributes its class-count ratio ``c_k / total``
  (exactly MLlib's ``predictRaw``: normalized leaf impurity stats,
  integral Poisson-bootstrap counts, so each term is one exact integer
  division);
- votes are the tree terms summed LEFT-TO-RIGHT in tree order (MLlib's
  loop order — the chain parses left-associative in any SQL engine);
- ``prediction = 1`` iff ``votes1 > votes0`` (argmax, first-max-wins) and
  ``p_win = votes1 / (votes0 + votes1)`` (MLlib's normalize).

``QUARTER_RF_TREES`` is the canonical quarter model fitted once on the
sf0.01 training slice and FROZEN here — the train-once/ship-weights
artifact a production pipeline versions. Because the same generated SQL
text scores in Spark and DuckDB, ``m3_rf_apply`` carries a full oracle —
the reference flagship's score join, hash-checked end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

# Tree node encoding (nested tuples):
#   ("leaf", c0, c1)                 — integral class counts at the leaf
#   ("cont", fidx, thr, left, right) — go left iff f{fidx} <= thr
#   ("cat", fidx, cats, left, right) — go left iff f{fidx} IN cats


def export_rf_trees(rf_model) -> list:
    """Walk a fitted RandomForestClassificationModel's Java trees (py4j)
    into the literal nested-tuple encoding above. Leaf stats must be
    integral (true for unweighted Poisson-bootstrap fits) — raises
    otherwise, because the exact-integer-division contract of the
    generated SQL would silently break."""

    def walk(jnode):
        cls = jnode.getClass().getSimpleName()
        if cls.startswith("LeafNode"):
            stats = list(jnode.impurityStats().stats())
            if any(abs(s - round(s)) > 1e-9 for s in stats):
                raise ValueError(f"non-integral leaf stats {stats}; weighted fit?")
            return ("leaf", int(round(stats[0])), int(round(stats[1])))
        split = jnode.split()
        fidx = int(split.featureIndex())
        left, right = walk(jnode.leftChild()), walk(jnode.rightChild())
        if split.getClass().getSimpleName().startswith("ContinuousSplit"):
            return ("cont", fidx, float(split.threshold()), left, right)
        cats = tuple(float(c) for c in split.leftCategories())
        return ("cat", fidx, cats, left, right)

    return [walk(t._call_java("rootNode")) for t in rf_model.trees]


def _tree_term_sql(node, cls: int) -> str:
    """One tree's contribution to votes{cls} — a CASE cascade ending in
    the exact integer division c_cls/total. All thresholds are split
    midpoints of integral features (x.0/x.5 — exactly representable), so
    the literal text evaluates bit-identically in Spark and DuckDB."""
    kind = node[0]
    if kind == "leaf":
        _, c0, c1 = node
        return f"(CAST({c1 if cls else c0} AS DOUBLE) / CAST({c0 + c1} AS DOUBLE))"
    if kind == "cont":
        _, fidx, thr, left, right = node
        cond = f"f{fidx} <= CAST({thr!r} AS DOUBLE)"
    else:
        _, fidx, cats, left, right = node
        inlist = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in cats)
        cond = f"f{fidx} IN ({inlist})"
    return (
        f"(CASE WHEN {cond} THEN {_tree_term_sql(left, cls)}"
        f" ELSE {_tree_term_sql(right, cls)} END)"
    )


def rf_votes_sql(trees: list, cls: int) -> str:
    """votes{cls} as the left-associative sum of per-tree terms in tree
    order — MLlib predictRaw's accumulation order."""
    return " + ".join(_tree_term_sql(t, cls) for t in trees)


# The canonical quarter model: Pipeline(OHE -> VectorAssembler ->
# RandomForestClassifier(maxDepth=6, numTrees=14, entropy, seed=42))
# fitted ONCE on the sf0.01 training slice (game_id % 8 == 0) and frozen.
# Regenerate with tools/gen_rf_trees.py; equality of a fresh fit's export
# with this literal is pinned in tests/test_ml_quarter.py.
QUARTER_RF_TREES: list = [
    ('cont', 11, 0.5, ('leaf', 232, 0), ('cont', 1, 11.0, ('cont', 4, 4.5, ('cont', 0, 8.5, ('leaf', 255, 0), ('cont', 0, 10.5, ('cont', 1, 9.0, ('leaf', 0, 92), ('leaf', 43, 0)), ('leaf', 0, 120))), ('cat', 14, (1.0,), ('leaf', 0, 128), ('cat', 13, (1.0,), ('leaf', 0, 124), ('cont', 1, 9.0, ('leaf', 0, 176), ('leaf', 46, 42))))), ('cont', 6, 7.5, ('leaf', 565, 0), ('cont', 1, 13.0, ('leaf', 0, 36), ('leaf', 34, 0))))),
    ('cat', 13, (1.0,), ('cont', 4, 3.5, ('leaf', 408, 0), ('cont', 12, 23.5, ('cont', 1, 11.0, ('leaf', 0, 119), ('leaf', 80, 0)), ('leaf', 0, 8))), ('cont', 0, 6.5, ('leaf', 210, 0), ('cont', 1, 9.0, ('leaf', 0, 396), ('cont', 0, 12.5, ('cont', 1, 11.0, ('cont', 2, 3.0, ('leaf', 78, 0), ('leaf', 0, 77)), ('leaf', 332, 0)), ('cont', 8, 0.5, ('cont', 12, 23.5, ('leaf', 10, 7), ('leaf', 0, 3)), ('leaf', 25, 80)))))),
    ('cont', 10, 1.0, ('cont', 4, 3.5, ('leaf', 434, 0), ('cont', 1, 11.0, ('leaf', 0, 116), ('leaf', 89, 0))), ('cont', 1, 11.0, ('cont', 6, 1.5, ('leaf', 113, 0), ('cont', 2, 3.0, ('cont', 12, 2.5, ('leaf', 0, 39), ('cont', 1, 9.0, ('leaf', 0, 201), ('leaf', 86, 57))), ('leaf', 0, 249))), ('cont', 6, 7.5, ('leaf', 424, 0), ('cont', 1, 13.0, ('leaf', 0, 45), ('leaf', 49, 0))))),
    ('cont', 12, 0.5, ('cont', 2, 1.0, ('leaf', 20, 6), ('cont', 10, 3.0, ('leaf', 0, 26), ('cont', 11, 2.5, ('leaf', 0, 12), ('cont', 11, 5.5, ('leaf', 8, 0), ('leaf', 0, 8))))), ('cont', 4, 4.5, ('cont', 0, 8.5, ('leaf', 625, 0), ('cont', 6, 5.5, ('cont', 1, 9.0, ('leaf', 0, 75), ('leaf', 115, 0)), ('cont', 7, 2.5, ('cont', 1, 11.0, ('leaf', 0, 57), ('leaf', 29, 0)), ('leaf', 57, 85)))), ('cont', 1, 11.0, ('cont', 0, 7.5, ('cont', 8, 0.5, ('cont', 12, 22.5, ('leaf', 3, 6), ('leaf', 2, 0)), ('leaf', 33, 74)), ('leaf', 0, 340)), ('cont', 1, 13.0, ('cont', 0, 11.5, ('leaf', 137, 0), ('leaf', 0, 31)), ('leaf', 159, 0))))),
    ('cont', 5, 4.0, ('cont', 11, 0.5, ('leaf', 211, 0), ('cont', 6, 3.5, ('leaf', 203, 0), ('cont', 12, 23.5, ('cont', 7, 0.5, ('leaf', 14, 4), ('cont', 1, 11.0, ('leaf', 0, 119), ('leaf', 57, 0))), ('leaf', 0, 11)))), ('cont', 1, 11.0, ('cont', 1, 9.0, ('cont', 0, 6.5, ('leaf', 75, 0), ('leaf', 0, 435)), ('cont', 12, 9.5, ('cont', 11, 1.5, ('leaf', 18, 0), ('cont', 6, 5.5, ('leaf', 36, 22), ('leaf', 0, 27))), ('cont', 4, 1.5, ('leaf', 0, 30), ('cont', 0, 7.5, ('leaf', 45, 0), ('leaf', 28, 56))))), ('cont', 10, 3.0, ('cont', 4, 2.5, ('leaf', 97, 0), ('cont', 0, 7.5, ('leaf', 72, 0), ('cont', 1, 13.0, ('leaf', 0, 51), ('leaf', 35, 0)))), ('leaf', 264, 0)))),
    ('cont', 4, 4.5, ('cont', 2, 1.0, ('leaf', 377, 0), ('cont', 4, 2.5, ('cont', 1, 11.0, ('leaf', 42, 219), ('leaf', 156, 0)), ('leaf', 204, 0))), ('cont', 12, 0.5, ('leaf', 0, 33), ('cont', 1, 11.0, ('cont', 6, 2.5, ('cont', 1, 9.0, ('leaf', 0, 92), ('leaf', 48, 0)), ('leaf', 0, 367)), ('cont', 4, 5.5, ('cont', 1, 13.0, ('leaf', 0, 48), ('leaf', 45, 0)), ('leaf', 251, 0))))),
    ('cont', 5, 4.0, ('cont', 1, 11.0, ('cont', 6, 3.5, ('leaf', 229, 0), ('leaf', 0, 147)), ('leaf', 240, 0)), ('cont', 11, 4.5, ('cont', 11, 1.5, ('cont', 1, 9.0, ('leaf', 0, 93), ('leaf', 129, 0)), ('cont', 12, 0.5, ('leaf', 0, 18), ('cont', 1, 11.0, ('leaf', 0, 242), ('leaf', 136, 40)))), ('cont', 6, 1.5, ('leaf', 208, 0), ('cont', 0, 10.5, ('leaf', 134, 85), ('cont', 8, 6.5, ('cont', 1, 11.0, ('leaf', 0, 68), ('leaf', 66, 0)), ('cont', 1, 11.0, ('leaf', 0, 55), ('leaf', 24, 0))))))),
    ('cont', 6, 3.5, ('leaf', 711, 79), ('cont', 0, 12.5, ('cont', 5, 12.0, ('cont', 12, 0.5, ('leaf', 0, 29), ('cont', 0, 11.5, ('cont', 1, 11.0, ('leaf', 0, 257), ('leaf', 163, 0)), ('cont', 12, 1.5, ('leaf', 10, 0), ('leaf', 77, 112)))), ('cont', 7, 0.5, ('cont', 12, 2.5, ('leaf', 0, 5), ('cont', 8, 2.5, ('leaf', 0, 3), ('leaf', 15, 10))), ('cont', 7, 4.5, ('leaf', 86, 43), ('cont', 8, 8.5, ('leaf', 19, 21), ('leaf', 12, 6))))), ('cont', 1, 13.0, ('leaf', 0, 167), ('leaf', 33, 0)))),
    ('cat', 13, (1.0,), ('cont', 1, 11.0, ('cont', 0, 8.5, ('leaf', 248, 0), ('leaf', 0, 122)), ('leaf', 262, 0)), ('cont', 11, 4.5, ('cont', 1, 11.0, ('cont', 11, 1.5, ('cont', 3, 5.0, ('leaf', 12, 37), ('cont', 8, 0.5, ('leaf', 3, 1), ('leaf', 28, 41))), ('leaf', 0, 293)), ('cont', 4, 5.5, ('cont', 7, 5.5, ('leaf', 34, 27), ('cont', 8, 3.5, ('leaf', 0, 6), ('leaf', 1, 1))), ('leaf', 173, 0))), ('cont', 1, 11.0, ('cont', 5, 12.0, ('cont', 0, 6.5, ('leaf', 113, 0), ('leaf', 0, 131)), ('cont', 8, 1.5, ('leaf', 2, 16), ('cont', 1, 9.0, ('leaf', 0, 57), ('leaf', 30, 0)))), ('leaf', 253, 0)))),
    ('cont', 4, 4.5, ('cont', 0, 8.5, ('leaf', 630, 0), ('cont', 1, 11.0, ('cont', 1, 9.0, ('leaf', 0, 151), ('cont', 4, 1.5, ('leaf', 0, 56), ('leaf', 33, 0))), ('leaf', 171, 0))), ('cont', 12, 0.5, ('leaf', 0, 40), ('cont', 4, 5.5, ('cont', 3, 3.0, ('cont', 8, 0.5, ('cont', 1, 13.0, ('leaf', 0, 4), ('leaf', 2, 0)), ('leaf', 5, 42)), ('cont', 1, 13.0, ('leaf', 0, 105), ('leaf', 33, 0))), ('cat', 14, (1.0,), ('cont', 7, 3.5, ('cont', 1, 11.0, ('leaf', 0, 69), ('leaf', 47, 0)), ('cont', 1, 11.0, ('leaf', 0, 58), ('leaf', 36, 0))), ('cont', 12, 1.5, ('leaf', 13, 0), ('cont', 1, 9.0, ('leaf', 0, 140), ('leaf', 232, 33))))))),
    ('cont', 6, 3.5, ('leaf', 690, 73), ('cont', 4, 2.5, ('cont', 1, 9.0, ('leaf', 0, 169), ('leaf', 202, 30)), ('cont', 1, 11.0, ('leaf', 0, 375), ('cont', 1, 13.0, ('cont', 5, 12.0, ('leaf', 96, 0), ('leaf', 0, 41)), ('leaf', 109, 0))))),
    ('cont', 10, 1.0, ('cont', 0, 8.5, ('leaf', 439, 0), ('leaf', 88, 133)), ('cont', 11, 4.5, ('cont', 4, 5.5, ('cont', 12, 22.5, ('leaf', 39, 147), ('cont', 12, 23.5, ('leaf', 14, 0), ('leaf', 0, 4))), ('cont', 6, 2.5, ('cont', 1, 9.0, ('leaf', 0, 94), ('leaf', 108, 0)), ('leaf', 86, 129))), ('cont', 1, 11.0, ('cont', 4, 2.5, ('leaf', 46, 216), ('leaf', 143, 0)), ('leaf', 278, 0)))),
    ('cont', 6, 3.5, ('cont', 5, 12.0, ('leaf', 628, 0), ('cont', 3, 3.0, ('cont', 3, 1.0, ('leaf', 17, 12), ('cont', 8, 1.5, ('cont', 1, 9.0, ('leaf', 0, 2), ('leaf', 5, 0)), ('leaf', 8, 15))), ('cont', 3, 7.0, ('cont', 1, 9.0, ('leaf', 0, 19), ('leaf', 45, 0)), ('cont', 12, 0.5, ('leaf', 0, 5), ('leaf', 56, 33))))), ('cont', 1, 11.0, ('cont', 1, 9.0, ('leaf', 0, 449), ('cont', 10, 3.0, ('cont', 11, 4.5, ('leaf', 0, 76), ('leaf', 35, 0)), ('leaf', 0, 83))), ('cont', 0, 12.5, ('leaf', 346, 0), ('cont', 7, 0.5, ('cont', 1, 13.0, ('leaf', 0, 3), ('leaf', 13, 0)), ('cont', 8, 5.5, ('cont', 1, 13.0, ('leaf', 0, 22), ('leaf', 19, 0)), ('leaf', 17, 8)))))),
    ('cont', 0, 8.5, ('cont', 10, 1.0, ('leaf', 460, 0), ('cont', 1, 9.0, ('cat', 14, (1.0,), ('leaf', 91, 0), ('leaf', 0, 96)), ('leaf', 231, 0))), ('cont', 6, 7.5, ('cont', 1, 11.0, ('leaf', 51, 445), ('leaf', 328, 0)), ('leaf', 44, 177)))
]


def _feature_select_sql() -> list[str]:
    """f0..f14 as DOUBLE over alias ``k`` — the SAME expression text
    (ml/quarter._FEATURE_EXPR_SQL) the M1 oracle uses, shared verbatim
    between the Spark side and the DuckDB oracle."""
    from .quarter import _FEATURE_EXPR_SQL

    return [
        f"CAST({expr} AS DOUBLE) AS f{i}" for i, expr in enumerate(_FEATURE_EXPR_SQL)
    ]


# quarter_stats_frame's label over k, as exact integer SQL
_LABEL_SQL = (
    "CAST(((5 + k % 9) - (5 + (k * 3 + 1) % 10)) * 3 + (k * 7) % 6"
    " - (k * 41) % 9 + k % 5 > 0 AS INT) AS win_period"
)


def _rf_apply_oracle() -> str:
    feats = ",\n                   ".join(_feature_select_sql())
    return f"""
        WITH f AS (
            SELECT game_id, {_LABEL_SQL},
                   {feats}
            FROM (SELECT o_orderkey AS game_id, o_orderkey AS k FROM orders)
        ),
        v AS (
            SELECT game_id, win_period,
                   {rf_votes_sql(QUARTER_RF_TREES, 0)} AS v0,
                   {rf_votes_sql(QUARTER_RF_TREES, 1)} AS v1
            FROM f
        )
        SELECT game_id, win_period,
               CAST(v1 > v0 AS INT) AS prediction,
               v1 / (v0 + v1) AS p_win
        FROM v
        """


@query("m3_rf_apply", oracle=None, tags=("M3", "ml", "apply"))
def m3_rf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 model APPLICATION as pure Catalyst (VERDICT r4 item 4): score
    every quarter row with the frozen canonical forest via the generated
    CASE cascade — the reference flagship's prediction join
    (qp/ml_k_to_ss.py:28-34) with the model as DATA instead of a JVM
    object. One pruned scan -> one projection, zero exchanges, zero
    Python; at 100 TB this is embarrassingly parallel map work.
    Bit-equality with ``PipelineModel.transform`` of a fresh fit is
    pinned in tests/test_ml_quarter.py. Output: (game_id, win_period,
    prediction, p_win) with p_win the raw class-1 probability."""
    o = table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS game_id", "o_orderkey AS k"
    )
    f = o.selectExpr("game_id", _LABEL_SQL, *_feature_select_sql())
    v = f.selectExpr(
        "game_id",
        "win_period",
        f"{rf_votes_sql(QUARTER_RF_TREES, 0)} AS v0",
        f"{rf_votes_sql(QUARTER_RF_TREES, 1)} AS v1",
    )
    return v.selectExpr(
        "game_id",
        "win_period",
        "CAST(v1 > v0 AS INT) AS prediction",
        "v1 / (v0 + v1) AS p_win",
    )


# the frozen forest is scored through SQL text generated at import time,
# so the oracle must be attached AFTER the literal exists
SPECS[-1] = QuerySpec(
    name=SPECS[-1].name,
    builder=SPECS[-1].builder,
    oracle=_rf_apply_oracle(),
    tags=SPECS[-1].tags,
)
