"""Grouped sequential kernels (SURVEY.md §2.11): greedy NMS (W2), greedy
one-to-one matching (W3), person-assembly connected components (T4).

These are the reference's three genuinely non-relational algorithms —
order-dependent greedy loops whose semantics change if 'relationalized'
(SURVEY.md §7 risk register). They become custom *physical* operators:
``applyInPandas`` over the group key (image id), exact greedy logic inside,
everything upstream/downstream stays Catalyst.

Scale shape: work is embarrassingly parallel across groups; a group is
dozens of rows (boxes/peaks per image), so the pandas kernel is O(small^2)
per group and the shuffle on the group key is the only data movement.
Skewed group sizes are handled by AQE; Arrow batches the group transfer.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


# ---------------------------------------------------------------------------
# Kernels (plain pandas functions — unit-tested directly in tests/)
# ---------------------------------------------------------------------------


def iou_1d(lo_a: float, hi_a: float, lo_b: float, hi_b: float) -> float:
    inter = max(0.0, min(hi_a, hi_b) - max(lo_a, lo_b))
    union = (hi_a - lo_a) + (hi_b - lo_b) - inter
    return inter / union if union > 0 else 0.0


def nms_greedy(group: pd.DataFrame, iou_threshold: float = 0.3) -> pd.DataFrame:
    """Exact greedy NMS (pi/digit_detector/detect.py:8-63): repeatedly take
    the highest-prob remaining box, suppress all remaining boxes whose IoU
    with it exceeds the threshold. Deterministic tiebreak on box id."""
    g = group.sort_values(["prob", "box_id"], ascending=[False, True])
    kept: list[int] = []
    rows = list(g.itertuples(index=False))
    alive = [True] * len(rows)
    for i, r in enumerate(rows):
        if not alive[i]:
            continue
        kept.append(i)
        for j in range(i + 1, len(rows)):
            if alive[j] and iou_1d(r.lo, r.hi, rows[j].lo, rows[j].hi) > iou_threshold:
                alive[j] = False
    out = pd.DataFrame(rows).iloc[kept] if kept else pd.DataFrame(columns=group.columns)
    return out[list(group.columns)]


def greedy_match(group: pd.DataFrame) -> pd.DataFrame:
    """Greedy one-to-one assignment (pi/dl_k_to_ss.py:175-182): walk
    candidate pairs by descending score; accept a pair iff neither endpoint
    is already used; stop once min(|A|,|B|) pairs are accepted."""
    g = group.sort_values(["score", "a", "b"], ascending=[False, True, True])
    used_a: set = set()
    used_b: set = set()
    limit = min(g["a"].nunique(), g["b"].nunique())
    keep = []
    for r in g.itertuples(index=False):
        if len(keep) >= limit:
            break
        if r.a in used_a or r.b in used_b:
            continue
        used_a.add(r.a)
        used_b.add(r.b)
        keep.append(r)
    return pd.DataFrame(keep, columns=list(group.columns)) if keep else pd.DataFrame(
        columns=group.columns
    )


def connected_components(group: pd.DataFrame) -> pd.DataFrame:
    """Union-find over the limb graph (pi/dl_k_to_ss.py:191-235: merge limb
    connections sharing endpoints into person subsets; merge two partial
    persons; else start a new person). Component id = smallest member node,
    which makes the output deterministic and oracle-checkable."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for r in group.itertuples(index=False):
        for node in (r.a, r.b):
            if node not in parent:
                parent[node] = node
        union(r.a, r.b)
    nodes = sorted(parent)
    return pd.DataFrame({"node": nodes, "component": [find(n) for n in nodes]})


# ---------------------------------------------------------------------------
# Derived detection/graph tables over the driver's parquet (query surface)
# ---------------------------------------------------------------------------


def detection_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-D detection boxes derived from lineitem: image =
    order, box interval from quantity, prob from discount (+ linenumber
    epsilon as a stable tiebreak)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("image_id"),
        F.col("l_linenumber").alias("box_id"),
        F.col("l_quantity").alias("lo"),
        (F.col("l_quantity") + 5 + F.col("l_linenumber")).alias("hi"),
        F.round(F.col("l_discount") * 10 + F.col("l_linenumber") * 0.0001, 6).alias("prob"),
    )


@query("w2_nms_greedy", oracle=None, tags=("W2", "applyInPandas"))
def w2_nms_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy non-maximum suppression per image via ``applyInPandas`` —
    the exact sequential semantics of detect.py:37-60 (window-rank
    approximations would change results; SURVEY.md §4). Rows-only check;
    kernel unit-tested against hand cases in tests/test_grouped.py."""
    boxes = detection_boxes(spark, sf_dir)
    schema = "image_id long, box_id int, lo double, hi double, prob double"
    return boxes.groupBy("image_id").applyInPandas(
        lambda g: nms_greedy(g, iou_threshold=0.3), schema=schema
    )


@query("w3_greedy_match", oracle=None, tags=("W3", "applyInPandas"))
def w3_greedy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy one-to-one candidate matching per image (dl_k_to_ss.py:
    175-182). Candidates = box pairs scored by IoU (the J4 join shape);
    the greedy accept loop runs in the grouped kernel."""
    b = detection_boxes(spark, sf_dir)
    a, c = b.alias("x"), b.alias("y")
    inter = F.greatest(
        F.lit(0.0),
        F.least(F.col("x.hi"), F.col("y.hi")) - F.greatest(F.col("x.lo"), F.col("y.lo")),
    )
    union = (F.col("x.hi") - F.col("x.lo")) + (F.col("y.hi") - F.col("y.lo")) - inter
    pairs = (
        a.join(
            c,
            (F.col("x.image_id") == F.col("y.image_id"))
            & (F.col("x.box_id") < F.col("y.box_id")),
        )
        .select(
            F.col("x.image_id").alias("image_id"),
            F.col("x.box_id").alias("a"),
            F.col("y.box_id").alias("b"),
            F.round(inter / union, 6).alias("score"),
        )
        .where(F.col("score") > 0)
    )
    schema = "image_id long, a int, b int, score double"
    return pairs.groupBy("image_id").applyInPandas(
        lambda g: greedy_match(g), schema=schema
    )


@query(
    "t4_person_assembly",
    oracle="""
        WITH RECURSIVE boxes AS (
            SELECT l_orderkey AS image_id, l_linenumber AS node,
                   l_quantity AS lo, l_quantity + 5 + l_linenumber AS hi
            FROM lineitem
        ), pair AS (
            SELECT a.image_id, a.node AS a, b.node AS b
            FROM boxes a JOIN boxes b
              ON a.image_id = b.image_id AND a.node < b.node
            WHERE GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo))
                  / ((a.hi - a.lo) + (b.hi - b.lo)
                     - GREATEST(0, LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo))) >= 0.3
        ), edges AS (
            SELECT image_id, a, b FROM pair
            UNION ALL SELECT image_id, b, a FROM pair
        ), nodes AS (
            SELECT DISTINCT image_id, a AS node FROM edges
        ), reach AS (
            SELECT image_id, node AS src, node AS dst FROM nodes
            UNION
            SELECT r.image_id, r.src, e.b AS dst
            FROM reach r JOIN edges e ON e.image_id = r.image_id AND e.a = r.dst
        )
        SELECT image_id, src AS node, MIN(dst) AS component
        FROM reach GROUP BY image_id, src
    """,
    tags=("T4", "applyInPandas"),
)
def t4_person_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person assembly = connected components over the limb-connection
    graph (dl_k_to_ss.py:191-235), with edges = box pairs at IoU >= 0.3.
    Union-find per image in the grouped kernel; component id = min member.

    The oracle is a recursive-CTE transitive closure (WITH RECURSIVE) —
    viable because groups are tiny; the Spark kernel is the form that
    scales. Only nodes with at least one edge appear (isolated boxes are
    not 'persons', mirroring the reference which only creates subsets from
    connections)."""
    b = detection_boxes(spark, sf_dir)
    a, c = b.alias("x"), b.alias("y")
    inter = F.greatest(
        F.lit(0.0),
        F.least(F.col("x.hi"), F.col("y.hi")) - F.greatest(F.col("x.lo"), F.col("y.lo")),
    )
    union = (F.col("x.hi") - F.col("x.lo")) + (F.col("y.hi") - F.col("y.lo")) - inter
    edges = (
        a.join(
            c,
            (F.col("x.image_id") == F.col("y.image_id"))
            & (F.col("x.box_id") < F.col("y.box_id")),
        )
        .where(inter / union >= 0.3)
        .select(
            F.col("x.image_id").alias("image_id"),
            F.col("x.box_id").alias("a"),
            F.col("y.box_id").alias("b"),
        )
    )
    schema = "image_id long, node int, component int"

    def assemble(key, g: pd.DataFrame) -> pd.DataFrame:
        out = connected_components(g)
        out.insert(0, "image_id", key[0])
        return out

    return edges.groupBy("image_id").applyInPandas(assemble, schema=schema)
