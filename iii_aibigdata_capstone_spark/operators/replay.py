"""Batch replay of the player-identification pipeline (SURVEY.md §3.2).

The reference runs the whole chain record-at-a-time inside one 350-line
closure (pi/dl_k_to_ss.py:71-357). Here the same dataflow is a DataFrame
DAG: UDF kernels only where tensors are touched (pose stub, digit stub),
everything between them relational — explode peaks to rows, join/window for
candidates and matching, grouped kernels for the greedy/graph steps, a
broadcast dimension for team assignment, a broadcast left join for the
stats lookup, `format_string` for the outbound message (UTF-8 team names
round-trip through the join keys, SURVEY.md §7 risk).

Chain: M7 pose peaks -> W7 peak ids -> J4 limb candidates -> W3 greedy
match -> T4 person assembly -> A10 prune -> M5/M6 digit cascade -> J5
nearest-centroid team -> J1 stats lookup (sentinel on miss) -> E3 message.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar
from .grouped import _grouped_blocks, components_block, match_block
from .kernels import m5_digit_cascade, m7_pose_peaks

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

N_PARTS = 4  # matches m7_pose_peaks' stub part count


def player_stats_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """player_stats lookup table (pi/stats.csv shape: team, rosterNumber,
    score, reb, ast) derived deterministically from supplier. Non-ASCII
    team names on purpose — the reference's keys are Chinese
    (dl_k_to_ss.py:444) and must survive the join."""
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return (
        s.select(
            F.when(k % 2 == 0, F.lit("紅隊")).otherwise(F.lit("藍隊")).alias("team"),
            (k % 100).cast("int").alias("rosterNumber"),
            F.round(F.pmod(F.col("s_acctbal"), 30), 1).alias("score"),
            F.round(F.pmod(F.col("s_acctbal") * 3, 15), 1).alias("reb"),
            F.round(F.pmod(F.col("s_acctbal") * 7, 12), 1).alias("ast"),
        )
        .groupBy("team", "rosterNumber")
        .agg(F.min("score").alias("score"), F.min("reb").alias("reb"), F.min("ast").alias("ast"))
    )


@query("dl_pipeline_replay", oracle=None, tags=("flagship", "udf", "grouped-map"))
def dl_pipeline_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end §3.2 replay in batch mode; one row per identified player
    per image: (doc_id, n_persons, number, team, score, reb, ast, message).
    Rows-only check; determinism pinned by the stub kernels' content
    hashes."""
    # --- M7 + W7: pose peaks with deterministic ids per image ------------
    # Materialized once: both sides of the J4 self-join read the peak table,
    # and without the checkpoint each side re-runs the pose-inference UDF
    # (measured 9.2s -> 5.7s at sf0.1).
    peaks = m7_pose_peaks(spark, sf_dir)
    w_id = Window.partitionBy("doc_id").orderBy("part", "x")
    peaks = peaks.withColumn("peak_id", F.row_number().over(w_id)).localCheckpoint(
        eager=False
    )

    # --- J4: limb candidates = consecutive-part peak pairs, scored -------
    a = peaks.alias("a")
    b = peaks.alias("b")
    dist = F.abs(F.col("a.x") - F.col("b.x"))
    cand = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.part") == F.col("a.part") + 1),
        )
        .where(dist < 16)  # E13 criterion: plausible limb length
        .select(
            F.col("a.doc_id").alias("doc_id"),
            # one greedy-matching group per (image, limb type): pack both
            # into the single group key the kernel shuffles on
            (F.col("a.doc_id") * N_PARTS + F.col("a.part")).alias("image_id"),
            F.col("a.peak_id").alias("a"),
            F.col("b.peak_id").alias("b"),
            F.round(1.0 / (1.0 + dist), 6).alias("score"),
        )
    )

    # --- W3: greedy one-to-one matching per (image, limb) ----------------
    matched = _grouped_blocks(
        cand.select("image_id", "a", "b", "score"),
        key="image_id",
        sort_cols=[F.asc("image_id"), F.desc("score"), F.asc("a"), F.asc("b")],
        block_fn=match_block,
        schema="image_id long, a int, b int, score double",
    )

    # --- T4: person assembly over matched connections per image ----------
    edges = matched.select(
        (F.col("image_id") / N_PARTS).cast("long").alias("image_id"), "a", "b"
    )
    persons = _grouped_blocks(
        edges,
        key="image_id",
        sort_cols=[F.asc("image_id"), F.asc("a"), F.asc("b")],
        block_fn=components_block,
        schema="image_id long, node int, component int",
    )

    # --- A10: prune weak persons (>= 3 connected keypoints) --------------
    strong = (
        persons.groupBy(F.col("image_id").alias("doc_id"), "component")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .where(F.col("n_parts") >= 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_persons"))
    )

    # --- M5/M6: jersey number from the digit cascade ---------------------
    digits = m5_digit_cascade(spark, sf_dir).select(
        "doc_id", (F.col("number") % 100).cast("int").alias("rosterNumber")
    )

    # --- J5: nearest-centroid team from payload brightness ---------------
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.crc32(F.col("text").cast("binary")).alias("tone")
    )
    centroids = spark.createDataFrame(
        [("紅隊", 1_000_000_000.0), ("藍隊", 3_000_000_000.0)], "team string, center double"
    )
    team_pick = Window.partitionBy("doc_id").orderBy(
        F.abs(F.col("tone") - F.col("center")), F.col("team")
    )
    teams = (
        docs.crossJoin(F.broadcast(centroids))
        .withColumn("rk", F.row_number().over(team_pick))
        .where(F.col("rk") == 1)
        .select("doc_id", "team")
    )

    # --- J1 + E3: broadcast stats lookup with sentinel, message ----------
    stats = player_stats_dim(spark, sf_dir)
    out = (
        strong.join(digits, "doc_id")
        .join(teams, "doc_id")
        .join(F.broadcast(stats), ["team", "rosterNumber"], "left")
    )
    return out.select(
        "doc_id",
        "n_persons",
        F.col("rosterNumber").alias("number"),
        "team",
        "score",
        "reb",
        "ast",
        F.when(
            F.col("score").isNotNull(),
            F.format_string(
                "%s %d號球員即將上場 場均得分%.1f 籃板%.1f 助攻%.1f",
                F.col("team"), F.col("rosterNumber"),
                F.col("score"), F.col("reb"), F.col("ast"),
            ),
        )
        .otherwise(F.lit("player not found"))
        .alias("message"),
    )
