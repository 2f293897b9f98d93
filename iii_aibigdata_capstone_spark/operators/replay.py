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
    (dl_k_to_ss.py:444) and must survive the join.

    The stat columns derive via EXACT integer-cents arithmetic: acctbal is
    a 2-decimal double, so ``round(acctbal*100)`` recovers the integer
    cents and the mod + round-to-tenths runs as integer ops — float pmod
    then round-at-1 sat on half-tie boundaries (cents digit 5) where
    engines disagree, which matters now that the replay is
    oracle-checked."""
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")

    def tenth_stat(mult: int, mod_tenths: int) -> F.Column:
        # round(pmod(acctbal*mult, mod), 1) with exact integer arithmetic:
        # tenths = floor((cents*mult mod mod*100 + 5) / 10)  (half-up)
        return (
            F.floor((F.pmod(cents * mult, F.lit(mod_tenths * 100)) + 5) / 10) / 10.0
        )

    return (
        s.select(
            F.when(k % 2 == 0, F.lit("紅隊")).otherwise(F.lit("藍隊")).alias("team"),
            (k % 100).cast("int").alias("rosterNumber"),
            tenth_stat(1, 30).alias("score"),
            tenth_stat(3, 15).alias("reb"),
            tenth_stat(7, 12).alias("ast"),
        )
        .groupBy("team", "rosterNumber")
        .agg(F.min("score").alias("score"), F.min("reb").alias("reb"), F.min("ast").alias("ast"))
    )


_W3_WALK_ACC = (
    "w.taken < w.lim AND NOT LIST_CONTAINS(w.ua, r.a) AND NOT LIST_CONTAINS(w.ub, r.b)"
)


def _replay_oracle() -> str:
    """The full §3.2 chain as ONE DuckDB query: M7 pose peaks (sha256 stub
    pixels as list transforms) -> J4 consecutive-part candidates -> W3
    greedy matching (recursive rank walk per (image, limb) group) -> T4
    connected components (recursive reach closure) -> A10 prune -> M5
    digit cascade -> J5 md5-tone nearest centroid -> stats lookup with
    sentinel message. Every stage mirrors the Spark DAG's arithmetic
    exactly (integer kernels; score doubles from identical divisions)."""
    return f"""
        WITH RECURSIVE px AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT)) AS b
            FROM documents
        ),
        heat AS (
            SELECT doc_id, part,
                   LIST_TRANSFORM(b, v -> (v * (2*part + 3)) % 251) AS h
            FROM px CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS part)
        ),
        smo AS (
            SELECT doc_id, part, h,
                   LIST_TRANSFORM(RANGE(0, 32), i ->
                       (h[GREATEST(i, 1)] + h[i+1] + h[LEAST(i+2, 32)]) // 3) AS s
            FROM heat
        ),
        rawpeaks AS (
            SELECT doc_id, part, UNNEST(LIST_FILTER(RANGE(1, 31), i ->
                       s[i+1] > s[i] AND s[i+1] > s[i+2] AND s[i+1] > 170)) AS x
            FROM smo
        ),
        peaks AS (
            SELECT doc_id, part, x,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY part, x)
                       AS peak_id
            FROM rawpeaks
        ),
        cand AS (
            SELECT a.doc_id * 4 + a.part AS g,
                   a.peak_id AS a, b.peak_id AS b,
                   ROUND(1.0 / (1.0 + ABS(a.x - b.x)), 6) AS score
            FROM peaks a JOIN peaks b
              ON a.doc_id = b.doc_id AND b.part = a.part + 1
            WHERE ABS(a.x - b.x) < 16
        ),
        rankedm AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                      ORDER BY score DESC, a, b) AS rk
            FROM cand
        ),
        limm AS (
            SELECT g, LEAST(COUNT(DISTINCT a), COUNT(DISTINCT b)) AS lim
            FROM cand GROUP BY 1
        ),
        walkm AS (
            SELECT r.g, r.rk, r.a, r.b,
                   TRUE AS acc, [r.a] AS ua, [r.b] AS ub, 1 AS taken, l.lim
            FROM rankedm r JOIN limm l USING (g) WHERE r.rk = 1
            UNION ALL
            SELECT r.g, r.rk, r.a, r.b,
                   {_W3_WALK_ACC},
                   CASE WHEN {_W3_WALK_ACC}
                        THEN LIST_APPEND(w.ua, r.a) ELSE w.ua END,
                   CASE WHEN {_W3_WALK_ACC}
                        THEN LIST_APPEND(w.ub, r.b) ELSE w.ub END,
                   w.taken + CASE WHEN {_W3_WALK_ACC} THEN 1 ELSE 0 END,
                   w.lim
            FROM walkm w JOIN rankedm r ON r.g = w.g AND r.rk = w.rk + 1
        ),
        medges AS (
            SELECT g // 4 AS img, a, b FROM walkm WHERE acc
        ),
        bi AS (
            SELECT img, a, b FROM medges
            UNION ALL SELECT img, b, a FROM medges
        ),
        nodes AS (SELECT DISTINCT img, a AS node FROM bi),
        reach AS (
            SELECT img, node AS src, node AS dst FROM nodes
            UNION
            SELECT r.img, r.src, e.b FROM reach r
            JOIN bi e ON e.img = r.img AND e.a = r.dst
        ),
        comp AS (
            SELECT img, src AS node, MIN(dst) AS component
            FROM reach GROUP BY 1, 2
        ),
        strong AS (
            SELECT img AS doc_id, COUNT(*) AS n_persons FROM (
                SELECT img, component FROM comp
                GROUP BY img, component HAVING COUNT(*) >= 3
            ) GROUP BY 1
        ),
        dpx AS (
            SELECT doc_id,
                   UNNEST(RANGE(0, 32)) AS x,
                   UNNEST(LIST_TRANSFORM(RANGE(0, 32), i ->
                       CAST('0x' || SUBSTR(SHA256(text), i*2+1, 2) AS INT))) AS v
            FROM documents
        ),
        dprop AS (
            SELECT doc_id, x, v,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY x) AS rn
            FROM dpx WHERE v > 200
        ),
        ddet AS (
            SELECT doc_id, x, v % 10 AS digit
            FROM dprop WHERE rn <= 4 AND ROUND(v / 255.0, 6) > 0.8
        ),
        drank AS (
            SELECT doc_id, digit,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY x DESC) - 1 AS r
            FROM ddet
        ),
        digits AS (
            SELECT doc_id,
                   CAST(CAST(SUM(digit * POW(10.0, r)) AS BIGINT) % 100 AS INT)
                       AS rosterNumber
            FROM drank GROUP BY doc_id
        ),
        tone AS (
            SELECT doc_id,
                   CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) AS tone
            FROM documents
        ),
        teams AS (
            SELECT doc_id, team FROM (
                SELECT doc_id, team,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY ABS(tone - center), team) AS rk
                FROM tone CROSS JOIN (
                    VALUES ('紅隊', 1000000000.0), ('藍隊', 3000000000.0)
                ) AS c(team, center)
            ) WHERE rk = 1
        ),
        statsrc AS (
            SELECT CASE WHEN s_suppkey % 2 = 0 THEN '紅隊' ELSE '藍隊' END AS team,
                   CAST(s_suppkey % 100 AS INT) AS rosterNumber,
                   CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents
            FROM supplier
        ),
        stats AS (
            SELECT team, rosterNumber,
                   MIN(FLOOR((((cents % 3000) + 3000) % 3000 + 5) / 10) / 10.0)
                       AS score,
                   MIN(FLOOR((((cents*3 % 1500) + 1500) % 1500 + 5) / 10) / 10.0)
                       AS reb,
                   MIN(FLOOR((((cents*7 % 1200) + 1200) % 1200 + 5) / 10) / 10.0)
                       AS ast
            FROM statsrc GROUP BY 1, 2
        )
        SELECT s.doc_id, s.n_persons, d.rosterNumber AS number, t.team,
               st.score, st.reb, st.ast,
               CASE WHEN st.score IS NOT NULL
                    THEN printf('%s %d號球員即將上場 場均得分%.1f 籃板%.1f 助攻%.1f',
                                t.team, d.rosterNumber, st.score, st.reb, st.ast)
                    ELSE 'player not found' END AS message
        FROM strong s
        JOIN digits d USING (doc_id)
        JOIN teams t USING (doc_id)
        LEFT JOIN stats st
          ON st.team = t.team AND st.rosterNumber = d.rosterNumber
    """


@query("dl_pipeline_replay", oracle=_replay_oracle(), tags=("flagship", "udf", "grouped-map"))
def dl_pipeline_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end §3.2 replay in batch mode; one row per identified player
    per image: (doc_id, n_persons, number, team, score, reb, ast, message).
    Oracle-checked end to end (upgraded from rows-only in r2): the whole
    10-stage chain — both recursive greedy/graph stages included — replays
    as one DuckDB query (see :func:`_replay_oracle`); determinism pinned
    by the stub kernels' content hashes."""
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
    # tone = first 8 md5 hex chars as an int (crc32's 32-bit range, but
    # engine-neutral — DuckDB has no crc32, and the replay is oracle-checked)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long").alias("tone"),
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
