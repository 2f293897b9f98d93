"""Similarity search over embeddings (SURVEY.md §2.12 X3).

Three tiers, trading recall for scale:
1. ``x3_cosine_topk`` — exact brute-force top-k (the correctness baseline;
   also genuinely the right plan when the query set is small: broadcast
   queries, one pass over candidates).
2. ``x3_ivf_topk`` — IVF-style partitioned search: assign every vector to
   its nearest coarse centroid, probe only the query's cell. Deterministic
   (fixed centroid ids) and still SQL-expressible, so it keeps an oracle.
3. ``x3_ann_lsh`` — random-hyperplane LSH bucketing via MLlib; the
   100 TB path (constant work per vector, bucket-local pairs). Seeded,
   rows-only.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.vectors import dot, l2_dist_sq, with_norm
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

N_QUERIES = 10  # vec_id < N_QUERIES are the probe vectors
N_CENTROIDS = 8  # vec_id < N_CENTROIDS double as IVF coarse centroids

_COS = (
    "LIST_DOT_PRODUCT(a.v, b.v) / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * "
    "SQRT(LIST_DOT_PRODUCT(b.v, b.v)))"
)


@query(
    "x3_cosine_topk",
    oracle=dedent(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROUND({_COS}, 6) AS cosine
            FROM e a JOIN e b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= 3
        """
    ),
    tags=("X3",),
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-3 for each probe vector. The probe set
    is broadcast; candidates stream through one projection — a single scan
    of the embedding table regardless of corpus size. Ranking uses the
    rounded score with neighbor_id tiebreak for cross-engine determinism.
    """
    e = with_norm(table(spark, sf_dir, "embeddings")).select("vec_id", "v", "norm")
    q = e.where(F.col("vec_id") < N_QUERIES)
    a, b = q.alias("a"), e.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = (
        F.broadcast(a)
        .join(b, F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


@query(
    "x3_ivf_topk",
    oracle=dedent(
        f"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        centroids AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
        assigned AS (
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY LIST_DISTANCE(e.v, c.cv), c.cid) AS rn
                FROM e CROSS JOIN centroids c
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROUND({_COS}, 6) AS cosine
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND b.vec_id <> a.vec_id
            WHERE a.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= 3
        """
    ),
    tags=("X3", "ivf"),
)
def x3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize every vector to its
    nearest of 8 centroids (euclidean, deterministic tiebreak), then search
    only the query's cell. The assignment is one broadcast cross join with
    a tiny centroid table; the search join is equi on the cell id — the
    shape that scales (per-cell work, no global pair space).
    """
    e = with_norm(table(spark, sf_dir, "embeddings")).select("vec_id", "v", "norm")
    centroids = e.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = l2_dist_sq(F.col("v"), F.col("cv"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
    assigned = (
        e.crossJoin(F.broadcast(centroids))
        .select("vec_id", "v", "norm", "cid", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "norm", "cid")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("b.vec_id") != F.col("a.vec_id")),
        )
        .where(F.col("a.vec_id") < N_QUERIES)
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


@query(
    "x3_embedding_stats",
    oracle=dedent(
        """
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT label, COUNT(*) AS n,
               ROUND(AVG(SQRT(LIST_DOT_PRODUCT(v, v))), 6) AS avg_norm
        FROM e GROUP BY label
        """
    ),
    tags=("X3",),
)
def x3_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics — norm computation via higher-order
    functions, aggregated JVM-side (no Python in the loop)."""
    e = with_norm(table(spark, sf_dir, "embeddings"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("norm"), 6).alias("avg_norm")
    )


@query("x3_ann_lsh", oracle=None, tags=("X3", "lsh"))
def x3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH
    (``BucketedRandomProjectionLSH``, seeded): bucket vectors, join only
    within buckets. Rows-only check — the hash family is not
    SQL-expressible; recall vs the exact baseline is asserted in tests.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="buckets", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    q = e.where(F.col("vec_id") < N_QUERIES)
    pairs = model.approxSimilarityJoin(q, e, threshold=8.0, distCol="l2_dist")
    pairs = pairs.where(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("l2_dist_r"), F.asc("neighbor_id"))
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round(F.col("l2_dist"), 6).alias("l2_dist_r"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.col("l2_dist_r").alias("l2_dist"))
    )


@query(
    "x3_ivf_multiprobe",
    oracle=dedent(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        centroids AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
        ranked AS (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY LIST_DISTANCE(e.v, c.cv), c.cid) AS rn
            FROM e CROSS JOIN centroids c
        ),
        assigned AS (SELECT vec_id, v, cid FROM ranked WHERE rn = 1),
        probes AS (SELECT vec_id, v, cid FROM ranked
                   WHERE rn <= 2 AND vec_id < {N_QUERIES}),
        scored AS (
            SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(p.v, b.v)
                         / (SQRT(LIST_DOT_PRODUCT(p.v, p.v))
                            * SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 6) AS cosine
            FROM probes p JOIN assigned b
              ON p.cid = b.cid AND b.vec_id <> p.vec_id
        )
        SELECT query_id, neighbor_id, cosine FROM (
            SELECT DISTINCT query_id, neighbor_id, cosine FROM scored
        ) t QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) <= 3
        """
    ),
    tags=("X3", "ivf"),
)
def x3_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2: each query searches its TWO nearest coarse cells
    (candidates stay single-cell-assigned) — the standard recall lever when
    a neighbor falls just across a cell boundary. Probe fan-out multiplies
    only the query side, so cost grows with nprobe x queries, never with
    the corpus."""
    e = with_norm(table(spark, sf_dir, "embeddings")).select("vec_id", "v", "norm")
    centroids = e.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = l2_dist_sq(F.col("v"), F.col("cv"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
    ranked = (
        e.crossJoin(F.broadcast(centroids))
        .select("vec_id", "v", "norm", "cid", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assigned = ranked.where(F.col("rn") == 1).select("vec_id", "v", "norm", "cid")
    probes = ranked.where(
        (F.col("rn") <= 2) & (F.col("vec_id") < N_QUERIES)
    ).select("vec_id", "v", "norm", "cid")
    p, b = probes.alias("p"), assigned.alias("b")
    cos = dot(F.col("p.v"), F.col("b.v")) / (F.col("p.norm") * F.col("b.norm"))
    scored = (
        p.join(
            b,
            (F.col("p.cid") == F.col("b.cid"))
            & (F.col("b.vec_id") != F.col("p.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )
