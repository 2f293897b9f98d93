"""End-to-end corpus curation (the canonical LLM training-data pipeline,
BASELINE.json north star): quality filter -> exact dedup -> near-dup drop ->
per-language yield report. One composed DataFrame DAG, fully oracle-checked.

Stage semantics (each SQL-expressible so the whole pipeline keeps a DuckDB
oracle):
1. quality: keep docs the broadcast quality classifier passes
   (x4_quality_model_score's integer-quantized linear head, logit >= 0 —
   the production shape: curation pipelines gate on a trained model, not
   hand rules);
2. exact: among survivors, keep the min doc_id per md5(text);
3. near-dup: drop any survivor that shares >= 0.5 word-3-gram Jaccard with
   a SMALLER surviving doc_id (min-id representative wins; rule is
   pairwise, not transitive, so it is deterministic and join-expressible);
4. report per language: kept docs/tokens + drops per stage.

Scale shape: stages 1-2 are scan + one hash shuffle; stage 3 is the
inverted-shingle-index join from x2 (never all-pairs), restricted to stage-2
survivors; the report is a single aggregation over tagged rows.
"""

from __future__ import annotations

import math
from textwrap import dedent
from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar
from .textual import QUALITY_FEATURES_SQL, QUALITY_LOGIT_SQL, quality_logit_col

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)


@query(
    "x9_quality_audit",
    oracle=dedent(
        """
        SELECT 'orders' AS tbl,
               (SELECT COUNT(*) FROM orders) AS n_rows,
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_null_keys,
               (SELECT COUNT(*) FROM (
                    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
                )) AS n_dup_ids,
               (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem' AS tbl,
               (SELECT COUNT(*) FROM lineitem) AS n_rows,
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS n_null_keys,
               (SELECT COUNT(*) FROM (
                    SELECT l_orderkey, l_linenumber FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
                )) AS n_dup_ids,
               (SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        """
    ),
    tags=("X1", "X5"),
)
def x9_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the constraint checks an ingest gate runs
    before a corpus ships: row counts, null foreign keys, duplicate
    primary keys, referential orphans. ONE pass per table: left join the
    (distinct) dim key, group by primary key, and derive all four metrics
    from the per-pk partials in a final scalar aggregate — the r01 shape
    ran 8 sequential driver-blocking count() jobs for the same numbers.
    A null or unmatched fk leaves the joined dim key null, which is
    exactly NOT EXISTS semantics; the left join preserves multiplicity
    because the dim side is distinct. No driver collect anywhere — the
    audit is a single unioned DataFrame."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")

    def audit_table(name, df, pk_cols, fk_col, dim, dim_key):
        dk = dim.select(F.col(dim_key).alias("_dk")).distinct()
        j = df.select(*pk_cols, F.col(fk_col).alias("_fk")).join(
            dk, F.col("_fk") == F.col("_dk"), "left"
        )
        per_pk = j.groupBy(*pk_cols).agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col("_fk").isNull().cast("long")).alias("_nulls"),
            F.sum(F.col("_dk").isNull().cast("long")).alias("_orph"),
        )
        return per_pk.agg(
            F.sum("_c").alias("n_rows"),
            F.sum("_nulls").alias("n_null_keys"),
            F.sum((F.col("_c") > 1).cast("long")).alias("n_dup_ids"),
            F.sum("_orph").alias("n_orphans"),
        ).select(
            F.lit(name).alias("tbl"), "n_rows", "n_null_keys", "n_dup_ids", "n_orphans"
        )

    return audit_table(
        "orders", orders, ["o_orderkey"], "o_custkey", customer, "c_custkey"
    ).unionByName(
        audit_table(
            "lineitem", li, ["l_orderkey", "l_linenumber"], "l_orderkey", orders, "o_orderkey"
        )
    )


@query(
    "x9_corpus_curation",
    oracle=dedent(
        f"""
        WITH scored AS (
            SELECT doc_id, lang, text, n_chars,
                   {QUALITY_FEATURES_SQL}
            FROM documents
        ),
        good AS (
            SELECT * FROM scored WHERE {QUALITY_LOGIT_SQL} >= 0
        ),
        keepers AS (
            SELECT MIN(doc_id) AS doc_id FROM good GROUP BY MD5(text)
        ),
        exact_kept AS (
            SELECT g.* FROM good g JOIN keepers k ON g.doc_id = k.doc_id
        ),
        toks AS (
            SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS t FROM exact_kept
        ),
        shingles AS (
            SELECT DISTINCT doc_id, lang,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
            FROM toks WHERE LEN(t) >= 3
        ),
        sized AS (
            SELECT doc_id, lang, s,
                   COUNT(*) OVER (PARTITION BY doc_id) AS n
            FROM shingles
        ),
        pair AS (
            SELECT b.doc_id AS drop_id
            FROM sized a JOIN sized b
              ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n, b.n
            HAVING COUNT(*) * 1.0 / (a.n + b.n - COUNT(*)) >= 0.5
        ),
        neardup_drop AS (SELECT DISTINCT drop_id FROM pair),
        final_kept AS (
            SELECT e.* FROM exact_kept e
            LEFT JOIN neardup_drop d ON e.doc_id = d.drop_id
            WHERE d.drop_id IS NULL
        )
        SELECT s.lang,
               COUNT(CASE WHEN f.doc_id IS NOT NULL THEN 1 END) AS n_kept,
               CAST(COALESCE(SUM(CASE WHEN f.doc_id IS NOT NULL THEN s.n_tokens END), 0) AS BIGINT) AS n_tokens_kept,
               COUNT(CASE WHEN g.doc_id IS NULL THEN 1 END) AS n_dropped_quality,
               COUNT(CASE WHEN g.doc_id IS NOT NULL AND e.doc_id IS NULL THEN 1 END) AS n_dropped_exact,
               COUNT(CASE WHEN e.doc_id IS NOT NULL AND f.doc_id IS NULL THEN 1 END) AS n_dropped_neardup
        FROM scored s
        LEFT JOIN good g ON s.doc_id = g.doc_id
        LEFT JOIN exact_kept e ON s.doc_id = e.doc_id
        LEFT JOIN final_kept f ON s.doc_id = f.doc_id
        GROUP BY s.lang
        """
    ),
    tags=("X1", "X2", "X4", "flagship"),
)
def x9_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. The Spark side tags each document with the
    stage that dropped it, then aggregates once — no per-stage re-scans of
    the corpus."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    toks = F.split(F.col("text"), " ")
    # scored feeds the quality chain AND the final tagging join; exact_kept
    # feeds both shingle-join sides, the anti join, and the tagging join.
    # Materialize each once — re-deriving the tokenization/dedup for every
    # consumer measured 2.5s -> 2.0s at sf0.1 (and 6s cold).
    # Stage-1 gate = the broadcast quality model's logit (all-integer
    # arithmetic, same weights as x4_quality_model_score), JVM-side here
    # because the linear head IS a Catalyst expression — the mapInPandas
    # seam in x4 is for models that aren't.
    logit = quality_logit_col(toks, F.col("n_chars"))
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        logit.cast("long").alias("logit_milli"),
    ).localCheckpoint(eager=False)
    good = scored.where(F.col("logit_milli") >= 0)

    # stage 2: exact dedup, min doc_id survives per content hash
    w_hash = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact_kept = (
        good.withColumn("rn", F.row_number().over(w_hash))
        .where(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=False)
    )

    # stage 3: near-dup drop via the inverted shingle index (x2's shape),
    # restricted to exact survivors; join keys are 64-bit shingle hashes
    t = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("t")) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + F.lit(1)),
            F.element_at(F.col("t"), i + F.lit(2)),
        ),
    )
    sh = (
        exact_kept.select("doc_id", "lang", t.alias("t"))
        .where(F.size(F.col("t")) >= 3)
        .select("doc_id", "lang", F.explode(F.array_distinct(grams)).alias("s"))
        .select("doc_id", "lang", F.xxhash64("s").alias("s"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        # exchange reuse does not cover the two self-join sides (see
        # x2_ngram_jaccard); materialize the shingle table once
        .localCheckpoint(eager=False)
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("keep_id"),
            F.col("b.doc_id").alias("drop_id"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
        .where(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) >= 0.5)
        .select("drop_id")
        .distinct()
    )
    final_kept = exact_kept.join(
        pairs, exact_kept.doc_id == pairs.drop_id, "left_anti"
    )

    # report: tag every source doc with how far it survived
    g = good.select(F.col("doc_id").alias("g_id"))
    e = exact_kept.select(F.col("doc_id").alias("e_id"))
    f = final_kept.select(F.col("doc_id").alias("f_id"))
    tagged = (
        scored.join(g, scored.doc_id == g.g_id, "left")
        .join(e, scored.doc_id == e.e_id, "left")
        .join(f, scored.doc_id == f.f_id, "left")
    )
    return tagged.groupBy("lang").agg(
        F.count(F.when(F.col("f_id").isNotNull(), 1)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("f_id").isNotNull(), F.col("n_tokens"))), F.lit(0)
        ).alias("n_tokens_kept"),
        F.count(F.when(F.col("g_id").isNull(), 1)).alias("n_dropped_quality"),
        F.count(
            F.when(F.col("g_id").isNotNull() & F.col("e_id").isNull(), 1)
        ).alias("n_dropped_exact"),
        F.count(
            F.when(F.col("e_id").isNotNull() & F.col("f_id").isNull(), 1)
        ).alias("n_dropped_neardup"),
    )


@query(
    "x9_outlier_mad",
    oracle=dedent(
        """
        WITH med AS (
            SELECT event_type, MEDIAN(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               COUNT(*) AS n,
               ROUND(MIN(d.med), 6) AS med,
               ROUND(MIN(m.mad), 6) AS mad,
               COUNT(CASE WHEN ABS(d.value - d.med) > 3 * 1.4826 * m.mad
                          THEN 1 END) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
        """
    ),
    tags=("X4", "A1"),
)
def x9_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median + MAD (median absolute
    deviation), flag |v - med| > 3 sigma_MAD with the 1.4826 normal
    consistency constant — the value-distribution QA gate that mean/stddev
    z-scores fail on heavy-tailed data. Two median passes (each one
    shuffle), then a broadcast of the tiny per-group stats. ``med`` and
    ``dev`` are each consumed twice (the MAD pass + the flag pass), so
    both are materialized once via lazy localCheckpoint — without the
    boundaries the fact table is scanned four times instead of twice
    (medians are not algebraic; two sequential passes is the floor)."""
    ev = table(spark, sf_dir, "events")
    med = (
        ev.groupBy("event_type")
        .agg(F.median("value").alias("med"))
        .localCheckpoint(eager=False)
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        # project to the 4 consumed columns BEFORE the checkpoint: the
        # boundary blocks downstream pruning from reaching the scan, so an
        # unprojected checkpoint would read + store the full event width
        .select("event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev"))
        .localCheckpoint(eager=False)
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("med"), 6).alias("med"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.count(
            F.when(F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1)
        ).alias("n_outliers"),
    )


MIX_ALPHA = 0.5  # temperature exponent: source weight ∝ tokens^alpha
MIX_BUDGET = 20000.0  # token budget the sampling rates are sized against

# ONE oracle spelling of the temperature sampling rate (shared by
# x9_training_mix and the x9_data_factory quota stage): the IEEE tree
# w / SUM(w) OVER () * budget / n_tokens must stay identical everywhere
# the rate is computed, or round-6 values desynchronize across lanes.
# The SQL renders the budget as an integer literal, so a non-integral
# budget would silently round in the oracle while the Spark twin
# (mix_rate_cols) used the exact float — refuse that desync at import.
assert MIX_BUDGET == int(MIX_BUDGET), "MIX_BUDGET must be integral (SQL literal)"
_MIX_RATE_SQL = f"LEAST(w / SUM(w) OVER () * {int(MIX_BUDGET)} / n_tokens, 1.0)"


def mix_weighted_sql(src: str) -> str:
    """CTEs ``per_source weighted`` of the temperature mix over a CTE (or
    table) named ``src`` with columns ``source, text`` — the shared
    per-source token aggregate + tokens^alpha weight feeding
    ``_MIX_RATE_SQL``."""
    return f"""per_source AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
            FROM {src} GROUP BY source
        ),
        weighted AS (
            SELECT *, POW(n_tokens, {MIX_ALPHA}) AS w FROM per_source
        )"""


def mix_rate_cols(n_tokens_col) -> tuple:
    """``(mix, rate)`` column pair — the Spark twin of ``_MIX_RATE_SQL``
    over a per-source ``n_tokens`` column (one spelling of the
    temperature-mix IEEE tree for x9_training_mix and the
    x9_data_factory quota stage)."""
    w = F.pow(n_tokens_col.cast("double"), MIX_ALPHA)
    mix = w / F.sum(w).over(Window.partitionBy())
    rate = F.least(mix * MIX_BUDGET / n_tokens_col, F.lit(1.0))
    return mix, rate


@query(
    "x9_training_mix",
    oracle=dedent(
        f"""
        WITH {mix_weighted_sql('documents')}
        SELECT source, n_docs, n_tokens,
               ROUND(w / SUM(w) OVER (), 6) AS mix_prob,
               ROUND({_MIX_RATE_SQL}, 6) AS sample_rate,
               CAST(ROUND({_MIX_RATE_SQL} * n_tokens, 0) AS BIGINT) AS expected_tokens
        FROM weighted
        """
    ),
    tags=("X4", "X1", "mixing"),
)
def x9_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction — temperature-based source sampling (the
    multilingual-LM mixing rule, alpha = 0.5): source weight ∝
    tokens^alpha, normalized into mixing probabilities, converted to
    per-source sampling rates against a fixed token budget (capped at 1 —
    no upsampling), with the expected token yield per source.

    One aggregation over the corpus; the tiny per-source table then
    normalizes with a scalar window — the output feeds ``sampleBy`` (the
    seeded stratified sampler, s10) to materialize the mix. Map-side
    token counting; nothing but the per-source totals ever shuffles.
    """
    docs = table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    mix, rate = mix_rate_cols(F.col("n_tokens"))
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(mix, 6).alias("mix_prob"),
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("n_tokens"), 0).cast("long").alias("expected_tokens"),
    )


CHUNK_W = 200  # chunk window (chars)
CHUNK_S = 150  # chunk stride (chars; 50-char overlap)

# The ONE DuckDB spelling of the chunk table (doc_id, chunk_id, ctext) —
# shared by the x9_doc_chunking oracle and the x9_rag_pipeline oracle's
# chunks CTE, so the chunk geometry cannot drift between the standalone
# lane and the composed pipeline (review r9; the cms_hash_col discipline).
_CHUNKS_SQL = (
    f"SELECT d.doc_id, k AS chunk_id, "
    f"SUBSTR(d.text, CAST(k * {CHUNK_S} + 1 AS BIGINT), {CHUNK_W}) AS ctext "
    f"FROM documents d, "
    f"UNNEST(RANGE(0, CAST(FLOOR((LENGTH(d.text) - 1) / {CHUNK_S}) "
    f"AS BIGINT) + 1)) AS t(k) "
    f"WHERE LENGTH(d.text) > 0"
)


def doc_chunks(docs: DataFrame, par: int | None = None) -> DataFrame:
    """``(doc_id, chunk_id, ctext)`` — CHUNK_W-char (200) windows every
    CHUNK_S (150) chars over non-empty documents; the Spark twin of
    ``_CHUNKS_SQL`` (ONE spelling of the chunk geometry, shared by
    x9_doc_chunking and the x9_rag_pipeline stage 1). A lateral explode
    of a ``sequence`` — no UDF, narrow unless ``par`` asks for the
    pre-explode repartition (the compact-single-file-corpus gotcha for
    consumers that fan out further, e.g. the RAG tokenizer)."""
    nz = docs.where(F.length("text") > 0)
    if par:
        nz = nz.repartition(par, "doc_id")
    k = F.explode(
        F.sequence(
            F.lit(0).cast("long"), F.floor((F.length("text") - 1) / CHUNK_S)
        )
    ).alias("chunk_id")
    # The INT cast cannot wrap even though _CHUNKS_SQL spells BIGINT:
    # chunk_id <= (length-1)/CHUNK_S, so chunk_id*CHUNK_S + 1 <= length,
    # and Spark `length()` is IntegerType (strings cap at INT_MAX chars),
    # bounding the start position at 2^31-1 by construction.
    ctext = F.substring(
        F.col("text"), (F.col("chunk_id") * CHUNK_S + 1).cast("int"), CHUNK_W
    )
    return nz.select("doc_id", "text", k).select(
        "doc_id", "chunk_id", ctext.alias("ctext")
    )


@query(
    "x9_doc_chunking",
    oracle=dedent(
        f"""
        SELECT doc_id, chunk_id,
               chunk_id * {CHUNK_S} AS chunk_start,
               LENGTH(ctext) AS chunk_len,
               MD5(ctext) AS chunk_md5
        FROM ({_CHUNKS_SQL})
        """
    ),
    tags=("X9", "T2", "chunking"),
)
def x9_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: CHUNK_W-char (200) windows every
    CHUNK_S (150) chars (50-char overlap), one output row per chunk with its
    offset, length and content hash. The chunk count is a pure expression
    of the doc length, so the fan-out is a lateral explode of a
    ``sequence`` (doc_chunks — the shared geometry) — no UDF, no shuffle
    at all (narrow transform; whole-stage codegen keeps substring+md5
    JVM-side). Embarrassingly parallel at 100 TB: chunks inherit the
    scan's partitioning and flow straight into downstream
    embedding/indexing stages; the overlap means every substring is
    cut twice rather than buffered across rows."""
    chunks = doc_chunks(table(spark, sf_dir, "documents"))
    return chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * CHUNK_S).alias("chunk_start"),
        F.length("ctext").alias("chunk_len"),
        F.md5("ctext").alias("chunk_md5"),
    )


# --- DSIR-style importance resampling --------------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"
DSIR_K = 50


def dsir_doc_logw(docs: DataFrame) -> DataFrame:
    """``(doc_id, lang, logw)`` DSIR hashed-unigram log importance weight
    of any ``(doc_id, lang, text)`` frame — the Spark twin of
    ``dsir_logw_chain_sql`` (one weighting spelling for x9_dsir_resample
    and the x9_data_factory mix stage). Bucket models are
    ``DSIR_BUCKETS``-row aggregates broadcast back onto the token table;
    the token table is checkpointed once (feeds both models and the
    scoring pass)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    tok = (
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .select("doc_id", "lang", bucket.alias("b"))
        .localCheckpoint(eager=False)  # feeds both models and the scoring pass
    )
    raw_model = tok.groupBy("b").agg(F.count(F.lit(1)).alias("n_raw"))
    tgt_model = tok.where(F.col("lang") == DSIR_TARGET_LANG).groupBy("b").agg(
        F.count(F.lit(1)).alias("n_tgt")
    )
    # r14: the 1-row exact-count totals are collected once and attached
    # as long literals — same values into the identical log-ratio IEEE
    # tree, minus a BroadcastNestedLoopJoin + broadcast sub-job (the agg
    # over the checkpointed token table still runs exactly once)
    trow = tok.agg(
        F.count(F.lit(1)).alias("t_raw"),
        F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("long")).alias("t_tgt"),
    ).collect()[0]
    lr = raw_model.join(tgt_model, "b", "left").select(
        "b",
        (
            F.log(
                (F.coalesce(F.col("n_tgt"), F.lit(0)) + 1)
                / (F.lit(trow["t_tgt"]) + DSIR_BUCKETS).cast("double")
            )
            - F.log(
                (F.col("n_raw") + 1)
                / (F.lit(trow["t_raw"]) + DSIR_BUCKETS).cast("double")
            )
        ).alias("logratio"),
    )
    return (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.any_value("lang").alias("lang"), F.sum("logratio").alias("logw"))
    )


def dsir_logw_chain_sql(src: str) -> str:
    """CTEs ``tok raw_model tgt_model totals lr doc_w`` computing the
    DSIR hashed-unigram log importance weight per document of a CTE (or
    table) named ``src`` with columns ``doc_id, lang, text`` — ONE oracle
    spelling of the DSIR weighting, shared by x9_dsir_resample
    (src=documents) and the x9_data_factory mix stage (src=clean)."""
    return f"""tok AS (
            SELECT doc_id, lang,
                   CAST('0x' || SUBSTR(MD5(UNNEST(STRING_SPLIT(text, ' '))), 1, 15)
                        AS BIGINT) % {DSIR_BUCKETS} AS b
            FROM {src}
        ),
        raw_model AS (
            SELECT b, COUNT(*) AS n_raw FROM tok GROUP BY b
        ),
        tgt_model AS (
            SELECT b, COUNT(*) AS n_tgt FROM tok
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
        ),
        totals AS (
            SELECT (SELECT COUNT(*) FROM tok) AS t_raw,
                   (SELECT COUNT(*) FROM tok WHERE lang = '{DSIR_TARGET_LANG}') AS t_tgt
        ),
        lr AS (
            SELECT r.b,
                   LN((COALESCE(g.n_tgt, 0) + 1)
                      / CAST(t.t_tgt + {DSIR_BUCKETS} AS DOUBLE))
                 - LN((r.n_raw + 1)
                      / CAST(t.t_raw + {DSIR_BUCKETS} AS DOUBLE)) AS logratio
            FROM raw_model r
            LEFT JOIN tgt_model g ON r.b = g.b
            CROSS JOIN totals t
        ),
        doc_w AS (
            SELECT tok.doc_id, ANY_VALUE(tok.lang) AS lang,
                   SUM(lr.logratio) AS logw
            FROM tok JOIN lr ON tok.b = lr.b
            GROUP BY tok.doc_id
        )"""


@query(
    "x9_dsir_resample",
    oracle=dedent(
        f"""
        WITH {dsir_logw_chain_sql('documents')},
        keyed AS (
            SELECT doc_id, lang,
                   ROUND(logw, 6) AS logw,
                   ROUND(logw - LN(-LN(
                       (CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000000 + CAST(0.5 AS DOUBLE))
                       / CAST(1000000 AS DOUBLE))), 6) AS gumbel_key
            FROM doc_w
        )
        SELECT CAST(rank AS BIGINT) AS rank, doc_id, lang, logw, gumbel_key
        FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id) AS rank
            FROM keyed
        ) WHERE rank <= {DSIR_K}
        """
    ),
    tags=("X9", "X4", "dsir", "curation"),
)
def x9_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): build hashed-unigram
    bag models of the TARGET distribution (here lang='en') and the RAW
    corpus, weight every document by its log importance ratio
    sum_tokens ln(p_tgt(bucket)/p_raw(bucket)) (Laplace-smoothed, 256
    hash buckets), and resample via deterministic Gumbel top-k — the
    exact DSIR sampler, with the Gumbel noise derived from the
    engine-neutral md5-uniform of doc_id instead of an RNG so the draw
    is reproducible (and oracle-checkable) across engines.

    Scale shape: one token explode; the bucket models are 256-row
    aggregates (constant state regardless of corpus size — the whole
    point of hashed features), broadcast back onto the token table; one
    groupBy doc_id; the global top-k is a single ROW_NUMBER over rounded
    keys. At 100 TB: two shuffles (bucket agg is map-side combined to
    256 rows, doc agg hashes on doc_id) plus a final 50-row limit —
    nothing grows with vocabulary."""
    doc_w = dsir_doc_logw(table(spark, sf_dir, "documents"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000000
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    keyed = doc_w.select(
        "doc_id",
        "lang",
        F.round("logw", 6).alias("logw"),
        F.round(F.col("logw") - F.log(-F.log(u)), 6).alias("gumbel_key"),
    )
    # global top-k as orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k merged on the driver — scale-safe), NOT a row_number
    # over an unpartitioned window, which would sort the whole corpus in
    # ONE partition; rank is then a window over just the k survivors
    topk = keyed.orderBy(F.desc("gumbel_key"), F.asc("doc_id")).limit(DSIR_K)
    w = Window.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "lang",
        "logw",
        "gumbel_key",
    )


SOURCE_QUOTA_K = 10  # kept documents per source


@query(
    "x9_source_quota",
    oracle=dedent(
        f"""
        WITH f AS (
            SELECT doc_id, source,
                   {QUALITY_FEATURES_SQL},
                   n_chars
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source,
                   CAST({QUALITY_LOGIT_SQL} AS BIGINT) AS logit_milli
            FROM f
        )
        SELECT source, doc_id, logit_milli,
               CAST(rank_in_source AS BIGINT) AS rank_in_source
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY logit_milli DESC, doc_id)
                          AS rank_in_source
            FROM scored
        ) WHERE rank_in_source <= {SOURCE_QUOTA_K}
        """
    ),
    tags=("X9", "X4", "quota", "curation"),
)
def x9_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality quotas — the DOMAIN CAP stage of corpus curation
    (no single crawl domain may dominate the training mix; within each
    source, keep only the highest-quality documents): the best
    {SOURCE_QUOTA_K} docs per source by the deterministic quality-model
    logit (same weights as x4_quality_model_score, JVM-side Catalyst
    arithmetic), doc_id tiebreak.

    Scale shape: one pruned scan, the logit riding the projection, then a
    rank <= K filter over a source-partitioned window — which Spark
    rewrites to WindowGroupLimit, i.e. each input partition keeps its own
    top-{SOURCE_QUOTA_K} per source BEFORE the shuffle, so the exchange
    carries at most K rows per (partition, source), never a domain's full
    document set (the property that survives a crawl where one domain is
    a third of the corpus — the skew case domain caps exist for)."""
    docs = table(spark, sf_dir, "documents")
    # tokenization projected ONCE before multi-reference (the shingling
    # discipline: inlined split() re-evaluates per sub-expression)
    with_toks = docs.select(
        "doc_id", "source", "n_chars", F.split(F.col("text"), " ").alias("toks")
    )
    logit = quality_logit_col(F.col("toks"), F.col("n_chars"))
    scored = with_toks.select(
        "doc_id", "source", logit.cast("long").alias("logit_milli")
    )
    w = Window.partitionBy("source").orderBy(F.desc("logit_milli"), F.asc("doc_id"))
    return (
        scored.withColumn("rank_in_source", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_source") <= SOURCE_QUOTA_K)
        .select("source", "doc_id", "logit_milli", "rank_in_source")
    )


# --- X9: composed retrieval product (RAG pipeline) ---------------------------

RAG_PROBES = 5  # doc_id/vec_id < RAG_PROBES are the pipeline's queries
RAG_LANE_K = 10  # per-lane shortlist depth feeding the fusion
RAG_TOPK = 5  # fused results served per query
RRF_K = 60  # the classic reciprocal-rank-fusion damping constant
RRF_SCALE = 1_000_000  # rrf term = RRF_SCALE DIV (RRF_K + rank) — exact ints


def _rag_chain_sql() -> str:
    """The production retrieval CTE chain — chunk tf/df/corpus stats ->
    chunk-BM25 max-pooled per doc -> IVF nprobe=2 dense ranks -> integer
    RRF fusion -> per-query ``topk`` — ONE oracle spelling shared by
    x9_rag_pipeline (which serves ``topk`` through the dim join) and
    x9_rag_eval (which grades ``topk`` against the exact composite
    ground truth, reusing the chain's ``bm25`` and ``e`` CTEs for its
    truth lanes). Factored r11; proven byte-identical to the pre-split
    x9_rag_pipeline oracle at extraction; the IVF assignment CTEs are
    the shared ``ivf_rank_ctes`` spelling (same text modulo layout,
    re-verified hash-green after the swap)."""
    from .textual import _BM25_AVGDL_SQL, _BM25_CONTRIB_SQL, _BM25_IDF_SQL
    from .similarity import ivf_rank_ctes

    return dedent(
        f"""\
        chunks AS MATERIALIZED ({_CHUNKS_SQL}),
        tf0 AS MATERIALIZED (
            SELECT doc_id, chunk_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, chunk_id,
                         UNNEST(STRING_SPLIT(ctext, ' ')) AS term
                  FROM chunks)
            WHERE term <> '' GROUP BY 1, 2, 3
        ),
        tf AS MATERIALIZED (
            SELECT doc_id, chunk_id, term, tf,
                   CAST(SUM(tf) OVER (PARTITION BY doc_id, chunk_id)
                        AS BIGINT) AS dl
            FROM tf0
        ),
        g AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total
            FROM (SELECT doc_id, chunk_id, MAX(dl) AS dl
                  FROM tf GROUP BY 1, 2)
        ),
        dfreq AS MATERIALIZED (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        pterm AS MATERIALIZED (
            SELECT q.query_id, q.term,
                   {_BM25_IDF_SQL} AS idf, {_BM25_AVGDL_SQL} AS avgdl
            FROM (SELECT DISTINCT doc_id AS query_id, term FROM tf
                  WHERE doc_id < {RAG_PROBES}) q
            JOIN dfreq USING (term) CROSS JOIN g
        ),
        cscore AS MATERIALIZED (
            SELECT pt.query_id, t.doc_id, t.chunk_id,
                   CAST(SUM({_BM25_CONTRIB_SQL}) AS BIGINT) AS score_micro
            FROM pterm pt
            JOIN tf t ON t.term = pt.term AND t.doc_id <> pt.query_id
            GROUP BY 1, 2, 3
        ),
        bm25 AS MATERIALIZED (
            SELECT query_id, doc_id, br FROM (
                SELECT query_id, doc_id,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY doc_score DESC, doc_id) AS BIGINT) AS br
                FROM (SELECT query_id, doc_id,
                             MAX(score_micro) AS doc_score
                      FROM cscore GROUP BY 1, 2)
            ) WHERE br <= {RAG_LANE_K}
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        {ivf_rank_ctes()},
        assigned AS (SELECT vec_id, v, cid FROM ranked WHERE rn = 1),
        probes AS (SELECT vec_id, v, cid FROM ranked
                   WHERE rn <= 2 AND vec_id < {RAG_PROBES}),
        dscored AS MATERIALIZED (
            SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS doc_id,
                   ROUND(LIST_DOT_PRODUCT(p.v, b.v)
                         / (SQRT(LIST_DOT_PRODUCT(p.v, p.v))
                            * SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 6) AS cosine
            FROM probes p JOIN assigned b
              ON p.cid = b.cid AND b.vec_id <> p.vec_id
        ),
        dense AS MATERIALIZED (
            SELECT query_id, doc_id, cr FROM (
                SELECT query_id, doc_id,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, doc_id) AS BIGINT) AS cr
                FROM dscored
            ) WHERE cr <= {RAG_LANE_K}
        ),
        fused AS MATERIALIZED (
            SELECT COALESCE(b.query_id, d.query_id) AS query_id,
                   COALESCE(b.doc_id, d.doc_id) AS doc_id,
                   CAST(COALESCE(b.br, 0) AS BIGINT) AS bm25_rank,
                   CAST(COALESCE(d.cr, 0) AS BIGINT) AS cos_rank,
                   CAST(CASE WHEN b.br IS NULL THEN 0
                             ELSE {RRF_SCALE} // ({RRF_K} + b.br) END
                      + CASE WHEN d.cr IS NULL THEN 0
                             ELSE {RRF_SCALE} // ({RRF_K} + d.cr) END
                        AS BIGINT) AS rrf_micro
            FROM bm25 b FULL OUTER JOIN dense d
              ON b.query_id = d.query_id AND b.doc_id = d.doc_id
        ),
        topk AS (
            SELECT query_id, doc_id, bm25_rank, cos_rank, rrf_micro, rank
            FROM (
                SELECT *, CAST(ROW_NUMBER() OVER (
                        PARTITION BY query_id
                        ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
                FROM fused
            ) WHERE rank <= {RAG_TOPK}
        )"""
    )


def _rag_oracle() -> str:
    return f"\nWITH {_rag_chain_sql()}\n" + dedent(
        """\
        SELECT t.query_id, t.rank, t.doc_id, t.rrf_micro,
               t.bm25_rank, t.cos_rank, dm.source, dm.lang
        FROM topk t JOIN documents dm ON dm.doc_id = t.doc_id
        """
    )


class RagIndex(NamedTuple):
    """The static half of the retrieval product, built ONCE per corpus and
    reused across query batches (the streaming serving twin materializes
    it once and serves every micro-batch from the same checkpointed
    RDDs): the chunk-granular postings with per-chunk lengths (``tf``),
    the chunk document frequencies (``dfreq``), the corpus constants
    (``g``), the IVF two-nearest-cells table (``ranked``), and the
    serving-dimension metadata (``dim``)."""

    tf: DataFrame
    dfreq: DataFrame
    g: DataFrame
    ranked: DataFrame
    dim: DataFrame


def rag_index(spark: SparkSession, sf_dir: str) -> RagIndex:
    """Build the RAG index: one documents scan feeds the checkpointed
    chunk tf table (4 consumers: corpus stats, chunk-df, probe terms,
    candidates); one embeddings scan feeds the checkpointed IVF cell
    ranking. Chunking is the SHARED doc_chunks geometry."""
    from .similarity import ivf_ranked_cells

    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents")
    chunks = doc_chunks(docs, par=par)
    toks = chunks.select(
        "doc_id", "chunk_id", F.explode(F.split("ctext", " ")).alias("term")
    ).where(F.col("term") != "")
    w_chunk = Window.partitionBy("doc_id", "chunk_id")
    tf = (
        toks.groupBy("doc_id", "chunk_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(w_chunk))
        .localCheckpoint(eager=False)  # consumed 4x: stats, df, probes, cands
    )
    # EVERY member is checkpointed (review r9): a lazy dfreq/g/dim would
    # re-run its corpus-wide aggregation / parquet scan on every serving
    # micro-batch, which is exactly the cost the index exists to pay once
    g = (
        tf.groupBy("doc_id", "chunk_id")
        .agg(F.max("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),  # BM25 "docs" = chunks here
            F.sum("dl").alias("total"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=False)
    )
    return RagIndex(
        tf=tf,
        dfreq=dfreq,
        g=g,
        ranked=ivf_ranked_cells(spark, sf_dir),
        dim=docs.select("doc_id", "source", "lang").localCheckpoint(eager=False),
    )


def rag_index_save(index: RagIndex, path: str, **kw) -> None:
    """Persist the RAG index to ``path`` (one parquet directory per
    member — the index_store layout shared with IvfPqIndex/IngestIndex):
    the build-once/serve-MANY-JOBS half of the retrieval product. A
    nightly corpus job saves postings, document frequencies, corpus
    constants, the IVF cell table and the dim metadata; every serving
    job thereafter loads and runs ``rag_serve`` without re-scanning the
    corpus. At 100 TB the store write would add ``partitionBy("term")``
    on tf/dfreq so probe-term joins prune postings by partition."""
    from .index_store import index_save

    index_save(index, path, **kw)


def rag_index_load(spark: SparkSession, path: str, **kw) -> RagIndex:
    """Load a persisted RAG index from ``path``. Members come back
    checkpointed (store parquet scanned once, corpus parquet never), and
    ``rag_serve`` over the loaded index is HASH-IDENTICAL to serving the
    index it was saved from — pinned, including from a FRESH JVM, by
    tests/test_index_store.py."""
    from .index_store import index_load

    return index_load(spark, path, RagIndex, **kw)


def rag_query_terms(queries: DataFrame) -> DataFrame:
    """``(query_id, term)`` — a query's term set is the distinct terms
    across its chunks under the SHARED doc_chunks geometry; this is what
    the batch lane derives from the corpus tf table for resident probe
    docs, computed here from raw ``(query_id, text)`` rows so a
    streaming micro-batch can tokenize queries it has never indexed."""
    chunks = doc_chunks(
        queries.select(F.col("query_id").alias("doc_id"), "text")
    )
    return (
        chunks.select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split("ctext", " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )


def _bm25_doc_ranks(index: RagIndex, qterms: DataFrame) -> DataFrame:
    """The SPARSE lane: ``(query_id, doc_id, br)`` chunk-BM25 max-pooled
    per-doc ranks (br <= RAG_LANE_K) against the prebuilt index — one
    spelling, consumed by rag_serve's fusion AND (checkpointed) by BOTH
    of x9_rag_eval's fusions: the BM25 lane is exact already, so
    production and ground truth share it verbatim."""
    from .textual import _BM25_AVGDL_SQL, _BM25_CONTRIB_SQL, _BM25_IDF_SQL

    # r14: the 1-row corpus-constants member (exact longs, checkpointed
    # at build) is collected and attached as literals — identical
    # idf/avgdl IEEE trees, minus a BroadcastNestedLoopJoin + broadcast
    # sub-job per serve call
    grow = index.g.collect()[0]
    pterm = (
        qterms.join(index.dfreq, "term")
        .withColumn("n_docs", F.lit(grow["n_docs"]))
        .withColumn("total", F.lit(grow["total"]))
        .select(
            "query_id",
            "term",
            F.expr(_BM25_IDF_SQL).alias("idf"),
            F.expr(_BM25_AVGDL_SQL).alias("avgdl"),
        )
    )
    cscore = (
        index.tf.join(F.broadcast(pterm), "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id", "chunk_id")
        .agg(F.sum(F.expr(_BM25_CONTRIB_SQL)).alias("score_micro"))
    )
    w_bm = Window.partitionBy("query_id").orderBy(
        F.desc("doc_score"), F.asc("doc_id")
    )
    return (
        cscore.groupBy("query_id", "doc_id")
        .agg(F.max("score_micro").alias("doc_score"))
        .withColumn("br", F.row_number().over(w_bm).cast("long"))
        .where(F.col("br") <= RAG_LANE_K)
        .select("query_id", "doc_id", "br")
    )


def _ivf_dense_ranks(index: RagIndex, qids: DataFrame) -> DataFrame:
    """The production DENSE lane: ``(query_id, doc_id, cr)`` IVF nprobe=2
    exact-rerank cosine ranks (cr <= RAG_LANE_K). Probe cells are looked
    up by query id (the encoder seam — query vectors resolve from the
    embedding store). This is the lane x9_rag_eval grades: its ground
    truth swaps in the EXHAUSTIVE cosine ranks over the same checkpointed
    vector table."""
    from .similarity import ivf_rank_from

    probes = (
        index.ranked.where(F.col("rn") <= 2)
        .join(F.broadcast(qids), F.col("vec_id") == F.col("query_id"))
        .select("vec_id", "v", "norm", "cid")
    )
    return ivf_rank_from(index.ranked, probes, RAG_LANE_K).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("cr"),
    )


def _rrf_fuse_topk(bm25: DataFrame, dense: DataFrame) -> DataFrame:
    """Integer reciprocal-rank fusion of a ``(query_id, doc_id, br)``
    sparse lane and a ``(query_id, doc_id, cr)`` dense lane, trimmed to
    the per-query top-RAG_TOPK: ``(query_id, doc_id, bm25_rank, cos_rank,
    rrf_micro, rank)``. One fusion spelling — rag_serve fuses the
    production lanes; x9_rag_eval fuses the SAME bm25 lane with the
    exact dense lane to build its composite ground truth, so the two
    fusions cannot drift."""
    b, d = bm25.alias("b"), dense.alias("d")
    fused = b.join(
        d,
        (F.col("b.query_id") == F.col("d.query_id"))
        & (F.col("b.doc_id") == F.col("d.doc_id")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.query_id"), F.col("d.query_id")).alias("query_id"),
        F.coalesce(F.col("b.doc_id"), F.col("d.doc_id")).alias("doc_id"),
        F.coalesce(F.col("br"), F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce(F.col("cr"), F.lit(0)).cast("long").alias("cos_rank"),
        (
            F.when(
                F.col("br").isNull(), F.lit(0).cast("long")
            ).otherwise(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + br)"))
            + F.when(
                F.col("cr").isNull(), F.lit(0).cast("long")
            ).otherwise(F.expr(f"{RRF_SCALE} DIV ({RRF_K} + cr)"))
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    w_fuse = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_fuse).cast("long"))
        .where(F.col("rank") <= RAG_TOPK)
    )


def rag_serve(index: RagIndex, qids: DataFrame, qterms: DataFrame) -> DataFrame:
    """Serve a query batch against the prebuilt index: chunk-BM25
    max-pooled per doc (_bm25_doc_ranks) + IVF multiprobe exact rerank
    (_ivf_dense_ranks), fused by integer RRF (_rrf_fuse_topk),
    top-RAG_TOPK (5) joined to the serving dimension. ``qids`` is a
    one-column ``(query_id)`` frame (bounded — it broadcasts); ``qterms``
    the matching ``(query_id, term)`` set. Shared verbatim by the batch
    x9_rag_pipeline lane and the streaming serving twin; x9_rag_eval
    grades the same lane helpers, so detect and evaluate cannot drift.

    Query ids SHARE the document-id namespace: the more-like-this
    self-exclusions (a doc never retrieves itself — the BM25 candidate
    filter inside _bm25_doc_ranks and the vec_id exclusion inside
    ivf_rank_from) mean a query whose id collides with a corpus doc
    SHADOWS that doc out of its own results. Resident probes (the batch
    lane, and benchmark replays of it) rely on exactly this; external
    queries must use ids OUTSIDE the corpus doc-id range."""
    topk = _rrf_fuse_topk(
        _bm25_doc_ranks(index, qterms), _ivf_dense_ranks(index, qids)
    )
    # serving join — the bounded top-k side broadcasts (J1 shape)
    return F.broadcast(topk).join(index.dim, "doc_id").select(
        "query_id",
        "rank",
        "doc_id",
        "rrf_micro",
        "bm25_rank",
        "cos_rank",
        "source",
        "lang",
    )


@query(
    "x9_rag_pipeline",
    oracle=_rag_oracle(),
    tags=("X9", "X3", "X4", "pipeline", "search"),
)
def x9_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed retrieval product, end to end in one dataflow — the
    x1_fuzzy_dedup_pipeline of the search family. Five stages, each an
    already-oracled lane, composed without extra scans:

    1. CHUNK (the SHARED doc_chunks geometry): CHUNK_W-char (200)
       windows every CHUNK_S (150) chars.
    2. SPARSE RETRIEVAL: Okapi BM25 at CHUNK granularity (shared
       idf/avgdl/contribution SQL with x4_bm25_search; a chunk plays the
       role of a BM25 document, hence the n_docs/dl column names), then
       MAX-pooled per document — the standard long-document trick: a doc
       ranks by its best-matching passage, which whole-doc BM25 dilutes.
       Query q's terms are the distinct terms across its own chunks
       (derived from the resident tf table here; a streaming micro-batch
       derives the identical set from raw text via rag_query_terms).
    3. DENSE RETRIEVAL: IVF nprobe=2 shortlist + exact rounded-cosine
       ranking over the document embeddings (ivf_ranked_cells +
       ivf_rank_from, the x3_ivf_multiprobe core, lane depth
       K=RAG_LANE_K, 10).
    4. FUSION: reciprocal-rank fusion of the two lanes,
       rrf = RRF_SCALE DIV (RRF_K + rank) summed over lanes (1e6 and
       60) — integer
       division on integer ranks, so the fused score is EXACT (no float
       accumulation reaches the hash; the fixed-point discipline), with
       absent-lane ranks emitted as 0.
    5. SERVING JOIN (J1 shape): the per-query top-RAG_TOPK table —
       bounded at queries x 5 rows — broadcasts against the
       document metadata table, so the dim side never shuffles (the
       batch analog of the stream-static lookup join; the streaming twin
       in streaming/serving.py serves micro-batches of queries against
       the SAME prebuilt RagIndex through the SAME rag_serve dataflow).

    Scale shape: the chunk tf table is built from ONE documents scan and
    checkpointed (4 consumers: corpus stats, chunk-df, probe terms,
    candidates); probe terms ride a bounded broadcast so candidate
    generation never shuffles the corpus postings for the join; each
    lane's top-k is a keyed window (WindowGroupLimit pre-trim); fusion
    joins two <= queries x {RAG_LANE_K} rank lists. At 100 TB the only
    corpus-sized exchanges are the tf aggregation, the per-chunk dl
    window, and the per-(query, chunk) score aggregation — everything
    downstream is bounded by the query batch."""
    index = rag_index(spark, sf_dir)
    return rag_serve(index, *_resident_probe_queries(spark, index))


# nDCG@RAG_TOPK position discounts, micro-scaled: floor(1e6 / log2(i+1)).
# Computed ONCE in Python and baked as the SAME integer literals into the
# Spark expression and the DuckDB oracle — no transcendental is ever
# evaluated engine-side, so the metric stays exact-integer cross-engine.
_NDCG_DISC_MICRO = [
    int(1_000_000 / math.log2(i + 1)) for i in range(1, RAG_TOPK + 1)
]
# IDCG is a COMPILE-TIME constant (review r11): the truth list always has
# exactly RAG_TOPK rows per query (the exhaustive dense lane alone fuses
# RAG_LANE_K >= RAG_TOPK docs for every probe on any corpus with more than
# RAG_LANE_K vectors) with rel = RAG_TOPK+1-rank, so the ideal DCG is the
# same literal for every query — no engine-side aggregation/join needed.
_NDCG_IDCG_MICRO = sum(
    (RAG_TOPK + 1 - i) * _NDCG_DISC_MICRO[i - 1] for i in range(1, RAG_TOPK + 1)
)


def _resident_probe_queries(
    spark: SparkSession, index: RagIndex
) -> tuple[DataFrame, DataFrame]:
    """The resident probe set ``(qids, qterms)`` — query ids 0..RAG_PROBES
    and their term sets derived from the corpus tf table. ONE spelling
    shared by x9_rag_pipeline and x9_rag_eval (review r11: a drifting
    copy would silently make detect and evaluate grade different query
    sets)."""
    qids = spark.range(RAG_PROBES).select(F.col("id").alias("query_id"))
    qterms = (
        index.tf.where(F.col("doc_id") < RAG_PROBES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    return qids, qterms


def _rag_eval_oracle() -> str:
    disc = ", ".join(str(d) for d in _NDCG_DISC_MICRO)
    return f"\nWITH {_rag_chain_sql()},\n" + dedent(
        f"""\
        exact_scored AS MATERIALIZED (
            SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
                   ROUND(LIST_DOT_PRODUCT(a.v, b.v)
                         / (SQRT(LIST_DOT_PRODUCT(a.v, a.v))
                            * SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 6) AS cosine
            FROM e a JOIN e b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < {RAG_PROBES}
        ),
        dense_x AS (
            SELECT query_id, doc_id, cr FROM (
                SELECT query_id, doc_id,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, doc_id) AS BIGINT) AS cr
                FROM exact_scored
            ) WHERE cr <= {RAG_LANE_K}
        ),
        fused_x AS (
            SELECT COALESCE(b.query_id, d.query_id) AS query_id,
                   COALESCE(b.doc_id, d.doc_id) AS doc_id,
                   CAST(CASE WHEN b.br IS NULL THEN 0
                             ELSE {RRF_SCALE} // ({RRF_K} + b.br) END
                      + CASE WHEN d.cr IS NULL THEN 0
                             ELSE {RRF_SCALE} // ({RRF_K} + d.cr) END
                        AS BIGINT) AS rrf_micro
            FROM bm25 b FULL OUTER JOIN dense_x d
              ON b.query_id = d.query_id AND b.doc_id = d.doc_id
        ),
        truth AS MATERIALIZED (
            SELECT query_id, doc_id, rank,
                   CAST({RAG_TOPK} + 1 - rank AS BIGINT) AS rel
            FROM (
                SELECT *, CAST(ROW_NUMBER() OVER (
                        PARTITION BY query_id
                        ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
                FROM fused_x
            ) WHERE rank <= {RAG_TOPK}
        ),
        pos AS (
            SELECT p.query_id, COALESCE(t.rel, 0) AS rel, p.rank
            FROM topk p LEFT JOIN truth t
              ON t.query_id = p.query_id AND t.doc_id = p.doc_id
        ),
        per_q AS (
            SELECT query_id,
                   CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hits,
                   CAST(SUM(rel * ([{disc}])[rank]) AS BIGINT) AS dcg_micro
            FROM pos GROUP BY 1
        )
        SELECT query_id, n_hits,
               1000000 * n_hits // {RAG_TOPK} AS recall_micro,
               1000000 * dcg_micro // {_NDCG_IDCG_MICRO} AS ndcg_micro
        FROM per_q
        """
    )


@query(
    "x9_rag_eval",
    oracle=_rag_eval_oracle(),
    tags=("X9", "X3", "X4", "eval", "search"),
)
def x9_rag_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — the detect -> evaluate pair for the
    RAG family (closing the pattern: dedup has x2_dedup_eval, ANN has
    x3_ann_eval, community detection has x10_modularity): per query,
    recall@RAG_TOPK and nDCG@RAG_TOPK of the PRODUCTION fused list
    (chunk-BM25 + IVF nprobe=2, RRF — the exact lanes rag_serve runs,
    via the same _bm25_doc_ranks/_ivf_dense_ranks/_rrf_fuse_topk
    helpers) against the EXACT COMPOSITE ground truth: the same BM25
    lane (already exact — it is shared verbatim, checkpointed once,
    feeding BOTH fusions) fused with the EXHAUSTIVE brute-force cosine
    ranks over all vectors (the x3_cosine_topk spelling), so the only
    approximation being measured is the IVF shortlist.

    Integer discipline: truth relevance is graded by truth rank
    (rel = RAG_TOPK + 1 - rank, linear gains 5..1); position discounts
    are the PRECOMPUTED integer table _NDCG_DISC_MICRO
    (floor(1e6/log2(i+1)) — the same Python-computed literals in both
    engines, so no transcendental is evaluated engine-side); dcg/idcg
    are exact integer sums and recall_micro / ndcg_micro integer
    division — no float reaches the hash. IDCG is the compile-time
    constant _NDCG_IDCG_MICRO (the truth list always carries exactly
    RAG_TOPK rows with rel = RAG_TOPK+1-rank, so the ideal DCG never
    varies — review r11 removed the redundant engine-side aggregation).

    Scale shape: the ground-truth dense lane is ONE pass of the
    broadcast probe set over the checkpointed vector table (no
    corpus-side re-scan — everything downstream of rag_index reads
    checkpoints); every other frame is bounded by queries x RAG_LANE_K.
    On a 100 TB corpus this evaluation runs per index build (the
    estimator pattern), while the lanes it grades serve every query
    batch. Operating point on this corpus: non-vacuous — at sf0.01
    query 2 takes a real IVF nprobe=2 miss (recall 800000, nDCG
    962338); the other probes sit at 1.0, which is what a 2-of-8-cell
    probe over well-separated synthetic clusters SHOULD score."""
    from .similarity import dot

    index = rag_index(spark, sf_dir)
    qids, qterms = _resident_probe_queries(spark, index)
    # the sparse lane is EXACT already — one spelling, one checkpoint,
    # consumed by both the production and the ground-truth fusion
    b = _bm25_doc_ranks(index, qterms).localCheckpoint(eager=False)
    prod = _rrf_fuse_topk(b, _ivf_dense_ranks(index, qids)).select(
        "query_id", "doc_id", "rank"
    )
    ev = index.ranked.where(F.col("rn") == 1).select("vec_id", "v", "norm")
    probes = ev.where(F.col("vec_id") < RAG_PROBES)
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    exact_scored = (
        F.broadcast(probes.alias("a"))
        .join(ev.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("doc_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w_x = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    d_exact = (
        exact_scored.withColumn("cr", F.row_number().over(w_x).cast("long"))
        .where(F.col("cr") <= RAG_LANE_K)
        .select("query_id", "doc_id", "cr")
    )
    # single consumer (the hit join — IDCG is the compile-time constant
    # _NDCG_IDCG_MICRO), so no checkpoint: the exact lane's bounded BNLJ
    # rides the emit plan (asserted, the x3_ann_eval precedent)
    truth = _rrf_fuse_topk(b, d_exact).select(
        "query_id",
        "doc_id",
        "rank",
        (F.lit(RAG_TOPK + 1) - F.col("rank")).cast("long").alias("rel"),
    )
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC_MICRO])
    p, t = prod.alias("p"), truth.alias("t")
    pos = p.join(
        t,
        (F.col("p.query_id") == F.col("t.query_id"))
        & (F.col("p.doc_id") == F.col("t.doc_id")),
        "left",
    ).select(
        F.col("p.query_id").alias("query_id"),
        F.coalesce(F.col("t.rel"), F.lit(0)).alias("rel"),
        F.col("p.rank").alias("rank"),
    )
    per_q = pos.groupBy("query_id").agg(
        F.sum((F.col("rel") > 0).cast("long")).alias("n_hits"),
        F.sum(F.col("rel") * F.element_at(disc, F.col("rank").cast("int"))).alias(
            "dcg_micro"
        ),
    )
    return per_q.select(
        "query_id",
        "n_hits",
        F.expr(f"1000000 * n_hits DIV {RAG_TOPK}").alias("recall_micro"),
        F.expr(f"1000000 * dcg_micro DIV {_NDCG_IDCG_MICRO}").alias("ndcg_micro"),
    )


# --- the corpus-build flagship: gate -> dedup -> decontaminate -> mix ->
# --- pack -> shard, as ONE dataflow --------------------------------------

# The packing/shard knobs are the SAME constants the standalone lanes use
# (analytics.py) — editing one cannot desynchronize the factory from
# x9_doc_packing / x9_shard_manifest (review r10).
# No cycle: analytics/dedup/textual never import curation.
from .analytics import MANIFEST_SHARDS, PACK_BIN_TOKENS  # noqa: E402

# The near-dup CTE chain, the 5-gram geometry, and the holdout modulus
# are the SAME spellings the standalone x1_fuzzy_dedup_pipeline /
# x4_decontaminate oracles use.
from .dedup import neardup_chain_sql  # noqa: E402
from .textual import BENCH_HOLDOUT_MOD, five_gram_rows, gram5_cte_sql  # noqa: E402

_FACTORY_ORACLE = dedent(
    f"""
    WITH RECURSIVE
    scored AS MATERIALIZED (
        SELECT doc_id, source, lang, text, n_chars,
               {QUALITY_FEATURES_SQL}
        FROM documents
    ),
    survivors AS MATERIALIZED (
        SELECT doc_id, source, lang, text, n_chars, n_tokens
        FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY MD5(text)) AS canon_exact
            FROM scored WHERE {QUALITY_LOGIT_SQL} >= 0
        ) WHERE doc_id = canon_exact
    ),
    {neardup_chain_sql('survivors')},
    dedup_kept AS MATERIALIZED (
        SELECT s.doc_id, s.source, s.lang, s.text, s.n_tokens
        FROM survivors s JOIN best b ON b.doc_id = s.doc_id AND b.rk = 1
    ),
    ktoks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM dedup_kept
        WHERE doc_id % {BENCH_HOLDOUT_MOD} <> 0
    ),
    btoks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM scored
        WHERE doc_id % {BENCH_HOLDOUT_MOD} = 0
    ),
    kgrams AS (
        {gram5_cte_sql('ktoks')}
    ),
    bgrams AS MATERIALIZED (
        {gram5_cte_sql('btoks')}
    ),
    contaminated AS MATERIALIZED (
        SELECT DISTINCT k.doc_id FROM kgrams k JOIN bgrams b ON b.g = k.g
    ),
    clean AS MATERIALIZED (
        SELECT d.* FROM dedup_kept d
        LEFT JOIN contaminated c ON c.doc_id = d.doc_id
        WHERE d.doc_id % {BENCH_HOLDOUT_MOD} <> 0 AND c.doc_id IS NULL
    ),
    {dsir_logw_chain_sql('clean')},
    {mix_weighted_sql('clean')},
    quota AS MATERIALIZED (
        SELECT source,
               CAST(FLOOR(ROUND({_MIX_RATE_SQL}, 6) * n_docs + 0.5) AS BIGINT) AS n_sel
        FROM weighted
    ),
    ranked AS MATERIALIZED (
        SELECT c.doc_id, c.source, c.lang, c.text,
               CAST(c.n_tokens AS BIGINT) AS n_tokens,
               ROUND(w.logw, 6) AS logw,
               CAST(ROW_NUMBER() OVER (PARTITION BY c.source
                    ORDER BY ROUND(w.logw, 6) DESC, c.doc_id) AS BIGINT) AS src_rank
        FROM clean c JOIN doc_w w ON w.doc_id = c.doc_id
    ),
    sel AS MATERIALIZED (
        SELECT r.* FROM ranked r JOIN quota q ON q.source = r.source
        WHERE r.src_rank <= q.n_sel
    )
    SELECT doc_id, source, lang, n_tokens, logw, src_rank,
           CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tokens) // {PACK_BIN_TOKENS} AS INTEGER) AS bin,
           CAST(CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % {MANIFEST_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY CAST('0x' || SUBSTR(MD5(text), 1, 8) AS BIGINT) % {MANIFEST_SHARDS}
                ORDER BY MD5(text), doc_id) AS BIGINT) AS pos
    FROM sel
    """
)


def factory_base(docs: DataFrame) -> DataFrame:
    """The factory's ONE projection of the raw corpus: ``(doc_id, source,
    lang, text, n_chars, n_tokens, logit_milli)`` — exact-integer token
    count and quality logit computed once. One spelling shared by the
    batch factory (which checkpoints it as THE one documents scan) and
    the continuous-factory composition (which joins stream-admitted ids
    back to it — the admitted sink stores ids, the corpus store the
    docs)."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
        quality_logit_col(toks, F.col("n_chars")).cast("long").alias("logit_milli"),
    )


def bench_gram_index(base: DataFrame) -> DataFrame:
    """The held-out benchmark's distinct 5-gram index over the RAW corpus
    (doc_id % BENCH_HOLDOUT_MOD == 0, pre-gate — contamination is defined
    against the benchmark as published, not as gated). Bounded (benchmarks
    don't grow with the corpus), so consumers broadcast it; a continuous
    deployment builds it once and serves every micro-batch / periodic job
    from the same artifact."""
    return (
        five_gram_rows(base.where(F.col("doc_id") % BENCH_HOLDOUT_MOD == 0))
        .select("g")
        .distinct()
    )


def decontaminate_selected(kept: DataFrame, bench_g: DataFrame) -> DataFrame:
    """Factory stage 3, ONE spelling: drop the held-out ids themselves,
    then every survivor sharing ANY 5-gram with the benchmark index
    (broadcast anti-join through a distinct contaminated-id set)."""
    kept_nb = kept.where(F.col("doc_id") % BENCH_HOLDOUT_MOD != 0)
    contaminated = (
        five_gram_rows(kept_nb).join(F.broadcast(bench_g), "g").select("doc_id").distinct()
    )
    return kept_nb.join(contaminated, "doc_id", "left_anti")


def manifest_build(clean: DataFrame) -> DataFrame:
    """Factory stages 4-6 — the PERIODIC BATCH MANIFEST JOB, one spelling
    shared by the batch x9_data_factory and the continuous-factory
    composition (streamed stages 1-3 feed the accumulated clean corpus
    here). These stages are batch by construction: DSIR bucket models,
    temperature-mix quotas, packing bins and shard positions are global
    functions of the WHOLE selected corpus. ``clean`` needs the
    factory_base columns; it is checkpointed here (3 consumers: DSIR
    tokens, the mix aggregate, the ranked join)."""
    from .analytics import _md5_bucket

    clean = clean.localCheckpoint(eager=False)
    doc_w = dsir_doc_logw(clean)
    per_source = clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    _, rate = mix_rate_cols(F.col("n_tokens"))
    quota = per_source.select(
        "source",
        F.floor(F.round(rate, 6) * F.col("n_docs") + F.lit(0.5))
        .cast("long")
        .alias("n_sel"),
    )
    ranked = clean.join(
        doc_w.select("doc_id", F.round("logw", 6).alias("logw")), "doc_id"
    ).select(
        "doc_id",
        "source",
        "lang",
        "text",
        "n_tokens",
        "logw",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.desc("logw"), F.asc("doc_id")))
        .cast("long")
        .alias("src_rank"),
    )
    sel = ranked.join(F.broadcast(quota), "source").where(
        F.col("src_rank") <= F.col("n_sel")
    )
    w_pack = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    binned = sel.withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / PACK_BIN_TOKENS
        ).cast("int"),
    )
    shard = _md5_bucket("text", MANIFEST_SHARDS).cast("int")
    pos = F.row_number().over(
        Window.partitionBy(shard).orderBy(F.md5("text"), F.col("doc_id"))
    )
    return binned.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        "logw",
        "src_rank",
        "bin",
        shard.alias("shard"),
        pos.cast("long").alias("pos"),
    )


@query(
    "x9_data_factory",
    oracle=_FACTORY_ORACLE,
    tags=("X9", "X1", "X2", "X4", "pipeline", "factory"),
)
def x9_data_factory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data factory end to end in ONE dataflow — the
    corpus-build answer to x9_rag_pipeline (reference dl_k_to_ss.py:71-357
    chains its stages the same way). Six stages, every one an
    already-oracled lane, composed over ONE parquet scan of ``documents``:

    1. QUALITY GATE: keep docs the broadcast quality model passes
       (quality_logit_col — the x4_quality_model_score head, logit >= 0,
       all-integer Catalyst arithmetic).
    2. FUZZY DEDUP (the x1_fuzzy_dedup_pipeline stages): exact
       content-hash dedup (min doc_id per md5(text) window), then
       banded-MinHash candidates verified with exact Jaccard >= 0.5
       (_minhash_verified_pairs — equi joins, never all-pairs), connected
       components (_min_label_propagation), keep the longest doc per
       cluster (tie: min doc_id).
    3. DECONTAMINATE (the x4_decontaminate geometry, five_gram_rows):
       the held-out benchmark set is doc_id % BENCH_HOLDOUT_MOD == 0 of
       the RAW corpus; survivors sharing ANY 5-gram with it (or in it)
       are dropped. The bench gram index is bounded (benchmarks don't
       grow with the corpus), so it broadcasts.
    4. DSIR x TEMPERATURE MIX: per-doc hashed-unigram log importance
       weights (dsir_doc_logw — 256-row bucket models, constant state at
       any corpus size) rank survivors WITHIN each source; the per-source
       quota comes from the temperature sampling rate (mix_rate_cols,
       tokens^MIX_ALPHA against the MIX_BUDGET token budget) times the
       source's doc count — importance-ranked selection under the mix's
       quota, i.e. DSIR chooses WHICH docs, the mix chooses HOW MANY.
    5. PACK (the x9_doc_packing rule): selected docs stream into
       PACK_BIN_TOKENS-token context bins per source in doc_id order
       (bin = tokens-before-me // budget — a window cumsum, no
       sequential loop).
    6. SHARD (the x9_shard_manifest rule): content-addressed (shard,
       pos) addresses — shard = md5-bucket of text, pos = hash order
       within the shard — so the epoch order is a property of the
       CORPUS, not of partition layout or a seed.

    Output: the per-document manifest ``(doc_id, source, lang, n_tokens,
    logw, src_rank, bin, shard, pos)`` a pretraining loader consumes.

    Streaming split: stages 1-3 are the factory's FRONT-END and run on
    an ingest stream today — the quality gate as the stateless
    score_documents transform, dedup admission via the GROWING
    IngestIndex (ingest_admit_fold, streaming/ingest.py), benchmark
    decontamination against the broadcast bench_gram_index. Stages 4-6
    are BATCH BY CONSTRUCTION: DSIR models, mix quotas, packing bins and
    shard positions are global functions of the whole selected corpus (a
    per-batch version would emit different manifests per arrival split),
    so a deployment runs them as the periodic manifest_build job over
    the stream-admitted corpus. PROVED END TO END:
    tests/test_streaming.py::test_continuous_factory_equals_batch_factory
    pins streamed-1-3 + periodic-4-6 == this query exactly — including a
    mid-stream restart recovered from the admitted sink — under the
    keeper-order replay (the seeding/backfill scenario; admission keeps
    first-arrival, this factory keeps best-per-cluster, and that test
    documents + asserts the preconditions under which they coincide).
    The composed gate->admit foreachBatch is separately pinned
    stream==batch in
    tests/test_streaming.py::test_streaming_gated_ingest_composition.

    Scale shape: ``documents`` is scanned ONCE into a projected
    checkpoint; every stage consumes checkpoints (asserted PLANS entry:
    emit plan re-scans zero parquet). Stages 1-2 shuffle hashes/ids, the
    shingle joins are banded (the 100 TB-safe LSH shape), the bench gram
    join broadcasts a fixed-size index, DSIR models are 256-row
    broadcasts, quota is an n_sources-row broadcast, and packing/sharding
    are two keyed windows over the SELECTED set (bounded by the token
    budget). No Python anywhere — the whole factory is Catalyst
    expressions over exact integers, so the manifest is reproducible
    cross-engine (full DuckDB oracle at sf0.01 and sf0.1)."""
    docs = table(spark, sf_dir, "documents")
    base = factory_base(docs).localCheckpoint(
        eager=False
    )  # THE one documents scan (2 consumers)
    return manifest_build(factory_clean(base))


def factory_clean(base: DataFrame) -> DataFrame:
    """Factory stages 1-3 over a ``factory_base`` frame: quality gate ->
    exact dedup -> keep-best near-dup clusters -> benchmark
    decontamination, emitting the ``clean`` selected corpus
    ``manifest_build`` consumes. ONE spelling shared by the registered
    ``x9_data_factory`` (base = the parquet table's projection) and the
    compaction-reconciliation pin (base = the STREAM-FILLED corpus store
    — tests/test_streaming.py::test_compaction_reconciles_arbitrary_order
    rebuilds the gold corpus from what the stream retained, arrival order
    free). The keep-best stage is the shared ``keep_best_map`` (also the
    x1_ingest_compaction rule — detect and compact cannot drift)."""
    from .dedup import keep_best_map, with_exact_canon

    # stage 1+2a: quality gate, then exact dedup among the survivors
    # (the shared with_exact_canon spelling — one exact-canon rule with
    # the compaction lane)
    good = base.where(F.col("logit_milli") >= 0)
    survivors = (
        with_exact_canon(good, "canon_exact")
        .where(F.col("doc_id") == F.col("canon_exact"))
        .select("doc_id", "source", "lang", "text", "n_chars", "n_tokens")
        .localCheckpoint(eager=False)  # 3 consumers: shingles, labels, keep
    )

    # stage 2b: near-dup clusters over the survivors, keep-best per
    # cluster (the shared keep_best_map; keep_id == doc_id are keepers)
    keep_ids = (
        keep_best_map(survivors)
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id")
    )
    dedup_kept = survivors.join(keep_ids, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )  # 2 consumers: corpus grams + the clean anti-join base

    # stage 3: decontamination against the held-out benchmark set
    return decontaminate_selected(dedup_kept, bench_gram_index(base))
