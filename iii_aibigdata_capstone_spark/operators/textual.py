"""Text analysis over the documents table (SURVEY.md §2.12 X4): token
statistics, quality scoring, language-ID heuristic, fingerprinting,
regex-based token counting.

Everything here is pure Catalyst expression work (split / higher-order
functions / regexp) — the whole module runs inside whole-stage codegen with
zero Python, which is the point: text analytics at corpus scale must not
row-trip through UDFs.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

STOPWORDS = ("the", "a", "value", "data")


@query(
    "x4_text_stats",
    oracle=dedent(
        f"""
        WITH t AS (
            SELECT lang, n_chars, STRING_SPLIT(text, ' ') AS toks FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               ROUND(AVG(LEN(toks)), 2) AS avg_tokens,
               CAST(SUM(LEN(LIST_FILTER(toks, x -> x IN {STOPWORDS!r})) ) AS BIGINT) AS stop_tokens,
               ROUND(SUM(LEN(LIST_FILTER(toks, x -> x IN {STOPWORDS!r})) ) * 1.0
                     / SUM(LEN(toks)), 6) AS stop_ratio
        FROM t GROUP BY lang
        """
    ),
    tags=("X4",),
)
def x4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per language: doc counts, average length in
    chars and tokens, stopword counts/ratio. Token ops via ``filter`` /
    ``size`` higher-order functions, aggregated in one pass.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    d = docs.select("lang", "n_chars", F.size(toks).alias("n_toks"), stop.alias("n_stop"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg("n_toks"), 2).alias("avg_tokens"),
        F.sum("n_stop").alias("stop_tokens"),
        F.round(F.sum("n_stop") / F.sum("n_toks"), 6).alias("stop_ratio"),
    )


@query(
    "x4_quality_score",
    oracle=dedent(
        """
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks, n_chars FROM documents
        )
        SELECT doc_id,
               LEN(toks) AS n_tokens,
               ROUND(LEN(LIST_DISTINCT(toks)) * 1.0 / LEN(toks), 6) AS uniq_ratio,
               ROUND((n_chars - LEN(toks) + 1) * 1.0 / LEN(toks), 6) AS avg_token_len,
               CASE WHEN LEN(toks) BETWEEN 20 AND 200
                         AND LEN(LIST_DISTINCT(toks)) * 1.0 / LEN(toks) >= 0.3
                    THEN 'good' ELSE 'bad' END AS quality
        FROM t
        """
    ),
    tags=("X4",),
)
def x4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality scoring — length band + lexical
    diversity (unique-token ratio), the standard cheap pre-filter of an
    LLM data pipeline. All expression-level; one scan, no shuffle.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tokens
    avg_token_len = (F.col("n_chars") - n_tokens + 1) / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.when(n_tokens.between(20, 200) & (uniq_ratio >= 0.3), "good")
        .otherwise("bad")
        .alias("quality"),
    )


@query(
    "x4_lang_id_confusion",
    oracle=dedent(
        """
        WITH scored AS (
            SELECT lang,
                   CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                             x -> x IN ('the', 'a'))) * 1.0
                             / LEN(STRING_SPLIT(text, ' ')) >= 0.05
                        THEN 'en' ELSE 'other' END AS predicted
            FROM documents
        )
        SELECT lang, predicted, COUNT(*) AS n
        FROM scored GROUP BY lang, predicted
        """
    ),
    tags=("X4",),
)
def x4_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID (stopword-density detector) evaluated
    as a confusion matrix against the labeled ``lang`` column."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    density = F.size(F.filter(toks, lambda x: x.isin("the", "a"))) / F.size(toks)
    predicted = F.when(density >= 0.05, "en").otherwise("other")
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "x4_fingerprint",
    oracle=dedent(
        """
        SELECT doc_id,
               MD5(text) AS fingerprint,
               SUBSTR(MD5(text), 1, 8) AS bucket,
               STRLEN(text) AS n_bytes
        FROM documents
        """
    ),
    tags=("X4", "X1"),
)
def x4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full 128-bit content hash plus a 32-bit
    prefix bucket (the shard key you'd partition a 100 TB dedup by)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fingerprint"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("bucket"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


@query(
    "x4_rolling_fingerprint",
    oracle=dedent(
        """
        WITH ascii_docs AS (
            SELECT doc_id, REGEXP_REPLACE(text, '[^ -~]', '', 'g') AS t
            FROM documents WHERE doc_id % 10 = 0
        ),
        hashes AS (
            SELECT doc_id,
                   UNNEST(RANGE(1, LEN(t) - 8 + 2)) AS pos,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 8 + 2),
                       i -> LIST_REDUCE(
                                LIST_TRANSFORM(RANGE(0, 8), j -> ORD(SUBSTR(t, (i + j)::INT, 1))::BIGINT),
                                (acc, c) -> (acc * 257 + c) % 1000000007)))
                       AS h
            FROM ascii_docs WHERE LEN(t) >= 8
        )
        SELECT doc_id, pos // 16 AS win, MIN(h) AS fp
        FROM hashes GROUP BY doc_id, pos // 16
        """
    ),
    tags=("X4", "X2"),
)
def x4_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints: polynomial hash (base
    257 mod 1e9+7, Horner fold) of every 8-char gram, minimum per 16-gram
    window — the near-dup shard key MOSS-style winnowing produces. Pure
    Catalyst (nested higher-order functions, no UDF); non-ASCII stripped
    first so Spark `ascii` and DuckDB `ord` agree."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    k, base, mod, win = 8, 257, 1_000_000_007, 16
    t = F.regexp_replace(F.col("text"), "[^ -~]", "")
    prepped = docs.select("doc_id", t.alias("t")).where(F.length("t") >= k)
    # data-dependent substring starts read best in SQL higher-order form
    prepped.createOrReplaceTempView("_winnow_docs")
    return spark.sql(
        f"""
        WITH hashes AS (
            SELECT doc_id,
                   posexplode(transform(sequence(1, length(t) - {k} + 1),
                       i -> aggregate(sequence(0, {k - 1}), CAST(0 AS BIGINT),
                                      (acc, j) -> (acc * {base} + ascii(substring(t, i + j, 1))) % {mod})))
                       AS (pos0, h)
            FROM _winnow_docs
        )
        SELECT doc_id, CAST(floor((pos0 + 1) / {win}) AS BIGINT) AS win, MIN(h) AS fp
        FROM hashes GROUP BY doc_id, floor((pos0 + 1) / {win})
        """
    )


@query(
    "x4_token_count_regex",
    oracle=dedent(
        """
        SELECT doc_id,
               LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS n_word_tokens,
               LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[a-z]+'))) AS n_unique_tokens
        FROM documents
        """
    ),
    tags=("X4",),
)
def x4_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-based token counting (BPE-ish pre-tokenizer shape: maximal
    alphabetic runs), total and distinct per document."""
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_word_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


@query(
    "x4_tfidf_top_terms",
    oracle=dedent(
        """
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
            FROM documents WHERE doc_id % 20 = 0
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE LENGTH(term) >= 3 GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf.tf * (LN((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rn
            FROM scored
        ) WHERE rn <= 3
        """
    ),
    tags=("X4",),
)
def x4_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, exact and relational (SURVEY §2.12 X4's HashingTF+IDF row,
    minus the hashing trick so it keeps a value oracle): smoothed idf
    ln((N+1)/(df+1))+1 (the MLlib/sklearn formula), top-3 terms per
    document by score. At vocabulary scales where the exact df table is
    too wide, swap the term key for HashingTF's bucket — same plan shape,
    fixed-width keys."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.length("term") >= 3)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    tfidf = F.round(
        F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
    )
    scored = tf.join(df, "term").select("doc_id", "term", tfidf.alias("tfidf"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "x4_bigram_topk",
    oracle=dedent(
        """
        WITH toks AS (
            SELECT lang, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT lang,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS gram
            FROM toks WHERE LEN(t) >= 2
        ),
        counted AS (
            SELECT lang, gram, COUNT(*) AS n FROM grams GROUP BY 1, 2
        )
        SELECT lang, gram, n FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY n DESC, gram) AS rn
            FROM counted
        ) WHERE rn <= 5
        """
    ),
    tags=("X4", "ngram"),
)
def x4_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram language-model statistics: top-5 bigrams per language
    by frequency (deterministic gram tiebreak) — the building block of
    n-gram LM pretraining filters and contamination checks.

    Plan: explode bigrams map-side, one partial-aggregated count shuffle on
    (lang, gram), then a per-lang top-k window. Spark rewrites the rank
    filter to WindowGroupLimit, so only each partition's top rows reach the
    final sort — no full per-lang sort materializes.
    """
    docs = table(spark, sf_dir, "documents")
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    counted = (
        docs.select("lang", F.split(F.col("text"), " ").alias("t"))
        .where(F.size(t) >= 2)
        .select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "gram", "n")
    )


@query(
    "x4_repetition_filter",
    oracle=dedent(
        """
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        words AS (
            SELECT doc_id, LEN(t) AS n_words,
                   LEN(LIST_DISTINCT(t)) AS n_distinct
            FROM toks
        ),
        grams AS (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS gram
            FROM toks WHERE LEN(t) >= 2
        ),
        gram_counts AS (
            SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
        ),
        gram_stats AS (
            SELECT doc_id, MAX(c) AS top_gram, SUM(c) AS n_grams
            FROM gram_counts GROUP BY 1
        )
        SELECT w.doc_id,
               ROUND(1.0 - n_distinct * 1.0 / n_words, 6) AS dup_word_frac,
               ROUND(top_gram * 1.0 / n_grams, 6) AS top_bigram_ratio,
               (1.0 - n_distinct * 1.0 / n_words > 0.7
                OR top_gram * 1.0 / n_grams > 0.18) AS flagged
        FROM words w JOIN gram_stats g ON g.doc_id = w.doc_id
        WHERE n_words >= 2
        """
    ),
    tags=("X4", "quality"),
)
def x4_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher/MassiveText repetition
    rules): per document, the duplicate-word fraction and the share of all
    bigrams taken by the single most frequent bigram; docs past either
    threshold are flagged as degenerate (boilerplate/spam loops).

    Both signals come from one tokenization: distinct counting happens on
    the token array map-side (no explode for the word stats), and the
    bigram distribution is a single explode + count + max-per-doc — all
    shuffles keyed on doc_id, so the two signal branches co-partition and
    join without movement.
    """
    docs = table(spark, sf_dir, "documents")
    t = F.col("t")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t")).where(
        F.size(t) >= 2
    )
    words = toks.select(
        "doc_id",
        F.size(t).alias("n_words"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    gram_stats = (
        toks.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_gram"), F.sum("c").alias("n_grams"))
    )
    dup_frac = 1.0 - F.col("n_distinct") / F.col("n_words")
    top_ratio = F.col("top_gram") / F.col("n_grams")
    return (
        words.join(gram_stats, "doc_id")
        .select(
            "doc_id",
            F.round(dup_frac, 6).alias("dup_word_frac"),
            F.round(top_ratio, 6).alias("top_bigram_ratio"),
            ((dup_frac > 0.7) | (top_ratio > 0.18)).alias("flagged"),
        )
    )


BENCH_HOLDOUT_MOD = 97  # doc_id % MOD == 0 is the held-out benchmark set


def gram5_cte_sql(toks_src: str) -> str:
    """Body of the distinct word-5-gram CTE over a ``(doc_id, t)``
    token-array CTE named ``toks_src`` — ONE oracle spelling of the
    decontamination gram geometry, shared by x4_decontaminate and the
    x9_data_factory decontamination stage."""
    return f"""SELECT DISTINCT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 3),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
            FROM {toks_src} WHERE LEN(t) >= 5"""


def five_gram_rows(docs: DataFrame) -> DataFrame:
    """DISTINCT ``(doc_id, g)`` word-5-gram rows of any ``(doc_id, text)``
    frame — the Spark twin of ``gram5_cte_sql`` (one gram geometry for
    every decontamination consumer; x9_data_factory feeds its dedup
    survivors here without re-scanning parquet)."""
    t = F.col("t")
    grams_expr = F.transform(
        F.sequence(F.lit(1), F.size(t) - 4),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + F.lit(k)) for k in range(5)]
        ),
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .where(F.size(t) >= 5)
        .select("doc_id", F.explode(F.array_distinct(grams_expr)).alias("g"))
    )


@query(
    "x4_decontaminate",
    oracle=dedent(
        f"""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        grams AS (
            {gram5_cte_sql('toks')}
        ),
        bench AS (SELECT doc_id, g FROM grams
                  WHERE doc_id % {BENCH_HOLDOUT_MOD} = 0),
        corpus AS (SELECT doc_id, g FROM grams
                   WHERE doc_id % {BENCH_HOLDOUT_MOD} <> 0)
        SELECT c.doc_id,
               COUNT(DISTINCT c.g) AS n_shared_grams,
               COUNT(DISTINCT b.doc_id) AS n_bench_docs
        FROM corpus c JOIN bench b ON b.g = c.g
        GROUP BY 1
        """
    ),
    tags=("X4", "X2", "decontamination"),
)
def x4_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the pretraining-hygiene op): find corpus
    documents sharing any 5-gram with a held-out benchmark set (doc_id %
    BENCH_HOLDOUT_MOD == 0), reporting how many distinct 5-grams leak and how many
    benchmark documents each one touches.

    Scale shape: the benchmark side is tiny by construction, so its
    (hashed) gram index broadcasts and contaminated docs surface in one
    map-side semi-join-shaped pass over the corpus grams — no shuffle of
    the corpus n-gram table. The distinct-gram aggregate is the only
    exchange, keyed on doc_id.
    """
    grams = five_gram_rows(table(spark, sf_dir, "documents"))
    bench = grams.where(F.col("doc_id") % BENCH_HOLDOUT_MOD == 0).select(
        F.col("doc_id").alias("bench_doc"), "g"
    )
    corpus = grams.where(F.col("doc_id") % BENCH_HOLDOUT_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("g")).alias("n_shared_grams"),
            F.count_distinct(F.col("bench_doc")).alias("n_bench_docs"),
        )
    )


@query(
    "x4_postings",
    oracle=dedent(
        """
        WITH pairs AS (
            SELECT DISTINCT t.term, d.doc_id
            FROM documents d, UNNEST(STRING_SPLIT(d.text, ' ')) AS t(term)
            WHERE t.term <> ''
        ),
        ranked AS (
            SELECT term, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rk
            FROM pairs
        )
        SELECT term, COUNT(*) AS df,
               STRING_AGG(CASE WHEN rk <= 10
                               THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY doc_id) AS postings
        FROM ranked
        GROUP BY term
        """
    ),
    tags=("X4", "T2", "postings"),
)
def x4_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with BOUNDED posting lists: per term, the document
    frequency plus the first 10 doc ids. Two skew hazards at 100 TB: a
    collect_set per term buffers ~every doc_id for stopword-like terms,
    and a single row_number window per term funnels a hot term's whole
    posting set through ONE task's sort. So top-10 selection is SALTED:
    rank per (term, doc_id % 64) keeps <= 10 candidates per salt (64
    balanced window partitions per hot term), then a second window over
    the <= 640 survivors per term picks the true top 10 — min-10 is
    mergeable, so salting is lossless. df is a plain partial-aggregating
    count per term sharing the one materialized pairs table; both results
    meet in a vocabulary-sized join. The document text itself never
    shuffles — only (term, doc_id) pairs."""
    docs = table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
        .localCheckpoint(eager=False)  # consumed twice: df + salted top-k
    )
    df_tbl = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    r1 = F.row_number().over(
        Window.partitionBy("term", F.pmod("doc_id", F.lit(64))).orderBy("doc_id")
    )
    r2 = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    top = (
        pairs.withColumn("r1", r1)
        .where(F.col("r1") <= 10)
        .withColumn("r2", r2)
        .where(F.col("r2") <= 10)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings")
        )
    )
    return df_tbl.join(top, "term")


# --- X4: BM25 ranked retrieval (more-like-this search) ----------------------

BM25_PROBES = 5  # probe documents (doc_id < BM25_PROBES are the queries)
BM25_TOPK = 5  # results per probe
# k1 = 1.2, b = 0.75 (the classic Okapi constants), folded into the shared
# text below as 2.2 (= k1+1) and 0.25 (= 1-b). Every constant is CAST to
# DOUBLE explicitly — DuckDB parses bare decimal literals as DECIMAL and
# the arithmetic would diverge from Spark's double tree (the PageRank
# lesson).
_BM25_IDF_SQL = (
    "LN((CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE))"
    " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
)
_BM25_AVGDL_SQL = "CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE)"
# Per-term contribution quantized to exact micro-units: the per-(query,
# doc) score is a SUM over shared terms, and summing raw doubles is
# accumulation-order dependent across engines — so each contribution is
# floored to BIGINT micro-units first and the sum is exact integer
# arithmetic (the x3_pq/x5 fixed-point discipline). LN itself matches
# bit-for-bit cross-engine on this data (the x4_tfidf precedent).
_BM25_CONTRIB_SQL = (
    "CAST(FLOOR(idf * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))"
    " / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)"
    " * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)"
    " * (CAST(dl AS DOUBLE) / avgdl))))"
    " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


@query(
    "x4_bm25_search",
    oracle=dedent(
        f"""
        WITH tf AS MATERIALIZED (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                  FROM documents)
            WHERE term <> '' GROUP BY 1, 2
        ),
        tfdl AS MATERIALIZED (
            SELECT doc_id, term, tf,
                   CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
            FROM tf
        ),
        g AS MATERIALIZED (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(SUM(tf) AS BIGINT) AS total
            FROM tf
        ),
        dfreq AS MATERIALIZED (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        pterm AS MATERIALIZED (
            SELECT p.doc_id AS query_id, p.term,
                   {_BM25_IDF_SQL} AS idf, {_BM25_AVGDL_SQL} AS avgdl
            FROM tfdl p JOIN dfreq d USING (term) CROSS JOIN g
            WHERE p.doc_id < {BM25_PROBES}
        ),
        scores AS MATERIALIZED (
            SELECT pt.query_id, t.doc_id,
                   CAST(SUM({_BM25_CONTRIB_SQL}) AS BIGINT) AS score_micro,
                   CAST(COUNT(*) AS BIGINT) AS shared_terms
            FROM pterm pt
            JOIN tfdl t ON t.term = pt.term AND t.doc_id <> pt.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
               score_micro, shared_terms
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id) AS rn
              FROM scores)
        WHERE rn <= {BM25_TOPK}
        """
    ),
    tags=("X4", "search"),
)
def x4_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval, more-like-this flavored: each of the first
    {BM25_PROBES} documents is a query (its distinct terms are the query
    terms) and the corpus is ranked by Okapi BM25 (k1=1.2, b=0.75),
    emitting the top {BM25_TOPK} per probe. The IR lane the X4 family was
    missing: TF-IDF scores terms, postings builds the index — this is the
    ranked SEARCH over it.

    Determinism: per-term contributions are floored to exact BIGINT
    micro-units before the per-(query, doc) sum, so no float accumulation
    order ever reaches the hashed output; idf/avgdl are each one fixed
    IEEE tree over exact integers (shared text with the oracle).

    Scale shape: the term-frequency table is built once (one documents
    scan, checkpointed — three consumers: corpus stats, df, candidates);
    probe terms with their idf ride a ~{BM25_PROBES}x50-row BROADCAST, so
    candidate generation is a map-side join against the corpus postings —
    the corpus never shuffles for the probe join; the only corpus-keyed
    exchanges are the tf aggregation, the per-doc dl window, and the
    (query, doc) score aggregation; top-k lowers to WindowGroupLimit.
    At 100 TB the same plan serves any o(corpus)-sized query batch."""
    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(par, "doc_id")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    w_doc = Window.partitionBy("doc_id")
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(w_doc))
        .localCheckpoint(eager=False)  # consumed 3x: stats, df, candidates
    )
    g = tf.agg(
        F.countDistinct("doc_id").alias("n_docs"), F.sum("tf").alias("total")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pterm = (
        tf.where(F.col("doc_id") < BM25_PROBES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(g))
        .select(
            "query_id",
            "term",
            F.expr(_BM25_IDF_SQL).alias("idf"),
            F.expr(_BM25_AVGDL_SQL).alias("avgdl"),
        )
    )
    scores = (
        tf.join(F.broadcast(pterm), "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.expr(_BM25_CONTRIB_SQL)).alias("score_micro"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= BM25_TOPK)
        .select(
            "query_id",
            F.col("rn").cast("long").alias("rank"),
            "doc_id",
            "score_micro",
            "shared_terms",
        )
    )


def _bpe_merge_step(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs in
    one array — a pure Catalyst ``aggregate`` fold, no UDF: append each
    symbol unless it closes the target pair, in which case replace the
    accumulator's tail with the merged token. Non-overlapping by
    construction (a merged tail no longer equals ``left`` literally)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


N_BPE_MERGES = 10

# Driver-memory bound for the word-frequency table the merge loop runs on.
# Vocabulary is sublinear in corpus size (Heaps' law) but not constant; the
# cap keeps the collected table bounded regardless — the cut is by
# (count desc, word asc) so it is deterministic, and the dropped tail is
# the rarest words, whose pair-count contribution to the top merges is
# negligible (and zero at test scales, where vocab << the cap).
BPE_MAX_VOCAB = 2_000_000


def _learn_bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """One distributed word-count shuffle, then a local incremental merge
    loop over the vocab-sized table — shared by x4_bpe_vocab (reports the
    merge table) and x4_bpe_tokenize_apply (applies the merges back to the
    corpus JVM-side)."""
    from collections import Counter, defaultdict

    docs = table(spark, sf_dir, "documents")
    word_rows = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(BPE_MAX_VOCAB)
        .collect()
    )
    syms_list = [list(r["w"]) for r in word_rows]
    counts = [int(r["n"]) for r in word_rows]

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(syms_list):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += counts[i]
            pair_words[p].add(i)

    def apply_merge(syms: list[str], left: str, right: str) -> list[str]:
        # greedy left-to-right, non-overlapping: a merged tail no longer
        # literally equals `left`, matching _bpe_merge_step / the reference
        merged: list[str] = []
        for s in syms:
            if merged and merged[-1] == left and s == right:
                merged[-1] = left + right
            else:
                merged.append(s)
        return merged

    out_rows = []
    for it in range(n_merges):
        live = {p: c for p, c in pair_counts.items() if c > 0}
        if not live:
            break
        (left, right), cnt = min(
            live.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out_rows.append((it, left, right, left + right, int(cnt)))
        # incremental update: only words containing (left, right) change
        for i in sorted(pair_words.get((left, right), ())):
            old = syms_list[i]
            for p in zip(old, old[1:]):
                pair_counts[p] -= counts[i]
                pair_words[p].discard(i)
            new = apply_merge(old, left, right)
            syms_list[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += counts[i]
                pair_words[p].add(i)
    return out_rows


def _bpe_vocab_parts(n_merges: int = N_BPE_MERGES) -> tuple[str, str]:
    """The BPE merge loop as plain (non-recursive) SQL: one unrolled CTE
    level per merge. Words are boundary-delimited symbol strings —
    ``CHR(1)CHR(1)`` between symbols, so one greedy left-to-right
    non-overlapping merge application is exactly one ``REPLACE`` (the
    doubled separator keeps adjacent matches from sharing boundary
    characters, which a single separator gets wrong on runs like 'aaaa').
    Each level: explode adjacent symbol pairs weighted by word count,
    argmax by (count desc, left, right), apply via REPLACE. Assumes the
    corpus supports >= n_merges merges (true at every test SF).

    Returns ``(with_block, final_select)`` separately so the tokenize
    oracle can extend the WITH block with its own CTEs instead of slicing
    the rendered SQL."""
    sep2 = "CHR(1)||CHR(1)"
    parts = [
        f"""
        w0 AS MATERIALIZED (
            SELECT {sep2} || REGEXP_REPLACE(w, '(.)', '\\1'||CHR(1)||CHR(1), 'g') AS r,
                   COUNT(*) AS n
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w
        )"""
    ]
    for k in range(1, n_merges + 1):
        left = f'(SELECT "left" FROM m{k})'
        right = f'(SELECT "right" FROM m{k})'
        parts.append(
            f"""
        p{k} AS MATERIALIZED (
            SELECT syms[i] AS "left", syms[i+1] AS "right", SUM(n) AS cnt
            FROM (
                SELECT STRING_SPLIT(TRIM(r, CHR(1)), {sep2}) AS syms, n
                FROM w{k-1}
            ) AS s{k}, UNNEST(RANGE(1, LEN(syms))) AS t(i)
            GROUP BY 1, 2
        ),
        m{k} AS MATERIALIZED (
            SELECT "left", "right", cnt FROM p{k}
            ORDER BY cnt DESC, "left", "right" LIMIT 1
        ),
        w{k} AS MATERIALIZED (
            SELECT REPLACE(r,
                       CHR(1)||{left}||{sep2}||{right}||CHR(1),
                       CHR(1)||{left}||{right}||CHR(1)) AS r, n
            FROM w{k-1}
        )"""
        )
    unions = "\n            UNION ALL ".join(
        f'SELECT {k-1} AS iteration, "left", "right", "left"||"right" AS merged, '
        f"CAST(cnt AS BIGINT) AS cnt FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",".join(parts),
        f"""
        SELECT CAST(iteration AS INT) AS iteration, "left", "right", merged, cnt
        FROM ({unions})
        """,
    )


def _bpe_vocab_oracle(n_merges: int = N_BPE_MERGES) -> str:
    with_block, final_select = _bpe_vocab_parts(n_merges)
    return with_block + final_select


@query("x4_bpe_vocab", oracle=_bpe_vocab_oracle(), tags=("X4", "bpe", "iterative"))
def x4_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary construction (the tokenizer-training step of an LLM
    data pipeline): learn the first N_BPE_MERGES merges over the corpus.

    The scale design is the one production tokenizer trainers use (HF
    tokenizers, SentencePiece): BPE statistics depend only on the WORD
    FREQUENCY table, so the 100 TB corpus collapses to <= BPE_MAX_VOCAB
    rows in ONE distributed shuffle, and the merge loop then runs locally
    over that vocab-sized table with incrementally-maintained pair counts
    — only words containing the merged pair are touched per round. Driver
    round-trips: exactly ONE for the whole merge sequence (the r01 version
    did one `.limit(1).collect()` PER merge — fine at 10 merges, a
    driver-sequential bottleneck at a real 32k-merge vocab). Merge
    semantics are exact classic BPE: argmax pair by (count desc, left,
    right) with greedy left-to-right non-overlapping application; the
    sequence is pinned against an independent local reference BPE in
    tests/test_analytics.py AND carries a FULL DuckDB oracle — the same
    N merges unrolled as one materialized CTE level per merge
    (_bpe_vocab_parts), so the driver hash-checks the learned table."""
    out_rows = _learn_bpe_merges(spark, sf_dir, N_BPE_MERGES)
    return spark.createDataFrame(
        out_rows, "iteration int, left string, right string, merged string, cnt long"
    )


def _bpe_tokenize_oracle(n_merges: int = N_BPE_MERGES) -> str:
    """Tokenize-apply as SQL: reuse the vocab oracle's unrolled merge
    levels, then apply all learned merges to each DISTINCT word as a
    nested chain of boundary-delimited REPLACEs and weight the per-word
    token counts back over (doc_id, word) pairs."""
    sep2 = "CHR(1)||CHR(1)"
    with_block, _ = _bpe_vocab_parts(n_merges)
    applied = f"{sep2} || REGEXP_REPLACE(w, '(.)', '\\1'||CHR(1)||CHR(1), 'g')"
    for k in range(1, n_merges + 1):
        left = f'(SELECT "left" FROM m{k})'
        right = f'(SELECT "right" FROM m{k})'
        applied = (
            f"REPLACE({applied},\n                   "
            f"CHR(1)||{left}||{sep2}||{right}||CHR(1),\n                   "
            f"CHR(1)||{left}||{right}||CHR(1))"
        )
    return (
        with_block
        + f""",
        dw AS MATERIALIZED (
            SELECT doc_id, w, COUNT(*) AS cnt
            FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
                  FROM documents)
            WHERE w <> '' GROUP BY 1, 2
        ),
        vocab AS MATERIALIZED (
            SELECT w,
                   LEN(STRING_SPLIT(TRIM({applied}, CHR(1)), {sep2})) AS n_tok,
                   LEN(w) AS n_chr
            FROM (SELECT DISTINCT w FROM dw)
        )
        SELECT doc_id,
               CAST(SUM(cnt * n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(cnt * n_chr) AS BIGINT) AS n_chars,
               ((SUM(cnt * n_chr) * 20000 + SUM(cnt * n_tok))
                // (2 * SUM(cnt * n_tok))) / 10000.0 AS chars_per_token
        FROM dw JOIN vocab USING (w) GROUP BY doc_id
        """
    )


@query(
    "x4_bpe_tokenize_apply",
    oracle=_bpe_tokenize_oracle(),
    tags=("X4", "bpe", "tokenize"),
)
def x4_bpe_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a learned BPE merge table back to the corpus — the
    tokenize-the-training-set half of tokenizer training (the vocab query
    is the learn half). Per document: split to words, split words to
    characters, then fold each merge over the symbol array with
    _bpe_merge_step — a chain of Catalyst higher-order ``aggregate``
    expressions, entirely JVM-side: no UDF, no Python crossing, no
    shuffle (the merge table rides into the plan as literals, the
    executor-side analogue of a broadcast dict). Like the learn half,
    tokenization depends only on the WORD, so the fold runs over the
    DISTINCT-word table (vocab-sized — folding every word INSTANCE was
    ~8x the work at sf0.1: 13.5s -> <2s) and the per-word token count
    joins back to the (doc_id, word, cnt) table on the word key — AQE
    picks broadcast at small vocab and a plain hash join when the vocab
    outgrows the broadcast threshold (Heaps'-law vocabularies can reach
    10^8 rows at 100 TB, too big to force-broadcast); per-doc totals are
    then one count-weighted sum. Output
    is per-doc token accounting (compression ratio = chars per token),
    the quantity a data pipeline actually monitors. Pinned against the
    local reference tokenizer in tests/test_analytics.py AND carries a
    FULL DuckDB oracle (_bpe_tokenize_oracle re-learns the merges via the
    unrolled vocab CTEs, then applies them as a nested REPLACE chain)."""
    merges = _learn_bpe_merges(spark, sf_dir, N_BPE_MERGES)
    docs = table(spark, sf_dir, "documents")
    doc_words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # consumed twice: distinct words + join
    )
    syms = F.split("w", "")
    for _, left, right, _, _ in merges:
        syms = _bpe_merge_step(syms, left, right)
    vocab_tok = (
        doc_words.select("w")
        .distinct()
        .select("w", F.size(syms).alias("n_tok"), F.length("w").alias("n_chr"))
    )
    return (
        doc_words.join(vocab_tok, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("n_chr")).cast("long").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_chars",
            # round-half-up at 4 decimals via exact integer arithmetic —
            # float ROUND of a long/long quotient can disagree across
            # engines when the shortest decimal repr sits on a .xxxx5 tie
            (
                F.expr("(n_chars * 20000 + n_tokens) div (2 * n_tokens)") / 10000.0
            ).alias("chars_per_token"),
        )
    )


@query(
    "x4_repetition_ratio",
    oracle=dedent(
        """
        WITH w AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS ws
            FROM documents
        ),
        t AS (
            SELECT doc_id,
                   LIST_TRANSFORM(RANGE(1, LEN(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tg
            FROM w WHERE LEN(ws) >= 3
        )
        SELECT doc_id,
               CAST(LEN(tg) AS BIGINT) AS n_trigrams,
               CAST(LEN(LIST_DISTINCT(tg)) AS BIGINT) AS n_distinct,
               CAST(((LEN(tg) - LEN(LIST_DISTINCT(tg))) * 10000) // LEN(tg)
                    AS BIGINT) AS dup_bp
        FROM t
        """
    ),
    tags=("X4", "quality", "repetition"),
)
def x4_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio — the duplicate-n-gram quality rule
    of the Gopher/MassiveText filter set (Rae et al. 2021 §A1.1: drop
    documents whose duplicate 3-gram fraction is high; boilerplate and
    spam score high, prose scores low). Per document: token 3-grams,
    distinct count, and the duplicated fraction in basis points —
    COMPUTED ENTIRELY MAP-SIDE: the n-gram build, dedup and ratio are
    array expressions (``transform``/``array_distinct``) inside one
    projection, so the operator needs NO shuffle at all — it streams the
    corpus once, which is the only shape that matters at 100 TB. The
    ratio is exact integer basis points (floor), never a float.
    """
    return (
        table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS ws")
        .where(F.size("ws") >= 3)
        .selectExpr(
            "doc_id",
            "transform(sequence(1, size(ws) - 2),"
            " i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])) AS tg",
        )
        .selectExpr(
            "doc_id",
            "CAST(size(tg) AS BIGINT) AS n_trigrams",
            "CAST(size(array_distinct(tg)) AS BIGINT) AS n_distinct",
            "CAST(((size(tg) - size(array_distinct(tg))) * 10000) div size(tg)"
            " AS BIGINT) AS dup_bp",
        )
    )


# --- broadcast-model quality scoring ---------------------------------------
#
# The one deliberate exception to this module's zero-Python rule: scoring
# documents with a TRAINED quality classifier is the production shape of
# corpus curation (fastText / logistic heads in C4, CCNet, RefinedWeb
# pipelines), and its Spark shape is "broadcast the model, score in one
# Arrow-batched pass" — worth demonstrating as plumbing even though THIS
# model is a hand-quantized linear head. Weights are integer milli-units
# and every feature is an exact integer count, so the logit is exact
# BIGINT arithmetic — reproducible in SQL, hence a full oracle (the trick
# the float-emitting real thing would not allow; a production model slots
# into the same seam with a rows-only check).

QUALITY_MODEL = {
    # feature -> milli-weight; bias in milli-units. Chosen so the corpus
    # splits near 50/50 at logit 0 (median logit ~ +26 at sf0.01).
    "bias": -1100,
    "n_tokens": 15,
    "n_stop": 40,
    "n_uniq": 25,
    "n_chars": -2,
}

# The logit as SQL text over columns (n_tokens, n_stop, n_uniq, n_chars) —
# the ONE definition every oracle that applies the model must reuse
# (x4_quality_model_score here, the curation flagship's stage-1 gate), so
# a structural model change cannot desynchronize the two gates.
QUALITY_LOGIT_SQL = (
    f"{QUALITY_MODEL['bias']} + {QUALITY_MODEL['n_tokens']} * n_tokens"
    f" + {QUALITY_MODEL['n_stop']} * n_stop"
    f" + {QUALITY_MODEL['n_uniq']} * n_uniq"
    f" + {QUALITY_MODEL['n_chars']} * n_chars"
)

# The model's FEATURE extraction as SQL text over a ``text`` column — the
# same one-definition rule as the logit: every oracle that applies the
# model derives (n_tokens, n_stop, n_uniq) from this fragment, so a
# tokenization or stopword change cannot desynchronize the gates.
QUALITY_FEATURES_SQL = (
    "LEN(STRING_SPLIT(text, ' ')) AS n_tokens,\n"
    "                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),\n"
    f"                                   t -> t IN {STOPWORDS!r})) AS n_stop,\n"
    "                   LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_uniq"
)


def quality_logit_col(toks, n_chars):
    """The model's logit as a Catalyst expression over a pre-projected
    token-array column — the JVM-side twin of ``QUALITY_LOGIT_SQL``, ONE
    definition for every engine-side gate (corpus curation stage 1, the
    per-source quota)."""
    m = QUALITY_MODEL
    return (
        F.lit(m["bias"])
        + F.lit(m["n_tokens"]) * F.size(toks)
        + F.lit(m["n_stop"]) * F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        + F.lit(m["n_uniq"]) * F.size(F.array_distinct(toks))
        + F.lit(m["n_chars"]) * n_chars
    )


def score_documents(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Apply the quality model to any (doc_id, lang, text, n_chars)
    DataFrame — batch OR streaming (the scorer is stateless, so the same
    transform drops into a readStream pipeline unchanged; pinned by
    tests/test_streaming.py::test_streaming_quality_scores_equal_batch).
    ``keep`` names extra input columns to pass through unchanged — how a
    streaming ingest gate keeps ``text`` flowing to the next stage (the
    composed stream pipeline in tests/test_streaming.py). See
    x4_quality_model_score for the full story."""
    import numpy as np
    import pandas as pd

    spark = docs.sparkSession
    sc = spark.sparkContext
    bweights = sc.broadcast(dict(QUALITY_MODEL))
    stop = frozenset(STOPWORDS)
    keep = tuple(c for c in keep if c not in ("doc_id", "lang"))

    def score(batches):
        w = bweights.value
        for pdf in batches:
            toks = [t.split(" ") for t in pdf["text"]]
            n_tokens = np.array([len(ts) for ts in toks], dtype="int64")
            n_stop = np.array(
                [sum(t in stop for t in ts) for ts in toks], dtype="int64"
            )
            n_uniq = np.array([len(set(ts)) for ts in toks], dtype="int64")
            n_chars = pdf["n_chars"].to_numpy(dtype="int64")
            logit = (
                w["bias"]
                + w["n_tokens"] * n_tokens
                + w["n_stop"] * n_stop
                + w["n_uniq"] * n_uniq
                + w["n_chars"] * n_chars
            )
            out = {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "logit_milli": logit,
                "quality_pass": logit >= 0,
            }
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    dtypes = dict(docs.dtypes)
    in_cols = ["doc_id", "lang", "text", "n_chars"] + [
        c for c in keep if c not in ("text", "n_chars")
    ]
    schema = "doc_id long, lang string, logit_milli long, quality_pass boolean" + "".join(
        f", {c} {dtypes[c]}" for c in keep
    )
    return docs.select(*in_cols).mapInPandas(score, schema)


@query(
    "x4_quality_model_score",
    oracle=dedent(
        f"""
        WITH f AS (
            SELECT doc_id, lang,
                   {QUALITY_FEATURES_SQL},
                   n_chars
            FROM documents
        )
        SELECT doc_id, lang,
               CAST({QUALITY_LOGIT_SQL} AS BIGINT) AS logit_milli,
               ({QUALITY_LOGIT_SQL}) >= 0 AS quality_pass
        FROM f
        """
    ),
    tags=("X4", "quality", "model"),
)
def x4_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document quality scoring — the broadcast-classifier
    seam of a curation pipeline. The weight vector is shipped to every
    executor ONCE via a Spark broadcast variable (at 100 TB the model is
    megabytes against terabytes of documents — broadcasting is the only
    sane distribution), and scoring is a single ``mapInPandas`` pass:
    Arrow-batched in, exact int64 feature extraction + dot product in
    pandas/numpy, Arrow-batched out, no shuffle anywhere. Features:
    space-split token count, stopword hits (same STOPWORDS as
    x4_text_stats), distinct-token count, and the table's n_chars.
    Returns (doc_id, lang, logit_milli, quality_pass). Stateless, so the
    identical transform (``score_documents``) also runs in a streaming
    ingest gate — stream output == this batch output, pinned in
    tests/test_streaming.py."""
    return score_documents(table(spark, sf_dir, "documents"))


# --- PII scrubbing (regex redaction, the C4/Dolma curation stage) -----------

# RE2-and-Java-compatible patterns only (no lookaround/backrefs): the same
# strings drive Spark's codegen'd regexp_* and the DuckDB oracle.
PII_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
PII_IP_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def _pii_oracle() -> str:
    # NOTE literal regex braces below are doubled for the f-string
    return dedent(
        f"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example or admin' || CAST(doc_id AS VARCHAR)
                        || '@web.example phone 555-'
                        || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS txt
            FROM documents
        ),
        scrubbed AS (
            SELECT doc_id, txt,
                   REGEXP_REPLACE(
                       REGEXP_REPLACE(
                           REGEXP_REPLACE(txt, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                           '{PII_IP_RE}', '<IP>', 'g'),
                       '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean
            FROM injected
        )
        SELECT doc_id,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
               CAST(LEN(txt) - LEN(clean) AS BIGINT) AS redacted_chars,
               MD5(clean) AS scrub_md5
        FROM scrubbed
        """
    )


def scrub_documents(
    docs: DataFrame, keep: tuple[str, ...] = (), emit_clean: bool = False
) -> DataFrame:
    """Stateless PII-scrub transform over a (doc_id, text) frame —
    batch-or-stream applicable like ``score_documents`` (stream == batch
    pinned in tests/test_streaming.py). The synthetic corpus contains no
    PII-shaped strings (no digits or '@' at all), so the transform first
    APPENDS deterministic doc_id-derived PII (same expression in both
    engines) — on a real corpus the injection drops out and the scrub
    chain is unchanged. Counts come from the pre-scrub text, the content
    hash from the scrubbed text; scrub order is email -> IP -> phone in
    both engines (placeholders contain no digits, so later patterns
    cannot re-match inside an earlier redaction).

    ``keep`` names extra input columns passed through unchanged;
    ``emit_clean`` adds the scrubbed text itself as ``clean_text`` — how
    the scrub runs as stage 0 of a composed pipeline (downstream stages
    consume the redacted text, tests/test_streaming.py)."""
    keep = tuple(c for c in keep if c != "doc_id")
    doc = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        doc.cast("string"),
        F.lit("@mail.example or admin"),
        doc.cast("string"),
        F.lit("@web.example phone 555-"),
        F.lpad((doc % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (doc % 256).cast("string"),
        F.lit(".0."),
        ((doc * 7) % 256).cast("string"),
    )
    injected = docs.select("doc_id", txt.alias("txt"), *keep)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    out = [
        F.col("doc_id"),
        F.regexp_count(F.col("txt"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("txt"), F.lit(PII_IP_RE)).alias("n_ips"),
        F.regexp_count(F.col("txt"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        (F.length("txt") - F.length(clean)).cast("long").alias("redacted_chars"),
        F.md5(clean).alias("scrub_md5"),
    ]
    if emit_clean:
        out.append(clean.alias("clean_text"))
    out.extend(F.col(c) for c in keep)
    return injected.select(*out)


@query("x4_pii_scrub", oracle=_pii_oracle(), tags=("X4", "pii", "curation"))
def x4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the regex-redaction stage every public-web corpus
    pipeline runs (emails / phone numbers / IPv4s -> typed placeholder
    tokens) before training-data release. Pure Catalyst ``regexp_replace``
    / ``regexp_count`` chains (``scrub_documents``): whole-stage codegen,
    one pruned scan, zero Python, embarrassingly parallel — the 100 TB
    shape, and stateless, so the identical transform also runs on a
    readStream ingest."""
    return scrub_documents(table(spark, sf_dir, "documents"))


# --- X4: decontamination evaluation (sampled-index recall vs full truth) ----

DECON_SAMPLE_MOD = 4  # keep 1/4 of bench grams in the memory-bounded index


def _decontam_eval_oracle() -> str:
    return dedent(
        f"""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        ),
        grams AS (
            {gram5_cte_sql('toks')}
        ),
        bench AS (SELECT doc_id, g FROM grams
                  WHERE doc_id % {BENCH_HOLDOUT_MOD} = 0),
        corpus AS (SELECT doc_id, g FROM grams
                   WHERE doc_id % {BENCH_HOLDOUT_MOD} <> 0),
        benchg AS (SELECT DISTINCT g FROM bench),
        truth AS (
            SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_shared
            FROM corpus c JOIN benchg b ON b.g = c.g
            GROUP BY 1
        ),
        sampled AS (
            SELECT g FROM benchg
            WHERE CAST('0x' || SUBSTR(MD5(g), 1, 8) AS BIGINT)
                  % {DECON_SAMPLE_MOD} = 0
        ),
        det AS (
            SELECT DISTINCT c.doc_id FROM corpus c JOIN sampled s ON s.g = c.g
        )
        SELECT CASE WHEN t.n_shared >= 4 THEN 4 ELSE t.n_shared END
                   AS sev_bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_detected,
               CAST((1000000 * SUM(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1
                                   END)) // COUNT(*) AS BIGINT) AS recall_micro
        FROM truth t LEFT JOIN det d ON d.doc_id = t.doc_id
        GROUP BY 1
        """
    )


@query(
    "x4_decontam_eval",
    oracle=_decontam_eval_oracle(),
    tags=("X4", "X2", "decontamination", "evaluation"),
)
def x4_decontam_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination-detector evaluation — the detect -> evaluate pair
    for the contamination family (dedup has x2_dedup_eval, ANN has
    x3_ann_eval, retrieval has x9_rag_eval): recall, per contamination
    severity, of a MEMORY-BOUNDED sampled-gram index against the full
    5-gram ground truth. The production knob this grades: at 100 TB the
    broadcast bench index is what must fit on every executor, and keeping
    only the grams whose md5 bucket is 0 mod {DECON_SAMPLE_MOD} cuts it
    {DECON_SAMPLE_MOD}x — at the cost of missing lightly-contaminated
    docs (a doc sharing g grams is missed with probability ~(1-1/{
    DECON_SAMPLE_MOD})^g, so the recall-vs-severity curve is exactly the
    decision surface for choosing the sampling rate). md5 (not xxhash64)
    keys the sample so both engines draw the identical subset — the PQ
    seed-hash discipline.

    Truth and detector share ONE gram geometry (five_gram_rows /
    gram5_cte_sql — the x4_decontaminate spelling); the truth join is the
    eval's own cost, not the detector's. Output per severity bucket
    (n_shared grams, capped at 4+): doc count, detected count, integer
    recall_micro — all BIGINTs, nothing float reaches the hash.

    Scale shape: both detector and truth are broadcast-bench semi-joins
    streaming the corpus grams once each (the x4_decontaminate plan); the
    per-doc DISTINCT-gram aggregate and the final <= 4-row severity
    rollup are the only exchanges."""
    grams = five_gram_rows(table(spark, sf_dir, "documents"))
    bench_g = (
        grams.where(F.col("doc_id") % BENCH_HOLDOUT_MOD == 0)
        .select("g")
        .distinct()
        # consumed twice (truth join + sampled slice): one distinct pass
        .localCheckpoint(eager=False)
    )
    corpus = grams.where(F.col("doc_id") % BENCH_HOLDOUT_MOD != 0)
    truth = (
        corpus.join(F.broadcast(bench_g), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("g")).alias("n_shared"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % DECON_SAMPLE_MOD
    )
    sampled = bench_g.where(bucket == 0)
    det = (
        corpus.join(F.broadcast(sampled), "g")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    sev = F.when(F.col("n_shared") >= 4, F.lit(4)).otherwise(F.col("n_shared"))
    return (
        truth.join(det, "doc_id", "left")
        .groupBy(sev.alias("sev_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias(
                "n_detected"
            ),
            F.expr(
                "CAST((1000000 * SUM(COALESCE(hit, 0))) DIV COUNT(*) AS BIGINT)"
            ).alias("recall_micro"),
        )
    )
