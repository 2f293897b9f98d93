"""Physical-plan regression guards: the plans we shipped are the plans we
keep. A correctness-neutral edit that drops a broadcast, un-pushes a filter,
or widens a parquet scan is a 100 TB regression that sf0.001 wall-clock will
never notice — so assert the plan shape itself (via plans.audit)."""

from __future__ import annotations

import pytest

from iii_aibigdata_capstone_spark.plans import audit
from iii_aibigdata_capstone_spark.queries import flagship, registry

from .conftest import TEST_SF_DIR


def test_flagship_broadcasts_dims_merges_facts(spark):
    # dims (region/nation) broadcast; the fact spine is MERGE-hinted since
    # r5 — compressed-parquet size estimates used to auto-broadcast a fact
    # table (the q5 bench drift), and a fact-table hash relation is the
    # plan that dies at 100 TB. SMJ on the spine is the intended shape.
    a = audit(flagship(spark, TEST_SF_DIR))
    assert a.broadcast_joins > 0
    assert a.sort_merge_joins >= 1


def test_q1_scan_is_pruned_and_pushed(spark):
    a = audit(registry()["q1_pricing_summary"].builder(spark, TEST_SF_DIR))
    assert a.has_pushed_filters
    # q1 needs exactly 7 lineitem columns; a wider ReadSchema means pruning broke
    assert a.read_widths and max(a.read_widths) <= 7, a.read_widths


def test_p1_filter_reaches_parquet(spark):
    assert audit(
        registry()["p1_scan_project_filter"].builder(spark, TEST_SF_DIR)
    ).has_pushed_filters


def test_j1_dim_side_is_broadcast(spark):
    a = audit(registry()["j1_lookup_left_join"].builder(spark, TEST_SF_DIR))
    assert a.broadcast_joins > 0 and a.sort_merge_joins == 0


def test_copartition_pipeline_reuses_exchanges(spark):
    """x8: the explicit repartitions on the join key must be the ONLY data
    exchanges before the final small group-by — the per-order aggregation
    and the join both satisfy their requirement from them. Auto-broadcast
    is disabled to see the at-scale plan (at test SF everything would
    broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = audit(registry()["x8_copartition_pipeline"].builder(spark, TEST_SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # exchanges: li repartition, orders repartition, final orderstatus agg
    assert a.hash_exchanges <= 3, a.text
    assert a.sort_merge_joins > 0 or "ShuffledHashJoin" in a.text


@pytest.mark.parametrize("qname", ["w2_nms_greedy", "t4_person_assembly"])
def test_grouped_kernels_shuffle_once(spark, qname):
    """Grouped kernels: exactly one hash exchange on the group key feeds the
    Python map (plus AQE bookkeeping); a second data exchange means the
    single-shuffle design regressed."""
    a = audit(registry()[qname].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges <= 2, a.text  # initial + AQE-final rendering
    assert a.python_map_operators >= 1


def test_decontaminate_benchmark_side_broadcasts(spark):
    """x4_decontaminate: the tiny benchmark gram index must broadcast —
    a sort-merge join here would shuffle the full corpus n-gram table."""
    a = audit(registry()["x4_decontaminate"].builder(spark, TEST_SF_DIR))
    assert a.broadcast_joins > 0
    assert a.sort_merge_joins == 0, a.text


def test_histogram_bounds_broadcast(spark):
    """x5_histogram_bins: the 1-row min/max aggregate joins as a broadcast
    nested loop; the fact scan must not shuffle before binning (the only
    hash exchange is the final groupBy on the 20 bin ids)."""
    a = audit(registry()["x5_histogram_bins"].builder(spark, TEST_SF_DIR))
    assert "BroadcastNestedLoopJoin" in a.text or a.broadcast_joins > 0
    assert a.hash_exchanges <= 2, a.text


def test_rollup_hierarchy_single_raw_scan(spark):
    """ts_rollup_hierarchy: day/week grains re-aggregate the materialized
    hourly partial — the raw events table appears in the plan exactly once
    (the checkpoint cuts the other two branches' lineage)."""
    df = registry()["ts_rollup_hierarchy"].builder(spark, TEST_SF_DIR)
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    text = plan_text(df)
    assert text.count("events.parquet") <= 1, text


def _no_broadcast(spark):
    """Context helper: audits below assert the AT-SCALE plan, where facts
    exceed any broadcast threshold."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


def test_q7_nation_dims_broadcast_even_at_scale(spark):
    """q7: nation is 25 rows at every SF — the explicit broadcast hints
    must survive a disabled auto-threshold; the facts sort-merge join."""
    with _no_broadcast(spark):
        a = audit(registry()["q7_nation_trade"].builder(spark, TEST_SF_DIR))
    assert a.broadcast_joins > 0
    assert a.sort_merge_joins > 0


def test_q10_topk_never_full_sorts(spark):
    """q10: the global top-20 must plan as TakeOrderedAndProject
    (per-partition top-k + merge), not a total sort of the aggregate."""
    with _no_broadcast(spark):
        a = audit(registry()["q10_returned_items"].builder(spark, TEST_SF_DIR))
    assert "TakeOrderedAndProject" in a.text, a.text


def test_q21_window_reuses_join_partitioning(spark):
    """q21: the per-order supplier counts ride the join's l_orderkey
    partitioning as a window — plan budget: 2 join-input exchanges,
    1 distinct, 2 supplier-join exchanges. A 6th means the window
    formulation regressed to groupBy + join-back (an extra full shuffle
    of the joined lines)."""
    with _no_broadcast(spark):
        a = audit(registry()["q21_sole_late_supplier"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges <= 5, a.text
    assert "TakeOrderedAndProject" in a.text


def test_doc_packing_single_shuffle(spark):
    """x9_doc_packing: hashpartitioning(source) from the window satisfies
    the (source, bin) group-by's clustered distribution — exactly one
    exchange end-to-end."""
    a = audit(registry()["x9_doc_packing"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges == 1, a.text


def test_q2_dims_broadcast_fact_aggregates_once(spark):
    """q2: part/supplier/nation/region are hint-broadcast (survive a
    disabled auto-threshold); the only sort-merge-join-free path leaves
    the (partkey, suppkey) aggregation as the single big shuffle, and the
    window min rides the much smaller supply table."""
    with _no_broadcast(spark):
        a = audit(registry()["q2_min_cost_supplier"].builder(spark, TEST_SF_DIR))
    assert a.broadcast_joins >= 2, a.text
    assert a.sort_merge_joins == 0, a.text
    assert "TakeOrderedAndProject" in a.text, a.text


@pytest.mark.parametrize("qname", ["q11_important_stock", "q15_top_supplier"])
def test_scalar_subquery_queries_scan_fact_once(spark, qname):
    """q11/q15: the global-aggregate scalar subquery must re-aggregate the
    materialized partial, not rescan lineitem — the fact file appears in
    the plan at most once (the checkpoint cuts the second branch)."""
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    text = plan_text(registry()[qname].builder(spark, TEST_SF_DIR))
    assert text.count("lineitem.parquet") <= 1, text


def test_q20_semi_filter_precedes_aggregation(spark):
    """q20: the part-name semi-filter must hit lineitem BELOW the
    (partkey, suppkey) aggregation and the window, so the big shuffle
    only carries 'small*' parts. Formatted-explain ids are assigned
    child-before-parent, so semi-join id < window id iff the filter sits
    under the window subtree."""
    import re

    with _no_broadcast(spark):
        a = audit(registry()["q20_dominant_supplier"].builder(spark, TEST_SF_DIR))
    semi = re.search(r"BroadcastHashJoin LeftSemi \w+ \((\d+)\)", a.text)
    win = re.search(r"\bWindow \((\d+)\)", a.text)
    assert semi and win, a.text
    assert int(semi.group(1)) < int(win.group(1)), a.text


def test_banded_interval_join_is_hash_not_nlj(spark):
    """x5_interval_join_banded: the whole point of banding is that the
    no-equi-key interval join plans as a hash/sort-merge join on the band
    key — a CartesianProduct or BroadcastNestedLoopJoin means the band
    key fell out of the join condition."""
    with _no_broadcast(spark):
        a = audit(registry()["x5_interval_join_banded"].builder(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert a.sort_merge_joins > 0 or "ShuffledHashJoin" in a.text, a.text


def test_snm_single_partitioned_window(spark):
    """x2_sorted_neighborhood: the block-partitioned window must run ONCE
    (one blk exchange feeds the explode fan-out — a union formulation
    re-runs it per lead), and it must be hash-partitioned on blk, never a
    single-partition global sort."""
    a = audit(registry()["x2_sorted_neighborhood"].builder(spark, TEST_SF_DIR))
    assert "hashpartitioning(blk" in a.text, a.text
    assert a.text.count("hashpartitioning(blk") <= 1, a.text
    assert a.hash_exchanges <= 2, a.text


def test_postings_window_is_salted(spark):
    """x4_postings: the first top-k rank must window over (term, salt) —
    pmod in the partition key — so a hot term's posting set never sorts
    in one task; the unsalted term window only sees <= 640 survivors."""
    a = audit(registry()["x4_postings"].builder(spark, TEST_SF_DIR))
    assert "pmod" in a.text, a.text
    assert a.hash_exchanges <= 4, a.text


def test_q16_anti_and_dim_joins_broadcast(spark):
    """q16: the negative-balance supplier anti join and the part bucket
    dim join must both stay broadcast at scale (explicit hints)."""
    with _no_broadcast(spark):
        a = audit(registry()["q16_supplier_count"].builder(spark, TEST_SF_DIR))
    assert a.broadcast_joins >= 2, a.text
    assert a.sort_merge_joins == 0, a.text


def test_q6_all_predicates_push_to_scan(spark):
    a = audit(registry()["q6_forecast_revenue"].builder(spark, TEST_SF_DIR))
    assert a.has_pushed_filters
    assert a.read_widths and max(a.read_widths) <= 4, a.read_widths


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """At 100 TB the single biggest scan-reducer for a selectively-filtered
    dim ⋈ fact join is the runtime bloom filter: Spark builds a bloom of
    the filtered dim keys and injects might_contain(fact.key) ABOVE the
    fact scan, dropping non-joining rows before the shuffle. Guard that
    the engine's session still gets the injection when the sizes qualify
    (thresholds forced here because test SF is tiny)."""
    from iii_aibigdata_capstone_spark.catalog import table
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = table(spark, TEST_SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, TEST_SF_DIR, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        text = plan_text(j)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert "might_contain" in text, text
    assert "bloom_filter_agg" in text


def test_blocked_neardup_single_tile_exchange(spark):
    """x2_embedding_neardup (blocked matmul): the ONLY data shuffle is the
    groupBy(p1,p2) tile exchange; the block-pair fan-out must ride a
    broadcast nested-loop join of the B-row range (no exchange of the
    embedding table for the crossJoin, no driver collect in the plan)."""
    a = audit(registry()["x2_embedding_neardup"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges <= 1, a.text
    assert "BroadcastNestedLoopJoin" in a.text  # the B-row block range
    # exactly one grouped-kernel operator (formatted explain names each
    # operator twice: once in the tree, once in the detail section)
    assert "FlatMapGroupsInPandas" in a.text and "MapInPandas" not in a.text.replace(
        "FlatMapGroupsInPandas", ""
    )


def test_repeated_spans_parallelizes_before_explode(spark):
    """x2_repeated_spans: gram hashing must fan out BEFORE the explode (a
    compact-file corpus otherwise runs the whole O(chars x gram) hashing on
    one input partition) — audited on the gram builder directly because the
    query's lazy localCheckpoint truncates the visible lineage. Guards the
    pre-explode exchange and the 64-bit xxhash64 gram keys (not md5 hex)."""
    import pyspark.sql.functions as F

    from iii_aibigdata_capstone_spark.catalog import table
    from iii_aibigdata_capstone_spark.operators.dedup import _span_grams
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    docs = table(spark, TEST_SF_DIR, "documents").where(F.length("text") >= 20)
    text = plan_text(_span_grams(spark, docs))
    assert "xxhash64" in text and "md5" not in text, text
    # tree prints top-down (sink first): the exchange must be a CHILD of
    # the Generate (appear after it), i.e. the shuffle happens pre-explode
    gen_pos = text.find("Generate")
    exch_pos = text.find("Exchange")
    assert gen_pos != -1 and exch_pos != -1 and exch_pos > gen_pos, text
    assert "hashpartitioning(doc_id" in text, text


def test_tokenize_apply_folds_vocab_not_instances(spark):
    """x4_bpe_tokenize_apply: the merge folds (higher-order aggregate over
    the symbol array) must sit above the DISTINCT-word aggregate, not the
    raw word-instance explode — folding every instance was ~8x the work."""
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    df = registry()["x4_bpe_tokenize_apply"].builder(spark, TEST_SF_DIR)
    text = plan_text(df)
    # the nested merge-fold is evaluated in the Results of the w-keyed
    # (distinct-word) aggregate — i.e. once per distinct word; the
    # word-instance side (hidden behind the lazy checkpoint) only ever
    # joins on w and re-aggregates by doc_id
    assert "size(aggregate(" in text, text
    assert "Keys [1]: [w#" in text, text
    assert "hashpartitioning(doc_id" in text, text


@pytest.mark.parametrize(
    "qname", ["x2_minhash_banded", "x1_incremental_ingest", "x1_fuzzy_dedup_pipeline"]
)
def test_banded_dedup_joins_are_hash_not_nlj(spark, qname):
    """The banded-MinHash candidate join and the incremental-ingest
    anti/shingle joins must all be equi (broadcast/shuffled hash or SMJ)
    — a BroadcastNestedLoopJoin would mean a band/key predicate stopped
    being an equality and the plan degenerated to a cross product."""
    a = audit(registry()[qname].builder(spark, TEST_SF_DIR))
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text


def test_pagerank_iteration_no_driver_action(spark):
    """x10_pagerank (VERDICT r2 item 3): one iteration must be a pure
    transform — dangling mass folded in as a broadcast 1-row aggregate, no
    CartesianProduct, and no ``collect`` anywhere inside the loop body
    (the r2 version paid a full-ranks anti-join action per iteration)."""
    import inspect

    import pyspark.sql.functions as F

    from iii_aibigdata_capstone_spark.operators.graph import (
        pagerank_step,
        purchase_edges,
        x10_pagerank,
    )

    # source-level guard: the loop body performs no driver actions
    src = inspect.getsource(x10_pagerank)
    assert ".collect(" not in src, "driver action inside the pagerank loop"

    # checkpoint the loop inputs (as the operator does) so the audit sees
    # one iteration's plan, not the edge-derivation lineage
    edges = purchase_edges(spark, TEST_SF_DIR).localCheckpoint()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).union(edges.select("dst")).distinct()
    nodes_deg = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint()
    )
    ranks = nodes_deg.select("node", "deg", F.lit(1.0).alias("rank"))
    a = audit(pagerank_step(ranks, edges, nodes_deg, 100))
    assert "CartesianProduct" not in a.text, a.text
    # dangling mass arrives via a broadcast of the 1-row aggregate
    assert "BroadcastNestedLoopJoin" in a.text or "BroadcastExchange" in a.text, a.text
    # two logical shuffle stages per iteration (contrib agg on dst/node,
    # rank rebuild join) — allow the physical count a little headroom for
    # the partial/final agg split, but a blowup means the shape regressed
    assert a.hash_exchanges <= 8, a.text


def test_quality_model_score_is_one_scan_no_shuffle(spark):
    """x4_quality_model_score: broadcast-model scoring must be a single
    narrow pass — parquet scan pruned to the 4 input columns feeding one
    MapInPandas, with NO exchange anywhere (a shuffle in a pure scoring
    map is a 100 TB regression)."""
    a = audit(registry()["x4_quality_model_score"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges == 0, a.text
    assert a.python_map_operators == 1, a.text
    assert a.read_widths and max(a.read_widths) <= 4, a.read_widths


def test_dsir_model_join_is_broadcast(spark):
    """x9_dsir_resample: the 256-row bucket log-ratio model must reach the
    token table via an explicit broadcast (it is constant-size by
    construction — hashed features — so the join must never shuffle the
    token side), and nothing in the plan may be a cartesian product except
    the bounded 1-row totals cross join."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = audit(registry()["x9_dsir_resample"].builder(spark, TEST_SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert a.broadcast_joins > 0, a.text
    assert "CartesianProduct" not in a.text, a.text
    # global top-k must be TakeOrderedAndProject (distributed partial
    # top-k), never a single-partition window sort of the whole corpus
    assert "TakeOrderedAndProject" in a.text, a.text


def test_mmr_probes_broadcast_and_single_grouped_kernel(spark):
    """x3_mmr_rerank: the probe set is explicitly broadcast against ONE
    corpus scan (never a shuffled join of the full embedding table) —
    audited on the pre-checkpoint candidate builder since r5 materializes
    the candidate table once for the pair self-join — and the greedy runs
    as exactly one grouped-pandas kernel over the top-20-shrunk pairs."""
    from iii_aibigdata_capstone_spark.operators.similarity import _mmr_candidates

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = audit(_mmr_candidates(spark, TEST_SF_DIR))
        a = audit(registry()["x3_mmr_rerank"].builder(spark, TEST_SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Broadcast" in c.text, c.text
    assert len(c.read_widths) == 2, c.read_widths  # probes + corpus, once each
    assert a.python_map_operators == 1, a.text


def test_rf_apply_is_pure_projection(spark):
    """m3_rf_apply: model application is the 100 TB hot path — the frozen
    forest must score as ONE pruned scan + projection: no exchange, no
    join, no Python anywhere in the plan."""
    a = audit(registry()["m3_rf_apply"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges == 0, a.text
    assert a.python_map_operators == 0, a.text
    assert a.read_widths and max(a.read_widths) <= 1, a.read_widths
    assert "Join" not in a.text, a.text


def test_rank_metrics_single_corpus_pass(spark):
    """m8_rank_metrics/binary_rank_metrics: the scored corpus is reduced
    to the distinct-score curve in ONE pass — one pruned scan, one scoring
    map, one hash exchange — and the metric branches consume the
    checkpointed curve, never a rebuilt scan (pre-checkpoint this plan
    read + re-scored the corpus FOUR times)."""
    import pyspark.sql.functions as F

    from iii_aibigdata_capstone_spark.catalog import table
    from iii_aibigdata_capstone_spark.ml.metrics import _score_curve
    from iii_aibigdata_capstone_spark.operators.textual import score_documents

    scored = score_documents(table(spark, TEST_SF_DIR, "documents")).select(
        F.col("logit_milli").alias("score"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    a = audit(_score_curve(scored, "score", "y"))
    assert a.python_map_operators == 1, a.text
    assert len(a.read_widths) == 1 and a.read_widths[0] <= 4, a.read_widths
    assert a.hash_exchanges == 1, a.text
    # downstream of the checkpoint: no scan, no scoring map may reappear
    b = audit(registry()["m8_rank_metrics"].builder(spark, TEST_SF_DIR))
    assert b.python_map_operators == 0, b.text
    assert not b.read_widths, b.read_widths


def test_source_quota_partial_topk_and_single_split(spark):
    """x9_source_quota: the rank <= K filter must lower to WindowGroupLimit
    (each input partition keeps its own per-source top-K BEFORE the
    exchange — the shape that caps shuffle rows at K per (partition,
    source) even when one domain dominates the corpus), and the
    tokenization must be projected exactly once (the shingling
    discipline)."""
    a = audit(registry()["x9_source_quota"].builder(spark, TEST_SF_DIR))
    assert "WindowGroupLimit" in a.text, a.text
    assert a.text.count("split(text") == 1, a.text
    assert a.python_map_operators == 0, a.text  # logit is Catalyst arithmetic


def test_paragraph_split_parallelizes_before_explode(spark):
    """x2_paragraph_dedup's splitter (_paragraphs): the doc_id repartition
    must sit BELOW the posexplode (compact-file corpora read as one input
    partition — without the pre-explode exchange the whole O(docs x
    windows) split runs on a single core), and the token array must be
    projected exactly once (inlined split(text) re-evaluates per
    sub-expression — the shingles() discipline)."""
    from iii_aibigdata_capstone_spark.operators.dedup import _paragraphs
    from iii_aibigdata_capstone_spark.plans.audit import plan_text

    text = plan_text(_paragraphs(spark, TEST_SF_DIR))
    gen_pos = text.find("Generate")
    exch_pos = text.find("Exchange")
    # tree prints top-down (sink first): the exchange printing AFTER the
    # Generate means it executes before it
    assert gen_pos != -1 and exch_pos != -1 and exch_pos > gen_pos, text
    assert "hashpartitioning(doc_id" in text, text
    assert text.count("split(text") == 1, text


def test_bloom_probe_is_map_only(spark):
    """x5_bloom_semijoin: the fact-side probe must stay MAP-ONLY — the
    filter words and membership set arrive by broadcast (checkpointed,
    hence ExistingRDD leaves) and the ONLY hash exchange in the lineage is
    the final per-year aggregation; the orders scan reads exactly the two
    consumed columns. A shuffle before the bloom test defeats the entire
    point of a runtime filter at 100 TB."""
    a = audit(registry()["x5_bloom_semijoin"].builder(spark, TEST_SF_DIR))
    assert a.hash_exchanges == 1, a.text
    assert a.broadcast_joins >= 5, a.text
    assert a.read_widths and max(a.read_widths) <= 2, a.read_widths


def test_no_scale_killers_in_any_registered_plan(spark):
    """Repo-wide plan hygiene (the r5 sweep, institutionalized): for EVERY
    registered query, the physical plan contains (a) no CartesianProduct
    node and (b) no table scanned three or more times — the two shapes
    that silently turn a correct sf0.001 query into a 100 TB
    non-starter (unbounded pair space; re-running a corpus scan per
    consumer instead of materializing a shared subplan once). Queries
    with a legitimate triple-scan must be whitelisted here with a reason."""
    import re
    from collections import Counter

    TRIPLE_SCAN_ALLOWED: dict[str, str] = {}  # name -> justification

    offenders = []
    for name, spec in registry().items():
        text = audit(spec.builder(spark, TEST_SF_DIR)).text
        cart = len(re.findall(r"^\(\d+\) CartesianProduct", text, re.MULTILINE))
        # Scans hosted under a runtime bloom-filter subquery (Spark's
        # injected build of the join key's bloom: `bloom_filter_agg` in the
        # subquery plan — single-column, filter-pushed) are a pruning aid,
        # not a consumer re-scanning the corpus, so they are exempt from
        # the triple-scan rule. Any OTHER subquery scan (a user-authored
        # scalar subquery recomputing a global min/max/threshold is a real
        # hidden fact-table pass) still counts.
        main, _, subq = text.partition("===== Subqueries =====")
        files = Counter(re.findall(r"/(\w+)\.parquet", main))
        for sub in re.split(r"\n(?=Subquery:\d+ )", subq):
            if "bloom_filter_agg" not in sub:
                files.update(re.findall(r"/(\w+)\.parquet", sub))
        triple = {t: n for t, n in files.items() if n >= 3}
        if cart or (triple and name not in TRIPLE_SCAN_ALLOWED):
            offenders.append((name, cart, triple))
    assert not offenders, offenders


def test_streaming_serving_micro_batch_plan_rescans_no_parquet(spark):
    """The streaming serving twin's per-micro-batch plan (serve_query_batch
    over a static query frame — exactly what foreachBatch executes) must
    read ONLY the checkpointed RagIndex members: zero parquet scans per
    batch, no CartesianProduct, no Python operators. This is the r9
    zero-rescan property, asserted on the STREAM-side spelling instead of
    only the batch twin (the x9_rag_pipeline PLANS entry)."""
    from iii_aibigdata_capstone_spark.operators.curation import rag_index
    from iii_aibigdata_capstone_spark.streaming.serving import serve_query_batch

    index = rag_index(spark, TEST_SF_DIR)
    queries = spark.createDataFrame(
        [(1, "alpha beta gamma"), (3, "delta epsilon")],
        "query_id long, text string",
    )
    a = audit(serve_query_batch(index, queries))
    assert ".parquet" not in a.text, "micro-batch plan re-scans parquet"
    assert "CartesianProduct" not in a.text
    assert a.python_map_operators == 0


def test_streaming_ingest_micro_batch_plan_rescans_no_parquet(spark):
    """The ingest twin's per-micro-batch plan (ingest_admit over a static
    arrival frame — exactly what foreachBatch executes) must read ONLY the
    checkpointed IngestIndex members: zero parquet scans per batch, no
    CartesianProduct, no Python operators (the serving-plan discipline on
    the dedup lane)."""
    import pyspark.sql.functions as F

    from iii_aibigdata_capstone_spark.catalog import table
    from iii_aibigdata_capstone_spark.operators.dedup import (
        ingest_admit,
        minhash_ingest_index,
    )

    docs = table(spark, TEST_SF_DIR, "documents")
    index = minhash_ingest_index(docs.where(F.col("doc_id") % 5 != 4))
    arrivals = spark.createDataFrame(
        [(4, "en", "some arriving text body", 23), (9, "fr", "another doc", 11)],
        "doc_id long, lang string, text string, n_chars long",
    )
    a = audit(ingest_admit(index, arrivals))
    assert ".parquet" not in a.text, "micro-batch plan re-scans parquet"
    assert "CartesianProduct" not in a.text
    assert a.python_map_operators == 0


def test_streaming_growing_ingest_micro_batch_plan_rescans_no_parquet(spark):
    """The GROWING twin's per-micro-batch plan: after a fold, the NEXT
    batch's admission must still read only checkpoints — the base members
    plus the fold's O(admitted) delta checkpoints (whose lineage roots in
    the in-memory arrival frame, not parquet). The LSM-delta property at
    100 TB: growth never reintroduces a corpus scan into the per-batch
    plan."""
    import pyspark.sql.functions as F

    from iii_aibigdata_capstone_spark.catalog import table
    from iii_aibigdata_capstone_spark.operators.dedup import (
        ingest_admit,
        ingest_admit_fold,
        minhash_ingest_index,
    )

    docs = table(spark, TEST_SF_DIR, "documents")
    index = minhash_ingest_index(docs.where(F.col("doc_id") % 5 != 4))
    batch1 = spark.createDataFrame(
        [(100004, "en", "first arriving text body here", 29)],
        "doc_id long, lang string, text string, n_chars long",
    )
    _admitted, grown = ingest_admit_fold(index, batch1)
    batch2 = spark.createDataFrame(
        [(100009, "fr", "second arriving doc", 19)],
        "doc_id long, lang string, text string, n_chars long",
    )
    a = audit(ingest_admit(grown, batch2))
    assert ".parquet" not in a.text, "grown micro-batch plan re-scans parquet"
    assert "CartesianProduct" not in a.text
    assert a.python_map_operators == 0


def test_streaming_ann_micro_batch_plan_rescans_no_parquet(spark):
    """The ANN serving twin's per-micro-batch plan (serve_ann_batch over
    a static probe-id frame — exactly what foreachBatch executes) must
    read ONLY the checkpointed IvfPqIndex members (cells, codebook,
    subvectors, inverted lists, re-rank vectors): zero parquet scans per
    batch, no CartesianProduct, no Python operators — the serving-plan
    discipline applied to the ANN product."""
    from iii_aibigdata_capstone_spark.operators.similarity import ivf_pq_index
    from iii_aibigdata_capstone_spark.streaming.serving import serve_ann_batch

    index = ivf_pq_index(spark, TEST_SF_DIR)
    qids = spark.createDataFrame([(1,), (3,), (7,)], "query_id long")
    a = audit(serve_ann_batch(index, qids))
    assert ".parquet" not in a.text, "micro-batch plan re-scans parquet"
    assert "CartesianProduct" not in a.text
    assert a.python_map_operators == 0
