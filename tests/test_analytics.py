"""Checks for the analytics operators that the DuckDB oracle can't cover:
HLL sketch accuracy, and determinism of the content-hash sampling ops."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from iii_aibigdata_capstone_spark.catalog import table
from iii_aibigdata_capstone_spark.queries import registry

from .conftest import TEST_SF_DIR


def replay_fold_dot(u, v):
    """Left-fold dot product in index order — bit-identical to the
    engine's F.aggregate accumulation. ONE spelling for every
    float-replay test (rag_eval, truncation_eval): the bit-identity
    discipline must not fork per test."""
    acc = 0.0
    for x, y in zip(u, v):
        acc = acc + x * y
    return acc


def replay_fold_norm(u):
    """sqrt of the left-fold self-dot — the engine's l2_norm spelling."""
    import math

    return math.sqrt(replay_fold_dot(u, u))


def replay_rnd6(x):
    """HALF_UP at 6 decimals over the SHORTEST decimal repr.
    Decimal(repr(x)), NOT Decimal(x): Spark's Round on doubles goes
    through BigDecimal.valueOf = the shortest repr (what
    Double.toString / python repr both produce), while Decimal(x)
    expands the exact binary value — the two can HALF_UP a
    boundary-adjacent cosine differently (review r11)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_hll_rollup_within_error_bound(spark):
    """HLL estimates (default lgConfigK=12 → ~1.6% rse) must land within
    5% of exact distinct counts, per group and for the sketch-union row."""
    out = {
        r["event_type"]: r["approx_users"]
        for r in registry()["x5_hll_rollup"].builder(spark, TEST_SF_DIR).collect()
    }
    ev = table(spark, TEST_SF_DIR, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(out) == set(exact)
    for k, est in out.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_hll_union_row_merges_sketches_not_rescans(spark):
    """The ALL row must estimate the union of users, not the sum of
    per-type counts (users appear under several event types)."""
    rows = registry()["x5_hll_rollup"].builder(spark, TEST_SF_DIR).collect()
    per_type_sum = sum(r["approx_users"] for r in rows if r["event_type"] != "ALL")
    all_row = next(r["approx_users"] for r in rows if r["event_type"] == "ALL")
    assert all_row < per_type_sum  # heavy overlap in the testdata


def test_hll_explicit_within_error_bound(spark):
    """x5_hll_explicit (m=64 -> 13% rse): every group's raw estimate must
    land within 3.7 sigma (50%) of exact — the sf0.001 'error' group is a
    3.7-sigma draw — and the register-merged ALL row within 15%."""
    rows = registry()["x5_hll_explicit"].builder(spark, TEST_SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        bound = 0.15 if r["event_type"] == "ALL" else 0.50
        assert abs(r["approx_ids"] - r["exact_ids"]) <= bound * r["exact_ids"], (
            r["event_type"],
            r["approx_ids"],
            r["exact_ids"],
        )


def test_hdr_quantiles_within_relative_error(spark):
    """x5_hdr_quantiles: each emitted bucket lower bound must satisfy the
    HDR contract — lo <= exact discrete quantile < lo * (1 + 2^-5) + 1
    (the bucket's width is at most lo/32 by construction), for every
    group and every emitted percentile."""
    import numpy as np

    rows = registry()["x5_hdr_quantiles"].builder(spark, TEST_SF_DIR).collect()
    assert len(rows) == 5
    cents = {
        g: np.sort(
            np.array(
                [
                    int(np.floor(r.o_totalprice * 100 + 0.5))
                    for r in table(spark, TEST_SF_DIR, "orders")
                    .where(F.col("o_orderpriority") == g)
                    .select("o_totalprice")
                    .collect()
                ]
            )
        )
        for g in {r["o_orderpriority"] for r in rows}
    }
    for r in rows:
        vals = cents[r["o_orderpriority"]]
        assert r["n"] == len(vals)
        for q, lo in ((0.5, r["p50_cents"]), (0.9, r["p90_cents"]), (0.99, r["p99_cents"])):
            k = -(-int(q * 100) * len(vals) // 100)  # ceil(q*n) as integers
            exact = int(vals[k - 1])  # k-th smallest (discrete quantile)
            assert lo <= exact <= lo + lo // 32 + 1, (r["o_orderpriority"], q, lo, exact)


def test_hll_sliding_explicit_merge_equals_rescan(spark):
    """x5_hll_sliding_explicit: merging daily register partials must give
    BIT-IDENTICAL estimates to rebuilding each window's registers directly
    from the event rows (explode each EVENT to its 3 windows, then one
    max-aggregation) — the exactness of integer MAX-merge is the property
    that makes sketch partials trustworthy at 100 TB, where the rescan
    plan is unaffordable."""
    from iii_aibigdata_capstone_spark.operators.analytics import (
        _hll_est,
        _hll_j_rho,
        _hll_sden,
    )

    merged = {
        r["win_end"]: r["approx_ids"]
        for r in registry()["x5_hll_sliding_explicit"].builder(spark, TEST_SF_DIR).collect()
    }
    ev = table(spark, TEST_SF_DIR, "events")
    j, rho = _hll_j_rho("event_id")
    winregs = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("d"), j, rho)
        .select(
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.col("d") + F.expr("INTERVAL 2 DAYS"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("win_end"),
            "j",
            "rho",
        )
        .groupBy("win_end", "j")
        .agg(F.max("rho").alias("m"))
    )
    rescan = {
        r["win_end"]: r["approx_ids"]
        for r in _hll_sden(winregs, "win_end")
        .select(F.col("win_end").cast("long").alias("win_end"), _hll_est().alias("approx_ids"))
        .collect()
    }
    assert merged == rescan  # exact float equality — same integers, same tree


def test_countmin_never_underestimates(spark):
    """x5_countmin_terms: the count-min guarantee — every probe's estimate
    is >= its exact count (overcount >= 0), and with 4x1024 counters the
    top terms' overestimate stays below 10% of their exact count at test
    SF (colliding tail mass is small next to a heavy hitter)."""
    rows = registry()["x5_countmin_terms"].builder(spark, TEST_SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_n"] >= r["exact_n"], (r["term"], r["cms_n"], r["exact_n"])
        assert r["overcount"] == r["cms_n"] - r["exact_n"]
        assert r["overcount"] <= 0.10 * r["exact_n"], (r["term"], r["overcount"])


def test_weighted_sample_deterministic(spark):
    spec = registry()["x9_weighted_sample"]
    a = sorted(map(tuple, spec.builder(spark, TEST_SF_DIR).collect()))
    b = sorted(map(tuple, spec.builder(spark, TEST_SF_DIR).collect()))
    assert a == b
    per_source = {}
    for src, _doc, _nt, _key, rank in a:
        per_source.setdefault(src, []).append(rank)
    for src, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= 5


def test_hash_split_is_partition_layout_independent(spark):
    """The md5 split must not change when the input is repartitioned —
    the property that justifies content-addressed splits over rand(seed)."""
    docs = table(spark, TEST_SF_DIR, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long") % 100
    )
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    one = docs.coalesce(1).select("doc_id", split.alias("s"))
    many = docs.repartition(16).select("doc_id", split.alias("s"))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_source_divergence_bounds(spark):
    """JSD (natural log) is bounded by [0, ln 2]; every pair must land
    inside, and the matrix must cover all C(5,2) source pairs exactly
    once with src_a < src_b."""
    import math

    rows = registry()["x4_source_divergence"].builder(spark, TEST_SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["src_a"] < r["src_b"] for r in rows)
    assert all(0.0 <= r["jsd"] <= math.log(2.0) + 1e-9 for r in rows)


def test_hll_sliding_matches_exact_within_error(spark):
    """Each 3-hour sliding estimate must land within 5% of the exact
    distinct-user count over the same [win_end - 2h, win_end] span."""
    got = {
        r["win_end"]: r["approx_users"]
        for r in registry()["x5_hll_sliding"].builder(spark, TEST_SF_DIR).collect()
    }
    ev = table(spark, TEST_SF_DIR, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    exact = {
        r["win_end"]: r["exact"]
        for r in ev.select(
            F.explode(
                F.sequence(
                    F.col("h"),
                    F.col("h") + F.expr("INTERVAL 2 HOURS"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("win_end"),
            "user_id",
        )
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for win_end, est in got.items():
        assert abs(est - exact[win_end]) <= max(1, 0.05 * exact[win_end]), (
            win_end,
            est,
            exact[win_end],
        )


def test_bpe_vocab_matches_reference(spark):
    """The distributed BPE merge sequence must equal a local reference BPE
    run over the same word-frequency table (greedy left-to-right merges,
    argmax pair by (count, -left, -right) — ties broken lexicographically
    ascending)."""
    from collections import Counter

    rows = (
        table(spark, TEST_SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    words = {r["w"]: r["count"] for r in rows}
    vocab = {w: list(w) for w in words}

    def merge_seq(n_merges):
        out = []
        for _ in range(n_merges):
            pairs = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += words[w]
            if not pairs:
                break
            (left, right), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((left, right, left + right, cnt))
            for w, syms in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if (
                        merged
                        and merged[-1] == left
                        and syms[i] == right
                    ):
                        merged[-1] = left + right
                    else:
                        merged.append(syms[i])
                    i += 1
                vocab[w] = merged
        return out

    want = merge_seq(10)
    got = [
        (r["left"], r["right"], r["merged"], r["cnt"])
        for r in registry()["x4_bpe_vocab"]
        .builder(spark, TEST_SF_DIR)
        .orderBy("iteration")
        .collect()
    ]
    assert got == want


def test_bpe_tokenize_apply_matches_local_tokenizer(spark):
    """The distributed JVM-side merge-fold tokenization must produce, per
    document, the same token count as locally learning the merges
    (independent reference BPE) and applying them word by word."""
    merges = [
        (r["left"], r["right"])
        for r in registry()["x4_bpe_vocab"]
        .builder(spark, TEST_SF_DIR)
        .orderBy("iteration")
        .collect()
    ]

    def tokenize(word: str) -> int:
        syms = list(word)
        for left, right in merges:
            merged, out = left + right, []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            syms = out
        return len(syms)

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, TEST_SF_DIR, "documents").limit(50).collect()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"])
        for r in registry()["x4_bpe_tokenize_apply"]
        .builder(spark, TEST_SF_DIR)
        .collect()
        if r["doc_id"] in docs
    }
    for doc_id, text in docs.items():
        words = [w for w in text.split(" ") if w]
        want_tok = sum(tokenize(w) for w in words)
        want_chr = sum(len(w) for w in words)
        assert got[doc_id] == (want_tok, want_chr), doc_id


def test_heavy_hitters_exact_at_small_vocab(spark):
    """approx_top_k is exact while distinct items fit the tracker, so at
    test vocab size the estimated counts must equal exact term counts and
    the top-20 item set must match (tie order between equal counts is
    sketch-defined, so compare as mappings plus a count cutoff)."""
    got = {
        r["term"]: r["est_count"]
        for r in registry()["x5_heavy_hitters"].builder(spark, TEST_SF_DIR).collect()
    }
    exact = {
        r["term"]: r["n"]
        for r in table(spark, TEST_SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(got) == 20
    for term, est in got.items():
        assert est == exact[term], (term, est, exact[term])
    cutoff = sorted(exact.values(), reverse=True)[19]
    assert all(c >= cutoff for c in got.values())


def test_minhash_banded_subset_of_exact_jaccard(spark):
    """x2_minhash_banded emits only verified pairs (precision 1.0 by
    construction — exact-Jaccard check after banding), so its output must
    be a subset of the exhaustive x2_ngram_jaccard pairs at the same
    threshold, with identical jaccard values; banding costs recall only.
    At test SF the near-dup pairs are heavy (prefix copies), so recall
    must be non-trivial too."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry()["x2_ngram_jaccard"].builder(spark, TEST_SF_DIR).collect()
    }
    banded = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry()["x2_minhash_banded"].builder(spark, TEST_SF_DIR).collect()
    }
    assert set(banded) <= set(exact), set(banded) - set(exact)
    for pair, j in banded.items():
        assert j == exact[pair], (pair, j, exact[pair])
    if exact:
        assert len(banded) / len(exact) >= 0.5, (len(banded), len(exact))


def test_minhash_lsh_mllib_cross_checked_against_exact(spark):
    """VERDICT r5 item 7: the seeded-MLlib lane (x2_minhash_lsh,
    approxSimilarityJoin at jaccard distance 0.5) is rows-only for the
    driver forever, so pin it against ground truth here: a brute-force
    exact-Jaccard pass over the distinct shingle sets (the same sets the
    MLlib lane feeds through HashingTF). Contract: (a) every emitted pair
    is a true >=0.5 pair — the 2^18-bucket feature hash can only MERGE
    shingles, and no merge crossed the threshold at test SF; (b) recall
    >= 0.9 against the exact pair set (banding with 8 tables; measured
    1.0 at sf0.001, bound left slack for other test dirs); (c) the
    reported jaccard agrees with exact to 1e-3 (4-dp rounding + rare
    feature-hash collisions)."""
    from collections import defaultdict

    from iii_aibigdata_capstone_spark.operators.dedup import shingles

    sets = defaultdict(set)
    for r in shingles(spark, TEST_SF_DIR, n=3).select("doc_id", "s").collect():
        sets[r.doc_id].add(r.s)
    ids = sorted(sets)
    exact = {}
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            inter = len(sa & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sa) + len(sets[b]) - inter)
            if j >= 0.5:
                exact[(a, b)] = j
    ml = {
        (r.doc_a, r.doc_b): 1 - r.jaccard_dist
        for r in registry()["x2_minhash_lsh"].builder(spark, TEST_SF_DIR).collect()
    }
    assert exact, "test corpus must contain near-dup pairs"
    extra = set(ml) - set(exact)
    assert not extra, f"MLlib emitted non-pairs: {sorted(extra)[:5]}"
    recall = sum(p in ml for p in exact) / len(exact)
    assert recall >= 0.9, f"recall {recall} over {len(exact)} exact pairs"
    for p in ml:
        assert abs(ml[p] - exact[p]) <= 1e-3, (p, ml[p], exact[p])


def test_min_label_propagation_on_known_graph(spark):
    """The shared CC helper labels every node with its component's min id:
    a 5-node path (worst diameter per edge count) plus a disjoint pair."""
    from iii_aibigdata_capstone_spark.operators.dedup import _min_label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.node: r.label for r in _min_label_propagation(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_fuzzy_dedup_pipeline_invariants(spark):
    """Per-doc verdicts must be mutually consistent: exact dups point at an
    identical-text survivor, near-dups point at a kept doc, kept docs are
    their own canonical, and every doc gets exactly one verdict."""
    out = {
        r.doc_id: r
        for r in registry()["x1_fuzzy_dedup_pipeline"]
        .builder(spark, TEST_SF_DIR)
        .collect()
    }
    docs = {
        r.doc_id: r.text
        for r in table(spark, TEST_SF_DIR, "documents").select("doc_id", "text").collect()
    }
    assert set(out) == set(docs)
    statuses = {r.status for r in out.values()}
    assert statuses <= {"kept", "exact_dup", "near_dup"}
    for r in out.values():
        canon = out[r.canonical]
        if r.status == "kept":
            assert r.canonical == r.doc_id
        elif r.status == "exact_dup":
            # canonical is the exact-stage survivor with the same text; it
            # may itself have lost the NEAR-dup stage (stage-local verdicts)
            assert docs[r.doc_id] == docs[r.canonical]
            assert canon.status != "exact_dup"
        else:  # near_dup
            assert canon.status == "kept"
            assert docs[r.doc_id] != docs[r.canonical]


def test_min_label_propagation_raises_on_round_budget(spark):
    """A component whose diameter exceeds max_rounds must raise, not
    silently return intermediate labels (review finding r3)."""
    import pytest

    from iii_aibigdata_capstone_spark.operators.dedup import _min_label_propagation

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "doc_a long, doc_b long"
    )
    # driver_cc_max=-1 forces the distributed path (the local union-find
    # has no round budget to exhaust)
    with pytest.raises(RuntimeError, match="did not converge"):
        _min_label_propagation(chain, max_rounds=2, driver_cc_max=-1).collect()
    # and with enough rounds the same chain resolves to component-min 0
    got = {
        r.label
        for r in _min_label_propagation(
            chain, max_rounds=25, driver_cc_max=-1
        ).collect()
    }
    assert got == {0}
    # max_rounds < 1 is a caller error, rejected at entry (the for/else
    # would otherwise reference an unbound loop variable)
    with pytest.raises(ValueError, match="max_rounds"):
        _min_label_propagation(chain, max_rounds=0)


def test_cc_local_and_distributed_paths_agree(spark):
    """The size-adaptive CC must produce IDENTICAL (node, label) rows on
    both paths — driver union-find (small edge sets) and iterative
    propagation — including multi-component graphs with chains, cliques
    and isolated pairs."""
    from iii_aibigdata_capstone_spark.operators.dedup import _min_label_propagation

    edges = (
        # chain 10..15, clique {3,4,5}, pair (100, 7), self-contained (20,21)
        [(i, i + 1) for i in range(10, 15)]
        + [(3, 4), (4, 5), (3, 5)]
        + [(100, 7), (20, 21)]
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = sorted(map(tuple, _min_label_propagation(pairs).collect()))
    dist = sorted(
        map(tuple, _min_label_propagation(pairs, driver_cc_max=-1).collect())
    )
    assert local == dist
    # spot-check the min-label contract
    labels = dict(local)
    assert labels[100] == 7 and labels[5] == 3 and labels[14] == 10


def test_paragraph_stride_guard_raises(spark, monkeypatch):
    """_paragraphs: a document whose window count exceeds PARA_ID_STRIDE
    must raise (the guard), never silently alias its paragraphs into the
    next doc_id's id space. Stride is monkeypatched tiny so an ordinary
    test document trips it."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from iii_aibigdata_capstone_spark.operators import dedup

    monkeypatch.setattr(dedup, "PARA_ID_STRIDE", 2)
    with pytest.raises(SparkRuntimeException, match="PARA_ID_STRIDE"):
        # aggregate para_id itself: a bare count() would let column
        # pruning drop the guarded expression entirely
        dedup._paragraphs(spark, TEST_SF_DIR).select(F.sum("para_id")).collect()


def test_bloom_semijoin_invariants(spark):
    """x5_bloom_semijoin: (a) false_neg == 0 in every group — the Bloom
    guarantee; (b) bloom_pass == exact_match + false_pos (the pass set is
    exactly members plus measured false positives); (c) pruned + pass ==
    probed; (d) the aggregate non-member pass rate stays under 10% — at
    test-SF build cardinalities (n ~ 30-3000 keys in m = 16384 bits) the
    (1 - e^(-kn/m))^k curve tops out ~7.5%."""
    rows = registry()["x5_bloom_semijoin"].builder(spark, TEST_SF_DIR).collect()
    assert rows
    fp = nonmem = 0
    for r in rows:
        assert r.false_neg == 0, r
        assert r.bloom_pass == r.exact_match + r.false_pos, r
        assert r.pruned + r.bloom_pass == r.probed, r
        fp += r.false_pos
        nonmem += r.probed - r.exact_match
    assert nonmem > 0  # the build-side predicate must actually filter
    assert fp / nonmem <= 0.10, f"FPR {fp}/{nonmem}"


def test_prefix_filter_join_equals_full_join_and_prunes(spark):
    """x2_prefix_filter_join: (a) output == x2_ngram_jaccard exactly —
    PPJoin Lemma 1 guarantees 100% candidate recall at the threshold and
    the verify stage recounts exactly, so prefix filtering must change
    NOTHING but the candidate volume; (b) it actually prunes: distinct
    prefix-candidate pairs < distinct share-any-shingle pairs."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iii_aibigdata_capstone_spark.operators.dedup import sized_shingles

    new = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry()["x2_prefix_filter_join"].builder(spark, TEST_SF_DIR).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry()["x2_ngram_jaccard"].builder(spark, TEST_SF_DIR).collect()
    }
    assert new == full

    sh = sized_shingles(spark, TEST_SF_DIR)
    pair = lambda a, b: (  # noqa: E731
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    n_full = pair(sh.alias("a"), sh.alias("b"))
    df = sh.groupBy("lang", "s").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy("df", "s")
    prefix = (
        sh.join(df, ["lang", "s"])
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= F.col("n") - F.expr("(n + 1) DIV 2") + 1)
        .select("doc_id", "lang", "s")
        .localCheckpoint(eager=False)
    )
    n_prefix = pair(prefix.alias("a"), prefix.alias("b"))
    assert 0 < n_prefix < n_full, (n_prefix, n_full)


def test_hll_setops_identities_and_accuracy(spark):
    """x5_hll_setops: (1) the emitted INTERSECT estimate IS the
    inclusion-exclusion of the emitted A/B/UNION estimates, bit-for-bit
    (same sdens, same IEEE tree — Python's own float add/sub reproduces
    it); (2) the exact counts satisfy integer inclusion-exclusion; (3)
    each direct estimate lands within 25% of exact (13% theoretical rse
    at m=64; test SF sits just below the raw regime), and the I-E
    intersection within half the UNION's cardinality — its error scales
    on the union, the documented weakness of HLL intersections."""
    rows = {
        r["segment"]: r
        for r in registry()["x5_hll_setops"].builder(spark, TEST_SF_DIR).collect()
    }
    assert set(rows) == {"A", "B", "UNION", "INTERSECT"}
    a, b, u, i = rows["A"], rows["B"], rows["UNION"], rows["INTERSECT"]
    assert i["approx_keys"] == (a["approx_keys"] + b["approx_keys"]) - u["approx_keys"]
    assert u["exact_keys"] == a["exact_keys"] + b["exact_keys"] - i["exact_keys"]
    for r in (a, b, u):
        assert abs(r["approx_keys"] - r["exact_keys"]) <= 0.25 * r["exact_keys"], r
    assert abs(i["approx_keys"] - i["exact_keys"]) <= 0.5 * u["exact_keys"], (i, u)


def test_table_stats_ground_truth(spark):
    """x8_table_stats vs independently recomputed ground truth: row/null
    counts, typed min/max, exact NDV, and mean string length must agree
    with direct per-column aggregates; ndv_hll must land within 30% of
    exact for the raw-regime columns (custkey/orderdate/totalprice at
    every test SF), while the 3- and 5-NDV string columns expose the
    documented no-linear-counting behavior (raw estimate ~46-48
    regardless of exact NDV — deterministic, pinned only as positive)."""
    stats = {
        r["col_name"]: r
        for r in registry()["x8_table_stats"].builder(spark, TEST_SF_DIR).collect()
    }
    ords = table(spark, TEST_SF_DIR, "orders")
    n = ords.count()
    truth = ords.agg(
        F.countDistinct("o_custkey").alias("ck_ndv"),
        F.min("o_custkey").cast("double").alias("ck_min"),
        F.max("o_custkey").cast("double").alias("ck_max"),
        F.countDistinct("o_orderstatus").alias("st_ndv"),
        F.min("o_orderstatus").alias("st_min"),
        F.max("o_orderstatus").alias("st_max"),
        F.avg(F.length("o_orderpriority")).alias("pr_len"),
        F.countDistinct("o_totalprice").alias("tp_ndv"),
    ).collect()[0]
    assert set(stats) == {
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderstatus",
        "o_orderpriority",
    }
    for r in stats.values():
        assert r["n_rows"] == n and r["n_null"] == 0, r
        assert r["ndv_hll"] > 0, r
    ck, st, pr, tp = (
        stats["o_custkey"],
        stats["o_orderstatus"],
        stats["o_orderpriority"],
        stats["o_totalprice"],
    )
    assert ck["ndv_exact"] == truth["ck_ndv"]
    assert (ck["min_num"], ck["max_num"]) == (truth["ck_min"], truth["ck_max"])
    assert ck["min_str"] is None and ck["max_str"] is None and ck["avg_len"] is None
    assert st["ndv_exact"] == truth["st_ndv"]
    assert (st["min_str"], st["max_str"]) == (truth["st_min"], truth["st_max"])
    assert st["min_num"] is None and st["max_num"] is None
    assert abs(pr["avg_len"] - truth["pr_len"]) < 1e-12
    # injectivity of the cents canonicalization: NDV over canon must equal
    # NDV over the RAW doubles (a collapsing canonicalization would show
    # fewer) — truth_raw is computed on o_totalprice itself, not on cents
    assert tp["ndv_exact"] == truth["tp_ndv"]
    for col in ("o_custkey", "o_orderdate", "o_totalprice"):
        r = stats[col]
        assert abs(r["ndv_hll"] - r["ndv_exact"]) <= 0.30 * r["ndv_exact"], r


def test_bootstrap_ci_brackets_mean_and_is_calibrated(spark):
    """x5_bootstrap_ci: for every group the sample mean lies inside the
    replica-rank CI, the CI is properly ordered, and its width sits in
    the plausible band around the +-2-standard-error scale, which shrinks
    as 1/sqrt(n) — the bounds scale with each group's size so the test
    holds at any SPARK_GRAFT_TEST_SF_DIR (order-value CV ~0.6 at every
    SF; a degenerate all-equal-weights bug would give width 0, a broken
    ladder far more). Deterministic: two runs bit-equal."""
    spec = registry()["x5_bootstrap_ci"]
    rows = spec.builder(spark, TEST_SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, spec.builder(spark, TEST_SF_DIR).collect())
    )
    n_total = sum(r["n_orders"] for r in rows)
    assert n_total == table(spark, TEST_SF_DIR, "orders").count()
    for r in rows:
        assert r["ci_lo_cents"] < r["ci_hi_cents"], r
        assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"], r
        width = (r["ci_hi_cents"] - r["ci_lo_cents"]) / r["mean_cents"]
        rn = r["n_orders"] ** 0.5
        assert 0.5 / rn < width < 6.0 / rn, (r["o_orderpriority"], width, r["n_orders"])


def test_bm25_search_equals_brute_force(spark):
    """x4_bm25_search must reproduce a transparent python brute force of
    the same fixed-point Okapi BM25 (k1=1.2, b=0.75, micro-unit floored
    contributions) EXACTLY — same top-5 docs, ranks, integer scores, and
    shared-term counts per probe. Exactness holds because every float
    step is one fixed IEEE tree over exact integers (ln/div agree
    bit-for-bit across JVM/CPython libm on this data — the x4_tfidf
    precedent)."""
    import math
    from collections import Counter

    from iii_aibigdata_capstone_spark.operators.textual import (
        BM25_PROBES,
        BM25_TOPK,
    )

    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    tf = {d: Counter(ts) for d, ts in docs.items() if ts}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(tf)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for c in tf.values():
        for t in c:
            df[t] += 1

    def score(q, d):
        s = nsh = 0
        for t in tf[q]:
            if t in tf[d]:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                f = tf[d][t]
                c = idf * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl))))
                s += math.floor(c * 1_000_000 + 0.5)
                nsh += 1
        return s, nsh

    want = []
    for q in range(BM25_PROBES):
        scored = [
            (sc, d)
            for d in tf
            if d != q
            for sc in [score(q, d)]
            if sc[1] > 0
        ]
        scored.sort(key=lambda x: (-x[0][0], x[1]))
        for rk, ((sm, sh), d) in enumerate(scored[:BM25_TOPK], 1):
            want.append((q, rk, d, sm, sh))
    got = [
        (r.query_id, r.rank, r.doc_id, r.score_micro, r.shared_terms)
        for r in registry()["x4_bm25_search"].builder(spark, TEST_SF_DIR).collect()
    ]
    assert sorted(got) == sorted(want)


def test_corr_matrix_matches_numpy(spark):
    """x8_corr_matrix: the one-pass exact-integer-moment correlations must
    agree with numpy.corrcoef over the same features to ~1e-12 (numpy
    sums centered floats, the engine expands the uncentered moments —
    algebraically equal, so only accumulation error separates them), and
    every correlation lies in [-1, 1]."""
    import numpy as np

    from iii_aibigdata_capstone_spark.operators.textual import STOPWORDS

    stop = set(STOPWORDS)
    feats = []
    for r in (
        table(spark, TEST_SF_DIR, "documents")
        .select("text", "n_chars")
        .collect()
    ):
        toks = r.text.split(" ")
        feats.append(
            (
                len(toks),
                sum(t in stop for t in toks),
                len(set(toks)),
                r.n_chars,
            )
        )
    m = np.corrcoef(np.array(feats, dtype=float).T)
    names = ["n_tokens", "n_stop", "n_uniq", "n_chars"]
    idx = {nm: i for i, nm in enumerate(names)}
    rows = registry()["x8_corr_matrix"].builder(spark, TEST_SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        want = m[idx[r.feat_a], idx[r.feat_b]]
        assert abs(r.corr - want) < 1e-12, (r.feat_a, r.feat_b, r.corr, want)
        assert r.n == len(feats)


def test_vad_segments_are_maximal_active_runs(spark):
    """x6_vad_segments invariants against the energy lane it composes:
    the segments partition exactly the non-silent windows, each segment is
    one contiguous run (n_windows == end-start+1), runs are MAXIMAL (the
    windows adjacent to each segment are silent or absent), and the
    per-segment energy/peak aggregates match recomputation."""
    from iii_aibigdata_capstone_spark.operators.multimodal import (
        x6_audio_energy,
        x6_vad_segments,
    )

    wins = {}
    for r in x6_audio_energy(spark, TEST_SF_DIR).collect():
        wins[(r.doc_id, r.win_idx)] = (r.energy, r.peak, r.silent)
    active = {k for k, v in wins.items() if not v[2]}
    covered = set()
    for s in x6_vad_segments(spark, TEST_SF_DIR).collect():
        assert s.n_windows == s.end_win - s.start_win + 1
        seg = {(s.doc_id, w) for w in range(s.start_win, s.end_win + 1)}
        assert seg <= active, (s.doc_id, s.seg_idx)
        assert not (seg & covered), "segments overlap"
        covered |= seg
        for edge in (s.start_win - 1, s.end_win + 1):
            assert (s.doc_id, edge) not in active, "segment not maximal"
        assert s.total_energy == sum(wins[k][0] for k in seg)
        assert s.max_peak == max(wins[k][1] for k in seg)
    assert covered == active, "segments must cover every non-silent window"


def test_scene_cuts_equal_numpy_brute_force(spark):
    """x6_scene_cuts must reproduce a transparent numpy implementation of
    the same algorithm (32-byte frames, 31-bit gradient-sign signatures,
    cut at Hamming >= 20, islands by running cut count) exactly — scene
    spans, counts, and the partition property (scenes tile each doc's
    frames in order, first frame always starts scene 1)."""
    import numpy as np

    from iii_aibigdata_capstone_spark.operators.multimodal import (
        SCENE_CUT_T,
        SCENE_FRAME,
        x6_scene_cuts,
    )

    want = []
    for r in table(spark, TEST_SF_DIR, "documents").select("doc_id", "text").collect():
        arr = np.frombuffer(r.text.encode(), dtype=np.uint8)
        n = len(arr) // SCENE_FRAME
        if not n:
            continue
        frames = arr[: n * SCENE_FRAME].reshape(n, SCENE_FRAME)
        grad = frames[:, 1:] > frames[:, :-1]
        w = np.int64(1) << np.arange(SCENE_FRAME - 1, dtype=np.int64)
        sigs = (grad * w).sum(axis=1)
        scene, start = 0, 0
        for i in range(n):
            cut = i == 0 or bin(int(sigs[i] ^ sigs[i - 1])).count("1") >= SCENE_CUT_T
            if cut:
                if i > 0:
                    want.append((r.doc_id, scene, start, i - 1, i - start))
                scene += 1
                start = i
        want.append((r.doc_id, scene, start, n - 1, n - start))
    got = [
        (s.doc_id, s.scene_idx, s.start_frame, s.end_frame, s.n_frames)
        for s in x6_scene_cuts(spark, TEST_SF_DIR).collect()
    ]
    assert sorted(got) == sorted(want)


def _cdc_chunk_py(tokens):
    """Transparent replica of the CDC chunker: boundary after any token
    whose 60-bit md5 % CDC_MOD == 0; returns list of (chunk_idx, tokens)."""
    import hashlib

    from iii_aibigdata_capstone_spark.operators.dedup import CDC_MOD

    chunks, cur = [], []
    for t in tokens:
        cur.append(t)
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        if h % CDC_MOD == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


def test_cdc_chunks_match_python_replay(spark):
    """x4_cdc_chunks: every (doc_id, chunk_idx, chunk_key, n_tokens,
    start_pos) row equals a transparent python replay of the boundary
    rule, and chunks tile each document exactly."""
    import hashlib

    rows = registry()["x4_cdc_chunks"].builder(spark, TEST_SF_DIR).collect()
    docs = {
        r.doc_id: r.text
        for r in table(spark, TEST_SF_DIR, "documents").collect()
    }
    expect = {}
    for doc_id, text in docs.items():
        pos = 0
        for ci, chunk in enumerate(_cdc_chunk_py(text.split(" "))):
            joined = " ".join(chunk)
            key = int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)
            expect[(doc_id, ci)] = (key, len(chunk), pos)
            pos += len(chunk)
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_key, r.n_tokens, r.start_pos)
        for r in rows
    }
    assert len(rows) == len(got), "duplicate chunk row"
    assert got == expect
    # tiling: per-doc token counts reassemble the document
    from collections import Counter

    per_doc = Counter()
    for (doc_id, _), (_, n, _) in got.items():
        per_doc[doc_id] += n
    assert per_doc == {d: len(t.split(" ")) for d, t in docs.items()}


def test_cdc_insertion_shift_property():
    """THE content-defined property: inserting a token early in a
    document changes only the chunk containing the insertion point —
    every chunk after it keeps an IDENTICAL key (fixed-stride chunking
    would shift and rewrite every downstream chunk)."""
    base = [f"tok{i}za" for i in range(200)]
    chunks_a = _cdc_chunk_py(base)
    assert len(chunks_a) >= 4, "corpus-free fixture must chunk"
    edited = base[:5] + ["INSERTED"] + base[5:]
    chunks_b = _cdc_chunk_py(edited)
    keys_a = [" ".join(c) for c in chunks_a]
    keys_b = [" ".join(c) for c in chunks_b]
    # strip the identical prefix AND suffix; the differing middle must be
    # only the edited chunk region (the inserted token can split one
    # chunk into two) — prefix-stripping keeps the bound independent of
    # where the first boundary happens to fall in the fixture (review r8)
    tail_a, tail_b = keys_a[:], keys_b[:]
    while tail_a and tail_b and tail_a[-1] == tail_b[-1]:
        tail_a.pop(), tail_b.pop()
    while tail_a and tail_b and tail_a[0] == tail_b[0]:
        tail_a.pop(0), tail_b.pop(0)
    assert len(tail_a) <= 1 and len(tail_b) <= 2, (
        "edit perturbed more than the touched chunk region: "
        f"{len(tail_a)}/{len(tail_b)} middle chunks differ"
    )


def test_cdc_dedup_matches_python_replay(spark):
    """x2_cdc_dedup: per-doc novelty profile equals a python replay of
    first-occurrence-keeps over the replayed chunk table; dup_share_micro
    is the exact integer micro-share."""
    import hashlib

    docs = sorted(
        (r.doc_id, r.text)
        for r in table(spark, TEST_SF_DIR, "documents").collect()
    )
    first_seen = set()
    expect = {}
    for doc_id, text in docs:  # ascending doc_id = corpus order
        chunks = _cdc_chunk_py(text.split(" "))
        n_dup = dup_tok = total = 0
        for ci, chunk in enumerate(chunks):
            joined = " ".join(chunk)
            key = int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)
            total += len(chunk)
            if key in first_seen:
                n_dup += 1
                dup_tok += len(chunk)
            else:
                first_seen.add(key)
        expect[doc_id] = (
            len(chunks),
            n_dup,
            total,
            dup_tok,
            (1_000_000 * dup_tok) // total,
        )
    rows = registry()["x2_cdc_dedup"].builder(spark, TEST_SF_DIR).collect()
    got = {
        r.doc_id: (
            r.n_chunks,
            r.n_dup_chunks,
            r.total_tokens,
            r.dup_tokens,
            r.dup_share_micro,
        )
        for r in rows
    }
    assert got == expect


def test_cdc_pack_guard_trips_in_both_engines(spark):
    """The CDC pack overflow guard (WP_DEG_CAP discipline) RAISES in both
    engines past either bound — the oracle cannot catch an overflow (both
    engines compute the identical wrong pack), so the guard is the only
    defense — and stays silent on the in-domain corner."""
    import duckdb
    import pytest
    from pyspark.errors import PySparkException

    from iii_aibigdata_capstone_spark.operators.dedup import (
        CDC_DOC_CAP,
        CDC_PACK,
        _cdc_pack_sql,
    )

    def spark_pack(doc_id, chunk_idx):
        return spark.sql(
            f"SELECT MAX({_cdc_pack_sql('spark')}) AS p FROM VALUES "
            f"(CAST({doc_id} AS BIGINT), CAST({chunk_idx} AS BIGINT)) "
            "AS t(doc_id, chunk_idx)"
        ).collect()[0].p

    def duck_pack(doc_id, chunk_idx):
        return duckdb.sql(
            f"SELECT MAX({_cdc_pack_sql('duckdb')}) AS p FROM (SELECT "
            f"CAST({doc_id} AS BIGINT) AS doc_id, "
            f"CAST({chunk_idx} AS BIGINT) AS chunk_idx)"
        ).fetchone()[0]

    # in-domain corner: identical pack, no raise
    ok = (CDC_DOC_CAP - 1) * CDC_PACK + (CDC_PACK - 1)
    assert spark_pack(CDC_DOC_CAP - 1, CDC_PACK - 1) == ok
    assert duck_pack(CDC_DOC_CAP - 1, CDC_PACK - 1) == ok
    # either bound exceeded -> loud failure, both engines
    for doc_id, chunk_idx in [(CDC_DOC_CAP, 0), (0, CDC_PACK)]:
        with pytest.raises(PySparkException, match="CDC pack overflow"):
            spark_pack(doc_id, chunk_idx)
        with pytest.raises(duckdb.Error, match="CDC pack overflow"):
            duck_pack(doc_id, chunk_idx)


def test_rag_pipeline_structural_contract(spark):
    """x9_rag_pipeline: the fused serving table's internal arithmetic and
    lane contracts — rrf_micro is EXACTLY the integer RRF of the emitted
    lane ranks, ranks are contiguous 1..TOPK per query with descending
    rrf (doc_id tiebreak), every probe query is served, the query doc
    never retrieves itself, and the serving join's metadata matches the
    documents table. (Cross-engine values are pinned by the full oracle;
    this pins the semantics the oracle shares with the builder.)"""
    from iii_aibigdata_capstone_spark.operators.curation import (
        RAG_PROBES,
        RAG_TOPK,
        RRF_K,
        RRF_SCALE,
    )

    rows = registry()["x9_rag_pipeline"].builder(spark, TEST_SF_DIR).collect()
    meta = {
        r.doc_id: (r.source, r.lang)
        for r in table(spark, TEST_SF_DIR, "documents").collect()
    }
    assert {r.query_id for r in rows} == set(range(RAG_PROBES))
    by_q = {}
    for r in rows:
        assert r.doc_id != r.query_id  # both lanes exclude self
        expect_rrf = (RRF_SCALE // (RRF_K + r.bm25_rank) if r.bm25_rank else 0) + (
            RRF_SCALE // (RRF_K + r.cos_rank) if r.cos_rank else 0
        )
        assert r.rrf_micro == expect_rrf, (r.query_id, r.doc_id)
        assert r.rrf_micro > 0  # a served doc came from at least one lane
        assert (r.source, r.lang) == meta[r.doc_id]
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, RAG_TOPK + 1)), q
        # served order is (rrf desc, doc_id asc)
        assert rs == sorted(rs, key=lambda r: (-r.rrf_micro, r.doc_id)), q


def test_ann_eval_matches_lane_intersection(spark):
    """x3_ann_eval: per-query hits must equal the python intersection of
    the two registered lanes' outputs (exact cosine top-3 vs IVF
    multiprobe top-3), recall/MRR must be the exact integer arithmetic of
    those hits, and every probe query must be scored."""
    from iii_aibigdata_capstone_spark.operators.similarity import (
        ANN_EVAL_K,
        N_QUERIES,
    )

    exact = {}
    for r in registry()["x3_cosine_topk"].builder(spark, TEST_SF_DIR).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in (
        registry()["x3_ivf_multiprobe"].builder(spark, TEST_SF_DIR).collect()
    ):
        approx.setdefault(r.query_id, []).append((r.cosine, r.neighbor_id))

    rows = registry()["x3_ann_eval"].builder(spark, TEST_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(range(N_QUERIES))
    for r in rows:
        # reconstruct rank order from the lane's own sort key — collect()
        # row order is not a contract
        ranked = [
            n
            for _c, n in sorted(
                approx[r.query_id], key=lambda t: (-t[0], t[1])
            )
        ]
        want_hits = len(set(ranked) & exact[r.query_id])
        assert r.hits == want_hits, r.query_id
        assert r.recall_micro == (1_000_000 * want_hits) // ANN_EVAL_K
        first = next(
            (i + 1 for i, n in enumerate(ranked) if n in exact[r.query_id]), 0
        )
        assert r.mrr_micro == (1_000_000 // first if first else 0), r.query_id


def test_rag_eval_matches_python_grading(spark):
    """x9_rag_eval pinned against a transparent python grading: the
    production list is the registered x9_rag_pipeline output (same
    _rrf_fuse_topk spelling); the ground-truth fusion is rebuilt in
    python from the shared BM25 lane (collected once — it is exact and
    shared verbatim between the two fusions) + an exhaustive cosine pass
    over the collected embeddings (same LEFT-FOLD accumulation order and
    HALF_UP rounding as the engine's dot/l2_norm/round, so the floats
    are bit-identical); hits, recall@5 and nDCG@5 are integer arithmetic
    on those lists with the precomputed _NDCG_DISC_MICRO discounts."""
    from iii_aibigdata_capstone_spark.operators.curation import (
        _NDCG_DISC_MICRO,
        RAG_LANE_K,
        RAG_PROBES,
        RAG_TOPK,
        RRF_K,
        RRF_SCALE,
        _bm25_doc_ranks,
        _resident_probe_queries,
        rag_index,
    )

    index = rag_index(spark, TEST_SF_DIR)
    _qids, qterms = _resident_probe_queries(spark, index)
    b: dict[int, dict[int, int]] = {}
    for r in _bm25_doc_ranks(index, qterms).collect():
        b.setdefault(r.query_id, {})[r.doc_id] = r.br

    embs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, TEST_SF_DIR, "embeddings").collect()
    }

    fold_dot, fold_norm, rnd6 = replay_fold_dot, replay_fold_norm, replay_rnd6
    norm = {i: fold_norm(v) for i, v in embs.items()}
    truth: dict[int, dict[int, int]] = {}
    for q in range(RAG_PROBES):
        scored = sorted(
            (
                (rnd6(fold_dot(embs[q], embs[d]) / (norm[q] * norm[d])), d)
                for d in embs
                if d != q
            ),
            key=lambda t: (-t[0], t[1]),
        )[:RAG_LANE_K]
        cr = {d: i + 1 for i, (_c, d) in enumerate(scored)}
        bq = b.get(q, {})
        fused = sorted(
            (
                (
                    (RRF_SCALE // (RRF_K + bq[d]) if d in bq else 0)
                    + (RRF_SCALE // (RRF_K + cr[d]) if d in cr else 0),
                    d,
                )
                for d in set(cr) | set(bq)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:RAG_TOPK]
        truth[q] = {d: RAG_TOPK - i for i, (_s, d) in enumerate(fused)}

    prod: dict[int, dict[int, int]] = {}
    for r in registry()["x9_rag_pipeline"].builder(spark, TEST_SF_DIR).collect():
        prod.setdefault(r.query_id, {})[r.rank] = r.doc_id

    rows = registry()["x9_rag_eval"].builder(spark, TEST_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(range(RAG_PROBES))
    for r in rows:
        rel = truth[r.query_id]
        plist = [prod[r.query_id][k] for k in sorted(prod[r.query_id])]
        hits = sum(1 for d in plist if d in rel)
        dcg = sum(
            rel.get(d, 0) * _NDCG_DISC_MICRO[i] for i, d in enumerate(plist)
        )
        idcg = sum(
            v * _NDCG_DISC_MICRO[i]
            for i, v in enumerate(sorted(rel.values(), reverse=True))
        )
        # the compile-time IDCG constant's precondition, ENFORCED (review
        # r11): the truth list must carry exactly RAG_TOPK graded docs —
        # a shorter list would over-score nDCG identically in both
        # engines, invisible to the cross-engine hash
        assert len(rel) == RAG_TOPK, (r.query_id, rel)
        assert r.n_hits == hits, r.query_id
        assert r.recall_micro == 1_000_000 * hits // RAG_TOPK
        assert r.ndcg_micro == (1_000_000 * dcg // idcg if idcg else None)


def test_rag_eval_truth_list_full_at_all_sfs():
    """The _NDCG_IDCG_MICRO constant assumes EVERY probe's ground-truth
    fused list has exactly RAG_TOPK rows at every SF the driver grades —
    enforced here over the oracle's own truth CTE (duckdb-only, the
    calibration boundary-margin pattern), so a corpus that breaks the
    precondition fails loudly here instead of silently over-scoring
    nDCG in both engines at once."""
    import duckdb

    from iii_aibigdata_capstone_spark.operators.curation import (
        RAG_PROBES,
        RAG_TOPK,
        _rag_eval_oracle,
    )

    # run the eval oracle with the final select swapped for a truth count
    sql = _rag_eval_oracle()
    head, sep, _tail = sql.rpartition("SELECT query_id, n_hits,")
    assert sep, "oracle shape changed — update this test's select swap"
    probe_sql = head + "SELECT query_id, COUNT(*) AS n FROM truth GROUP BY 1"
    root = os.path.dirname(TEST_SF_DIR.rstrip("/"))
    checked = 0
    for sf in ("0.001", "0.01", "0.1"):
        d = os.path.join(root, f"sf{sf}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            continue
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        counts = dict(con.sql(probe_sql).fetchall())
        assert counts == {q: RAG_TOPK for q in range(RAG_PROBES)}, (sf, counts)
        checked += 1
    assert checked, f"no testdata SFs under {root}"


def test_data_factory_stage_gates_replay(spark):
    """Replay every python-checkable gate of the x9_data_factory manifest
    at sf0.001: quality logit, exact-dup canonicality, benchmark holdout +
    5-gram decontamination, per-source rank contiguity/order, context-bin
    cumsum, and content-addressed shard/pos. (The DSIR weights and the
    LSH-verified near-dup stage are covered by the full DuckDB oracle —
    this pin covers the stage COMPOSITION the way the fuzzy-pipeline
    invariants test does.)"""
    import hashlib

    from iii_aibigdata_capstone_spark.operators.analytics import (
        MANIFEST_SHARDS,
        PACK_BIN_TOKENS,
    )
    from iii_aibigdata_capstone_spark.operators.textual import (
        BENCH_HOLDOUT_MOD,
        QUALITY_MODEL,
        STOPWORDS,
    )

    rows = registry()["x9_data_factory"].builder(spark, TEST_SF_DIR).collect()
    assert rows, "factory selected nothing at test SF"
    docs = {
        r.doc_id: r for r in table(spark, TEST_SF_DIR, "documents").collect()
    }
    stop = frozenset(STOPWORDS)

    def logit(d):
        ts = d.text.split(" ")
        return (
            QUALITY_MODEL["bias"]
            + QUALITY_MODEL["n_tokens"] * len(ts)
            + QUALITY_MODEL["n_stop"] * sum(t in stop for t in ts)
            + QUALITY_MODEL["n_uniq"] * len(set(ts))
            + QUALITY_MODEL["n_chars"] * d.n_chars
        )

    def g5(text):
        ts = text.split(" ")
        return (
            {" ".join(ts[i : i + 5]) for i in range(len(ts) - 4)}
            if len(ts) >= 5
            else set()
        )

    good = {i: d for i, d in docs.items() if logit(d) >= 0}
    bench = set()
    for i, d in docs.items():
        if i % BENCH_HOLDOUT_MOD == 0:
            bench |= g5(d.text)

    for r in rows:
        d = docs[r.doc_id]
        # stage 1: the quality gate passed
        assert logit(d) >= 0, r.doc_id
        # stage 2a: exact-canonical — no smaller GOOD doc has identical text
        assert not any(
            j < r.doc_id and g.text == d.text for j, g in good.items()
        ), r.doc_id
        # stage 3: not in the holdout, and shares no 5-gram with it
        assert r.doc_id % BENCH_HOLDOUT_MOD != 0, r.doc_id
        assert not (g5(d.text) & bench), r.doc_id
        assert r.n_tokens == len(d.text.split(" ")), r.doc_id

    # stage 4: per source the selected set is the rank prefix 1..n in
    # (logw desc, doc_id asc) order
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: (-r.logw, r.doc_id))
        assert [r.src_rank for r in rs] == list(range(1, len(rs) + 1)), source
        # stage 5: bins are the cumsum-before-me // budget in doc_id order
        rs.sort(key=lambda r: r.doc_id)
        acc = 0
        for r in rs:
            assert r.bin == acc // PACK_BIN_TOKENS, (source, r.doc_id)
            acc += r.n_tokens

    # stage 6: content-addressed shards — pos is contiguous hash order
    by_shard = {}
    for r in rows:
        h = hashlib.md5(docs[r.doc_id].text.encode()).hexdigest()
        assert r.shard == int(h[:8], 16) % MANIFEST_SHARDS, r.doc_id
        by_shard.setdefault(r.shard, []).append((h, r.doc_id, r.pos))
    for shard, entries in by_shard.items():
        entries.sort(key=lambda e: (e[0], e[1]))
        assert [e[2] for e in entries] == list(range(1, len(entries) + 1)), shard


def test_dedup_eval_replays_band_arithmetic(spark):
    """x2_dedup_eval pinned against a transparent python replay of the
    WHOLE evaluation at sf0.001: shingle sets, exact-Jaccard ground
    truth, the md5-affine minhash signatures and band keys (the same
    constants the engine lanes use), candidate generation, verification,
    and the integer recall/precision arithmetic."""
    import hashlib
    from itertools import combinations

    from iii_aibigdata_capstone_spark.operators.dedup import (
        _MINHASH_COEFFS,
        _MINHASH_P,
        N_MINHASH_BANDS,
        N_MINHASH_SEEDS,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    sh = {}
    lang_of = {}
    for d in docs:
        ts = d.text.split(" ")
        if len(ts) >= 3:
            grams = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
            if grams:
                sh[d.doc_id] = grams
                lang_of[d.doc_id] = d.lang

    def jac(x, y):
        inter = len(sh[x] & sh[y])
        return inter / (len(sh[x]) + len(sh[y]) - inter)

    ids = sorted(sh)
    true_pairs = {
        (x, y)
        for x, y in combinations(ids, 2)
        if lang_of[x] == lang_of[y] and (sh[x] & sh[y]) and jac(x, y) >= 0.5
    }

    def bands(doc):
        sigs = []
        for a, b, c in _MINHASH_COEFFS:
            best = None
            for s in sh[doc]:
                h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                v = (a * (h & ((1 << 30) - 1)) + b * (h >> 30) + c) % _MINHASH_P
                best = v if best is None or v < best else best
            sigs.append(best)
        return [
            tuple(sigs[i] for i in range(N_MINHASH_SEEDS) if i % N_MINHASH_BANDS == j)
            for j in range(N_MINHASH_BANDS)
        ]

    bnd = {d: bands(d) for d in ids}
    cand = {
        (x, y)
        for x, y in combinations(ids, 2)
        if lang_of[x] == lang_of[y]
        and any(bx == by for bx, by in zip(bnd[x], bnd[y]))
    }
    verified = {p for p in cand if jac(*p) >= 0.5}
    assert verified <= true_pairs  # the subset identity the lane relies on

    want = {}
    langs = {lang_of[x] for x, _ in true_pairs} | {lang_of[x] for x, _ in cand}
    for lg in langs:
        nt = sum(lang_of[x] == lg for x, _ in true_pairs)
        nc = sum(lang_of[x] == lg for x, _ in cand)
        nv = sum(lang_of[x] == lg for x, _ in verified)
        want[lg] = (
            nt,
            nc,
            nv,
            1000000 * nv // nt if nt else None,
            1000000 * nv // nc if nc else None,
        )

    got = {
        r.lang: (
            r.n_true_pairs,
            r.n_candidates,
            r.n_verified,
            r.recall_micro,
            r.cand_precision_micro,
        )
        for r in registry()["x2_dedup_eval"].builder(spark, TEST_SF_DIR).collect()
    }
    assert got == want


def test_ivf_pq_respects_cells_and_holds_recall(spark):
    """x3_ivf_pq_topk structural + quality pins: (a) every emitted
    neighbor must live in one of the query's two probed IVF cells (the
    inverted-list restriction is real, not decorative); (b) per query,
    exactly 3 rows ranked by (cosine desc, neighbor_id) — the shared
    rerank contract; (c) recall@3 vs the exact lane >= 0.6 overall.
    Residual encoding (r12) lifted the measured recall to plain IVF's
    own ceiling — 0.9 at sf0.001 / 0.833 at sf0.01, vs 0.8 / 0.73 for
    the former raw-vector codes: the PQ+shortlist cascade now gives up
    ZERO hits vs the uncompressed IVF restriction at test SFs (the
    x3_ivf_pq_eval lane is the driver-hashed record of the same
    number)."""
    from iii_aibigdata_capstone_spark.operators.similarity import (
        N_QUERIES,
        ivf_ranked_cells,
    )

    ranked = ivf_ranked_cells(spark, TEST_SF_DIR).collect()
    assigned = {r.vec_id: r.cid for r in ranked if r.rn == 1}
    probed = {}
    for r in ranked:
        if r.vec_id < N_QUERIES and r.rn <= 2:
            probed.setdefault(r.vec_id, set()).add(r.cid)

    exact = {}
    for r in registry()["x3_cosine_topk"].builder(spark, TEST_SF_DIR).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    rows = registry()["x3_ivf_pq_topk"].builder(spark, TEST_SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert assigned[r.neighbor_id] in probed[r.query_id], (
            r.query_id,
            r.neighbor_id,
        )
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.cosine, r.neighbor_id))
    assert set(by_q) == set(range(N_QUERIES))
    hits = tot = 0
    for q, lst in by_q.items():
        assert len(lst) == 3, q
        assert lst == sorted(lst, key=lambda t: (-t[0], t[1])), q
        hits += len({n for _c, n in lst} & exact[q])
        tot += 3
    assert hits / tot >= 0.6, (hits, tot)


def test_truncation_eval_matches_python_replay(spark):
    """x3_truncation_eval pinned against a transparent python grading:
    both rank lists rebuilt from the collected embeddings with
    bit-identical float semantics (left-fold dot/norm accumulation in
    index order — the engine's F.aggregate order — and HALF_UP rounding
    of the shortest double repr, BigDecimal.valueOf semantics), then
    hits/recall/MRR as integer arithmetic on those lists."""
    from iii_aibigdata_capstone_spark.operators.similarity import (
        ANN_EVAL_K,
        N_QUERIES,
        TRUNC_DIM,
        TRUNC_WEIGHTS,
    )

    fold_dot, rnd6 = replay_fold_dot, replay_rnd6
    # the simulated-MR corpus: the lane's own per-dim decay literals
    # applied with the same one IEEE multiply per component
    vecs = {
        r.vec_id: [float(x) * w for x, w in zip(r.embedding, TRUNC_WEIGHTS)]
        for r in table(spark, TEST_SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def topk(dims):
        sliced = {i: v[:dims] for i, v in vecs.items()}
        norms = {i: replay_fold_norm(v) for i, v in sliced.items()}
        out = {}
        for q in range(N_QUERIES):
            scored = [
                (rnd6(fold_dot(sliced[q], v) / (norms[q] * norms[i])), i)
                for i, v in sliced.items()
                if i != q
            ]
            scored.sort(key=lambda t: (-t[0], t[1]))
            out[q] = [i for _c, i in scored[:ANN_EVAL_K]]
        return out

    full, trunc = topk(len(next(iter(vecs.values())))), topk(TRUNC_DIM)
    rows = registry()["x3_truncation_eval"].builder(spark, TEST_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(range(N_QUERIES))
    for r in rows:
        want_hits = len(set(trunc[r.query_id]) & set(full[r.query_id]))
        assert r.hits == want_hits, r.query_id
        assert r.recall_micro == (1_000_000 * want_hits) // ANN_EVAL_K
        first = next(
            (
                i + 1
                for i, n in enumerate(trunc[r.query_id])
                if n in set(full[r.query_id])
            ),
            0,
        )
        assert r.mrr_micro == (1_000_000 // first if first else 0), r.query_id


def test_decontam_eval_matches_python_replay(spark):
    """x4_decontam_eval pinned against a transparent python replay of
    the whole eval: 5-gram geometry (distinct, docs with >= 5 tokens),
    the BENCH_HOLDOUT_MOD bench/corpus split, the md5-bucket sample (first 8 hex chars
    mod DECON_SAMPLE_MOD — hashlib draws the same subset as both
    engines), truth severity buckets, and integer recall."""
    import hashlib

    from iii_aibigdata_capstone_spark.operators.textual import (
        BENCH_HOLDOUT_MOD,
        DECON_SAMPLE_MOD,
    )

    docs = {
        r.doc_id: r.text
        for r in table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    grams = {}
    for d, text in docs.items():
        t = text.split(" ")
        if len(t) >= 5:
            grams[d] = {
                " ".join(t[i : i + 5]) for i in range(len(t) - 4)
            }
    bench_g = set().union(
        *(g for d, g in grams.items() if d % BENCH_HOLDOUT_MOD == 0)
    ) if any(d % BENCH_HOLDOUT_MOD == 0 for d in grams) else set()
    sampled = {
        g
        for g in bench_g
        if int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DECON_SAMPLE_MOD
        == 0
    }
    buckets = {}
    for d, g in grams.items():
        if d % BENCH_HOLDOUT_MOD == 0:
            continue
        n_shared = len(g & bench_g)
        if n_shared == 0:
            continue
        sev = min(n_shared, 4)
        n_docs, n_det = buckets.get(sev, (0, 0))
        buckets[sev] = (n_docs + 1, n_det + (1 if g & sampled else 0))

    rows = registry()["x4_decontam_eval"].builder(spark, TEST_SF_DIR).collect()
    got = {r.sev_bucket: (r.n_docs, r.n_detected, r.recall_micro) for r in rows}
    assert set(got) == set(buckets)
    for sev, (n_docs, n_det) in buckets.items():
        assert got[sev] == (n_docs, n_det, (1_000_000 * n_det) // n_docs), sev


def test_ivf_pq_eval_matches_lane_intersection(spark):
    """x3_ivf_pq_eval: per-query hits must equal the python intersection
    of the two registered lanes' outputs (exact cosine top-3 vs the
    IVF-PQ cascade top-3), recall/MRR the exact integer arithmetic of
    those hits, every probe scored — the test_ann_eval pattern pointed
    at the composed index."""
    from iii_aibigdata_capstone_spark.operators.similarity import (
        ANN_EVAL_K,
        N_QUERIES,
    )

    exact = {}
    for r in registry()["x3_cosine_topk"].builder(spark, TEST_SF_DIR).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in registry()["x3_ivf_pq_topk"].builder(spark, TEST_SF_DIR).collect():
        approx.setdefault(r.query_id, []).append((r.cosine, r.neighbor_id))

    rows = registry()["x3_ivf_pq_eval"].builder(spark, TEST_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(range(N_QUERIES))
    for r in rows:
        ranked = [
            n
            for _c, n in sorted(approx[r.query_id], key=lambda t: (-t[0], t[1]))
        ]
        want_hits = len(set(ranked) & exact[r.query_id])
        assert r.hits == want_hits, r.query_id
        assert r.recall_micro == (1_000_000 * want_hits) // ANN_EVAL_K
        first = next(
            (i + 1 for i, n in enumerate(ranked) if n in exact[r.query_id]), 0
        )
        assert r.mrr_micro == (1_000_000 // first if first else 0), r.query_id


def test_ingest_compaction_fate_map(spark):
    """x1_ingest_compaction pins, on top of the oracle hash: (a) the map
    is TOTAL over retained — batch 1-3 rows are exactly the growing
    lane's admitted sets and batch 0 is every resident; (b) the keep
    rule holds: within each keep_id group the keeper is the longest doc
    (tie: lowest id) and the ONLY kept row, and every exact dup group
    (same md5 text, recomputed transparently here) collapses into one
    keep_id group; (c) non-vacuous: compaction drops rows (kept=0
    exists) — the within-segment pairs admission's GRANULARITY CONTRACT
    deliberately leaves behind; (d) every dropped doc's keep_id is a
    kept retained doc."""
    import hashlib

    rows = registry()["x1_ingest_compaction"].builder(spark, TEST_SF_DIR).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == len(rows), "fate map must be one row per retained doc"

    # (a) totality vs the growing lane + residents
    grown = registry()["x1_ingest_growing"].builder(spark, TEST_SF_DIR).collect()
    want_admitted = {(r.batch_no, r.doc_id) for r in grown}
    got_admitted = {(r.batch_no, r.doc_id) for r in rows if r.batch_no != 0}
    assert got_admitted == want_admitted
    docs = {
        r.doc_id: (r.text, r.n_chars)
        for r in table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    }
    assert {r.doc_id for r in rows if r.batch_no == 0} == {
        d for d in docs if d % 4 == 0
    }

    # (b) keep rule per keep_id group + exact-dup collapse
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r.keep_id, []).append(r)
    for keeper, members in groups.items():
        assert by_id[keeper].kept == 1
        best = min(members, key=lambda r: (-docs[r.doc_id][1], r.doc_id))
        # keeper must be best-by-rule among the EXACT SURVIVORS of the
        # group; exact-dropped members can be longer only if their canon
        # text ties (same text => same length), so best-overall is safe
        assert best.doc_id == keeper, (keeper, [m.doc_id for m in members])
        assert sum(m.kept for m in members) == 1
    canon_of: dict[str, int] = {}
    for d in sorted(by_id):
        canon_of.setdefault(hashlib.md5(docs[d][0].encode()).hexdigest(), d)
    for r in rows:
        canon = canon_of[hashlib.md5(docs[r.doc_id][0].encode()).hexdigest()]
        assert r.keep_id == by_id[canon].keep_id, (r.doc_id, canon)

    # (c) non-vacuous + (d) drops point at kept rows
    dropped = [r for r in rows if r.kept == 0]
    assert len(dropped) >= 2, "compaction must actually drop rows at sf0.001"
    for r in dropped:
        assert by_id[r.keep_id].kept == 1
