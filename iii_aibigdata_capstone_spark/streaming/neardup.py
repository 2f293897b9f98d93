"""Streaming near-duplicate detection — the streaming twin of the batch
banded-MinHash lane (SURVEY.md §2.10 ST7-class extension; the reference's
streams are stateless map+lookup, but an ingest firehose for a 100 TB
corpus needs cross-batch dedup state).

Shape:

1. STATELESS signature stage: per document row, word-3-gram array ->
   per-seed minhash signature (`minhash_signature_exprs`, row-level
   array expressions — Structured Streaming allows one stateful operator
   per query, so the signature must not need a pre-aggregation) -> explode
   into the N_MINHASH_BANDS LSH band keys.
2. STATEFUL bucket stage: ``applyInPandasWithState`` keyed by
   ``(lang, band, bkey)``. State = the bucket's previously seen members
   (doc_id + signature). Every arriving doc emits a candidate pair against
   each stored member (and earlier docs of the same micro-batch), with the
   signature-estimated Jaccard (fraction of agreeing components — the
   standard streaming estimate; exact verification is a downstream batch
   join over the candidate set, same as the batch lane's verify stage).

State is bounded: at most ``STATE_CAP`` members are stored (doc_id +
signature) per bucket. A doc arriving at a full bucket is an OVERFLOW
doc: it still pairs against every stored member (so it is always flagged
as a candidate), emits one marker row (``is_overflow=true``,
``doc_b``/``est_jaccard`` null) that downstream consumes to apply the
hot-bucket policy "everything past the cap is a dup of the bucket", and
its doc_id — but not its ~20x larger signature — is appended to the
bucket's overflow-id list so an at-least-once replay of the same input
row emits nothing twice. The overflow-id list has its own cap
(``OVERFLOW_ID_CAP``); past THAT a bucket is saturated and further
arrivals emit ONLY the marker row, untracked — identical docs saturate
all their bands in lockstep (same signature, same band keys), so
dropping them silently would keep hot-bucket dups; the marker-driven
drop policy is idempotent by content, so at-least-once markers in the
saturated regime are safe. Per-bucket state stays hard-bounded and PAIR
emission stays exactly-once unconditionally. Buckets scale with
distinct (band, key) values, so the state store grows with corpus
diversity, not corpus size.

Equality contract (conditional on bucket size): while every bucket stays
at or below ``STATE_CAP`` members, candidates equal the batch LSH's
candidates exactly — a pair lands in the same bucket here iff it lands in
the same band bucket in ``x2_minhash_banded`` (same signatures, same band
keys) — pinned by
tests/test_stateful.py::test_streaming_neardup_matches_batch_candidates,
and candidates -> exact verify reproduces x2_minhash_banded's pairs
(test_streaming_neardup_verified_equals_batch_pairs). For hotter buckets
the streaming output is deliberately NOT the batch output: overflow docs
pair only backward against the ``STATE_CAP`` stored members (never
overflow-overflow), and the marker rows carry the policy instead —
pinned by test_streaming_neardup_hot_bucket_caps_state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import (
    N_MINHASH_BANDS,
    N_MINHASH_SEEDS,
    _minhash_band_keys,
    exact_jaccard_verify,
    minhash_signature_exprs,
)

STATE_CAP = 128
OVERFLOW_ID_CAP = 4096

OUTPUT_SCHEMA = (
    "lang string, band int, doc_a long, doc_b long, est_jaccard double, "
    "is_overflow boolean"
)
STATE_SCHEMA = "doc_ids array<long>, sigs array<string>, ovf_ids array<long>"


def banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, band, bkey, sig) rows — N_MINHASH_BANDS per document. Works on a
    batch OR streaming DataFrame with (doc_id, lang, text) columns; every
    expression is row-level (stateless)."""
    t = F.split(F.col("text"), " ")
    toks = docs.select("doc_id", "lang", t.alias("t")).where(F.size(t) >= 3)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("t")) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + F.lit(1)),
                F.element_at(F.col("t"), i + F.lit(2)),
            ),
        )
    )
    sigs = toks.select("doc_id", "lang", grams.alias("grams")).select(
        "doc_id", "lang", *minhash_signature_exprs("grams")
    )
    sig_str = F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(N_MINHASH_SEEDS)])
    # seed-to-band assignment comes from the batch lane's helper — ONE
    # definition of the banding scheme, or stream and batch bucket apart
    band_keys = [
        F.concat_ws("|", *[F.col(n).cast("string") for n in key.split(", ")])
        for key in _minhash_band_keys(", ")
    ]
    stack_args = ", ".join(
        f"{j}, bk{j}" for j in range(N_MINHASH_BANDS)
    )
    return sigs.select(
        "doc_id",
        "lang",
        sig_str.alias("sig"),
        *[k.alias(f"bk{j}") for j, k in enumerate(band_keys)],
    ).selectExpr(
        "doc_id", "lang", "sig", f"stack({N_MINHASH_BANDS}, {stack_args}) AS (band, bkey)"
    )


def _est_jaccard(sig_a: str, sig_b: str) -> float:
    a, b = sig_a.split(","), sig_b.split(",")
    return sum(x == y for x, y in zip(a, b)) / len(a)


def _make_bucket_fn(state_cap: int, ovf_id_cap: int):
    """Build the stateful bucket function with the caps captured in the
    closure (cloudpickle ships them to executors — module-global caps
    would be re-imported worker-side and untestable)."""

    def _bucket_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lang, band = key[0], key[1]
        doc_ids, sigs, ovf_ids = (
            state.get if state.exists else ([], [], [])
        )
        doc_ids, sigs, ovf_ids = list(doc_ids), list(sigs), list(ovf_ids)
        known = set(doc_ids)
        ovf_known = set(ovf_ids)
        out_a: list[int | None] = []
        out_b: list[int | None] = []
        out_j: list[float | None] = []
        out_o: list[bool] = []

        def emit_marker(doc_id: int) -> None:
            out_a.append(doc_id)
            out_b.append(None)
            out_j.append(None)
            out_o.append(True)

        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                doc_id = int(doc_id)
                if doc_id in known or doc_id in ovf_known:
                    continue  # replayed input row; already emitted for it
                if len(doc_ids) >= state_cap and len(ovf_ids) >= ovf_id_cap:
                    # Saturated bucket: the overflow-id list is full, so
                    # the marker cannot be tracked for exactly-once — but
                    # DROPPING it would silently KEEP a hot-bucket dup
                    # (identical docs saturate all their bands in
                    # lockstep, so no other band rescues them). The
                    # "drop doc_a" policy is idempotent by content, so
                    # emit the marker at-least-once and store nothing.
                    emit_marker(doc_id)
                    continue
                for prev_id, prev_sig in zip(doc_ids, sigs):
                    out_a.append(min(doc_id, prev_id))
                    out_b.append(max(doc_id, prev_id))
                    out_j.append(_est_jaccard(sig, prev_sig))
                    out_o.append(False)
                if len(doc_ids) < state_cap:
                    doc_ids.append(doc_id)
                    sigs.append(sig)
                    known.add(doc_id)
                else:
                    # overflow: remember the id (idempotent replay) and
                    # emit the policy marker row for downstream
                    ovf_ids.append(doc_id)
                    ovf_known.add(doc_id)
                    emit_marker(doc_id)
        state.update((doc_ids, sigs, ovf_ids))
        if out_a:
            yield pd.DataFrame(
                {
                    "lang": lang,
                    "band": band,
                    "doc_a": pd.array(out_a, dtype="Int64"),
                    "doc_b": pd.array(out_b, dtype="Int64"),
                    "est_jaccard": pd.array(out_j, dtype="Float64"),
                    "is_overflow": out_o,
                }
            )

    return _bucket_fn


def streaming_neardup_candidates(
    docs: DataFrame,
    state_cap: int = STATE_CAP,
    overflow_id_cap: int = OVERFLOW_ID_CAP,
) -> DataFrame:
    """Cross-batch near-dup candidate pairs over a (doc_id, lang, text)
    stream. Emits each bucket-cohabiting pair exactly once (per band),
    with the signature-estimated Jaccard, plus one ``is_overflow=true``
    marker row per doc that arrived at an already-full bucket (see the
    module docstring for the capped-bucket contract; markers degrade to
    at-least-once — still idempotent for the drop policy — once a
    bucket's overflow-id list itself fills).

    NOTE: the r4 state schema (``ovf_ids array<long>``) is incompatible
    with checkpoints written by the pre-r4 code (``overflow long``);
    restarting an old query on this version requires a fresh checkpoint
    directory (the state store cannot migrate column types)."""
    return (
        banded_signatures(docs)
        .groupBy("lang", "band", "bkey")
        .applyInPandasWithState(
            _make_bucket_fn(state_cap, overflow_id_cap),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def verify_candidates_exact(
    candidates: DataFrame,
    shingle_index: DataFrame,
    threshold: float = 0.5,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against a shingle
    index (``(doc_id, lang, s)`` rows — the batch lane's ``shingles()``
    output, persisted as the corpus inverted index in a deployment).
    Batch-side: runs inside ``foreachBatch`` as a stream-static join —
    candidates are the micro-batch's output, the index is the static side,
    and the join keys (doc_id, then shingle value) are all equalities.
    Returns ``(doc_a, doc_b, jaccard)``; signature-estimate false
    positives drop out here, so — while no bucket has exceeded
    ``STATE_CAP`` (module docstring) — the streaming lane's final output
    equals the batch lane's, delegated to the SAME ``exact_jaccard_verify``
    the batch query runs. Overflow marker rows are not pairs and are
    excluded; downstream applies the hot-bucket policy to them directly.

    Per-micro-batch cost (the IngestIndex discipline, r10): the index is
    semi-joined down to THIS batch's candidate doc ids before the
    intersection joins, and a deployment passes ``sizes`` (precomputed
    per-doc shingle counts, maintained with the index) so the verify
    never re-aggregates the resident corpus per batch — without it,
    sizes fall back to an index-wide count per invocation."""
    pairs = candidates.where(~F.col("is_overflow")) if "is_overflow" in candidates.columns else candidates
    pairs = pairs.select("doc_a", "doc_b", "lang")
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    restricted = shingle_index.join(cand_ids, "doc_id", "left_semi")
    if sizes is None:
        # fall back to counting over the RESTRICTED index — candidate
        # docs only, never the whole resident corpus
        sizes = restricted.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return exact_jaccard_verify(pairs, restricted, threshold, sizes=sizes)
