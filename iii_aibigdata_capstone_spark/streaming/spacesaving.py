"""Streaming SpaceSaving heavy hitters (SURVEY.md §2.10 ST7 extension;
the batch relatives are x5_heavy_hitters / x5_countmin_terms) — the fifth
state pattern in the streaming family: first-seen sets (dedup), bounded
trailing windows (z-score/EWMA), MAX-merged registers (HLL), ADDITIVE
counter arrays (Count-Min), and now a BOUNDED CANDIDATE MAP with
min-eviction — the Metwally et al. SpaceSaving summary, the standard
frequent-items structure when the vocabulary is unbounded but only the
top items matter.

Sharding makes it scale-honest: terms hash-partition into SS_SHARDS (8)
shards (the stateful op's group key), each shard runs an independent
CAP=SS_CAP (32) summary over ITS sub-stream — an EXACT partition of the
item space, so shards never interfere, the union of shard summaries is a
valid global summary, and state is fixed at shards x CAP entries no
matter the vocabulary. At 100 TB the same shape holds with more shards;
the single-summary textbook form would be a one-task bottleneck.

Per micro-batch the shard's terms are pre-counted vectorized, then
applied in lexicographic term order (deterministic given arrival
chunking — the honest contract for an order-sensitive summary; the
pytest replays the identical chunking in python and pins every array):
present term -> count += n; free slot -> insert (n, err=0); else evict
the minimum (smallest count, largest term for a total order) -> the
newcomer inherits its count as error (count = min + n, err = min). The
classic guarantees hold per shard and are pinned in the test: est >=
true >= est - err for every kept term, and any term with true count >
shard_total / CAP is present.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SS_SHARDS = 8  # term-space partitions (the stateful op's key)
SS_CAP = 32  # summary capacity per shard

OUTPUT_SCHEMA = (
    "shard long, terms array<string>, counts array<long>, errs array<long>"
)
STATE_SCHEMA = "terms array<string>, counts array<long>, errs array<long>"


def apply_spacesaving(
    summary: dict[str, tuple[int, int]], adds: list[tuple[str, int]], cap: int
) -> None:
    """Apply (term, n) increments to a SpaceSaving summary in place —
    shared verbatim by the executor kernel and the pytest python replay
    (one copy of the eviction rule, the cms_hash_col discipline)."""
    for term, n in adds:
        if term in summary:
            c, e = summary[term]
            summary[term] = (c + n, e)
        elif len(summary) < cap:
            summary[term] = (n, 0)
        else:
            # evict the minimum: smallest count, largest term (total order)
            victim = min(summary, key=lambda t: (summary[t][0], _neg(t)))
            vc, _ve = summary.pop(victim)
            summary[term] = (vc + n, vc)


def _neg(t: str) -> tuple[int, ...]:
    """Reverse-lexicographic key so (count asc, term desc) is a min().
    The trailing sentinel (larger than any negated byte, which are all
    <= 0) makes a proper prefix compare AFTER its extensions — without
    it min() would pick 'ab' over 'abc', i.e. the lexicographically
    SMALLER of the two, contradicting the documented term-desc order."""
    return tuple(-b for b in t.encode()) + (1,)


def _ss_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    shard = int(key[0])
    if state.exists:
        terms, counts, errs = state.get
        summary = {t: (int(c), int(e)) for t, c, e in zip(terms, counts, errs)}
    else:
        summary = {}
    # count across ALL Arrow chunks before folding: the documented unit of
    # application is the MICRO-BATCH, and pdfs yields multiple chunks once
    # a shard's rows exceed maxRecordsPerBatch (~10k) — folding per chunk
    # would make the summary depend on an Arrow buffer size, break the
    # pytest replay at larger SFs, and void the batch==single-micro-batch
    # twin contract (review r9). Counts are summed chunk-by-chunk (unlike
    # _ewma_fn, SpaceSaving needs no row order, only totals) so peak
    # memory is O(distinct terms), never O(rows).
    counts = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        c = pdf.groupby("term").size()
        counts = c if counts is None else counts.add(c, fill_value=0)
    if counts is None:
        return
    adds = sorted((t, int(n)) for t, n in counts.items())  # lexicographic
    apply_spacesaving(summary, adds, SS_CAP)
    kept = sorted(summary)  # deterministic emission order
    state.update(
        (
            kept,
            [summary[t][0] for t in kept],
            [summary[t][1] for t in kept],
        )
    )
    yield pd.DataFrame(
        {
            "shard": [shard],
            "terms": [kept],
            "counts": [[summary[t][0] for t in kept]],
            "errs": [[summary[t][1] for t in kept]],
        }
    )


def ss_shard_col(term_col) -> F.Column:
    """The term's shard: 60-bit md5 mod {SS_SHARDS} — ONE spelling shared
    by the streaming stateful op and the batch ``x5_spacesaving_topk``
    twin (the cms_hash_col discipline: the batch==stream property cannot
    drift while both lanes call this)."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 15), 16, 10).cast("long")
        % SS_SHARDS
    )


def streaming_spacesaving(docs: DataFrame) -> DataFrame:
    """Sharded SpaceSaving summaries over a streaming (doc_id, text)
    frame — one stateful op keyed by term shard; emits each shard's full
    updated summary per micro-batch (latest emission = summary-so-far)."""
    terms = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    return (
        terms.select(ss_shard_col(F.col("term")).alias("shard"), "term")
        .groupBy("shard")
        .applyInPandasWithState(
            _ss_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
