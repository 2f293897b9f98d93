"""Stateful streaming operator tests: state must persist ACROSS micro-batches
(two files -> two batches via maxFilesPerTrigger) and across query restarts
(same checkpoint)."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from iii_aibigdata_capstone_spark.catalog import table
from iii_aibigdata_capstone_spark.streaming.stateful import (
    first_seen_dedup,
    running_totals,
)

from .conftest import TEST_SF_DIR

EVENT_DDL = "event_id long, user_id long, event_type string, value double"


def _events_subset(spark, n=60):
    return (
        table(spark, TEST_SF_DIR, "events")
        .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))
        .orderBy("event_id")
        .limit(n)
    )


def _write_batches(spark, df, d):
    """Two json files -> two deterministic micro-batches (odd/even split,
    duplicated keys across both)."""
    for part in (0, 1):
        df.where(F.col("event_id") % 2 == part).coalesce(1).write.mode("append").json(d)


def _stream(spark, d):
    return (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )


def test_first_seen_dedup_across_batches(spark):
    src = tempfile.mkdtemp(prefix="stateful_src_")
    chk = tempfile.mkdtemp(prefix="stateful_chk_")
    df = _events_subset(spark)
    _write_batches(spark, df, src)

    q = (
        first_seen_dedup(_stream(spark, src))
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"

    got = spark.sql("SELECT user_id, event_type FROM first_seen").collect()
    keys = [(r.user_id, r.event_type) for r in got]
    assert len(keys) == len(set(keys)), "a key was emitted more than once"
    expected = {
        (r.user_id, r.event_type)
        for r in df.select("user_id", "event_type").distinct().collect()
    }
    assert set(keys) == expected, "every distinct key must be emitted exactly once"


def test_state_survives_query_restart(spark):
    src = tempfile.mkdtemp(prefix="stateful_src2_")
    chk = tempfile.mkdtemp(prefix="stateful_chk2_")
    df = _events_subset(spark)

    def run(name):
        rows = []

        def capture(batch, batch_id):
            rows.extend(batch.select("user_id", "event_type").collect())

        q = (
            first_seen_dedup(_stream(spark, src))
            .writeStream.foreachBatch(capture)  # memory sink can't recover a checkpoint
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"
        return rows

    # batch 1: evens only
    df.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").json(src)
    first = run("restart_a")
    # batch 2 (new query, same checkpoint): odds, whose keys overlap evens'
    df.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").json(src)
    second = run("restart_b")

    first_keys = {(r.user_id, r.event_type) for r in first}
    second_keys = {(r.user_id, r.event_type) for r in second}
    assert not (first_keys & second_keys), (
        "keys emitted before the restart must not re-emit after it"
    )
    expected = {
        (r.user_id, r.event_type)
        for r in df.select("user_id", "event_type").distinct().collect()
    }
    assert first_keys | second_keys == expected


def test_running_totals_accumulate(spark):
    src = tempfile.mkdtemp(prefix="stateful_src3_")
    chk = tempfile.mkdtemp(prefix="stateful_chk3_")
    df = _events_subset(spark)
    _write_batches(spark, df, src)

    q = (
        running_totals(_stream(spark, src))
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"

    # last emission per user must equal the batch aggregate
    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS tv FROM running GROUP BY user_id"
    ).collect()
    expected = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert {r.user_id: (r.n, round(r.tv, 2)) for r in got} == expected


def test_drop_duplicates_within_watermark(spark):
    """The built-in streaming dedup (dropDuplicatesWithinWatermark) beside
    the custom first-seen operator: duplicates across micro-batches within
    the watermark horizon collapse to one row, matching batch distinct."""
    src = tempfile.mkdtemp(prefix="stateful_src4_")
    chk = tempfile.mkdtemp(prefix="stateful_chk4_")
    from iii_aibigdata_capstone_spark.catalog import table
    import pyspark.sql.functions as F2

    df = (
        table(spark, TEST_SF_DIR, "events")
        .select("event_id", "user_id", "event_type",
                F2.col("ts").cast("timestamp").alias("ts"))
        .orderBy("event_id")
        .limit(80)
    )
    for part in (0, 1):  # duplicate keys across the two files
        df.where(F2.col("event_id") % 2 == part).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = (
        stream.withWatermark("ts", "10 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"
    got = [(r.user_id, r.event_type) for r in spark.sql("SELECT * FROM wm_dedup").collect()]
    want = {(r.user_id, r.event_type) for r in df.select("user_id", "event_type").distinct().collect()}
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_streaming_neardup_matches_batch_candidates(spark):
    """The stateful LSH bucket operator must surface EXACTLY the batch
    banded-MinHash candidate set, no matter how the docs are split across
    micro-batches (state carries earlier batches' bucket members), and the
    verified x2_minhash_banded pairs must all appear among the candidates
    (banding candidates are a superset of verified near-dups)."""
    import tempfile

    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.neardup import (
        banded_signatures,
        streaming_neardup_candidates,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "lang", "text")
    d = tempfile.mkdtemp(prefix="neardup_src_")
    for part in range(3):  # three files -> three micro-batches
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    rows = []
    q = (
        streaming_neardup_candidates(stream)
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="neardup_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()
    got = {(r.band, r.doc_a, r.doc_b) for r in rows}
    assert len(got) == len(rows), "a bucket emitted the same pair twice"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0

    bs = banded_signatures(docs)
    a, b = bs.alias("a"), bs.alias("b")
    want = {
        (r.band, r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .collect()
    }
    assert got == want, (got - want, want - got)

    pair_set = {(da, db) for _, da, db in got}
    for r in registry()["x2_minhash_banded"].builder(spark, TEST_SF_DIR).collect():
        assert (r.doc_a, r.doc_b) in pair_set


def test_streaming_neardup_verified_equals_batch_pairs(spark):
    """Candidates -> exact-verify (stream-static join in foreachBatch)
    must reproduce x2_minhash_banded's verified pairs exactly: same
    candidates (previous test), same exact-Jaccard filter."""
    import tempfile

    from iii_aibigdata_capstone_spark.operators.dedup import shingles
    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.neardup import (
        streaming_neardup_candidates,
        verify_candidates_exact,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "lang", "text")
    d = tempfile.mkdtemp(prefix="neardup_v_src_")
    for part in range(2):
        docs.where(F.col("doc_id") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    index = shingles(spark, TEST_SF_DIR).localCheckpoint()  # the static side
    verified: set[tuple] = set()

    def verify(batch_df, _id):
        for r in verify_candidates_exact(batch_df, index).collect():
            verified.add((r.doc_a, r.doc_b, r.jaccard))

    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_neardup_candidates(stream)
        .writeStream.foreachBatch(verify)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="neardup_v_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()

    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry()["x2_minhash_banded"].builder(spark, TEST_SF_DIR).collect()
    }
    assert verified == want, (verified - want, want - verified)


def test_streaming_neardup_state_survives_restart(spark):
    """Bucket state must recover from the checkpoint: docs arriving after a
    query restart still pair against members stored BEFORE the restart,
    no pair is emitted twice, and the union equals the batch candidate
    set (the effectively-once contract of the streaming dedup lane)."""
    from iii_aibigdata_capstone_spark.streaming.neardup import (
        banded_signatures,
        streaming_neardup_candidates,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "lang", "text")
    src = tempfile.mkdtemp(prefix="neardup_rs_src_")
    chk = tempfile.mkdtemp(prefix="neardup_rs_chk_")

    def run():
        rows = []
        q = (
            streaming_neardup_candidates(
                spark.readStream.schema("doc_id long, lang string, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        return rows

    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    first = run()
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    second = run()

    first_set = {(r.band, r.doc_a, r.doc_b) for r in first}
    second_set = {(r.band, r.doc_a, r.doc_b) for r in second}
    assert not (first_set & second_set), "a pair re-emitted after restart"

    bs = banded_signatures(docs)
    a, b = bs.alias("a"), bs.alias("b")
    want = {
        (r.band, r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .collect()
    }
    assert first_set | second_set == want


def test_streaming_neardup_hot_bucket_caps_state(spark):
    """The capped-bucket contract for a degenerate bucket (150 identical
    docs): pairs are emitted only against the first STATE_CAP stored
    members (O(cap * n) per band, not the batch lane's O(n^2)); every doc
    past the cap additionally emits exactly one is_overflow marker row
    carrying the 'past the cap is a dup of the bucket' policy; and an
    at-least-once redelivery of overflow docs emits NOTHING again (their
    ids are tracked in state)."""
    import tempfile

    from iii_aibigdata_capstone_spark.streaming.neardup import (
        N_MINHASH_BANDS,
        STATE_CAP,
        streaming_neardup_candidates,
    )

    n = 150
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, "en", text) for i in range(n)], "doc_id long, lang string, text string"
    )
    d = tempfile.mkdtemp(prefix="neardup_hot_")
    chk = tempfile.mkdtemp(prefix="neardup_hot_ck_")

    def run():
        rows = []
        q = (
            streaming_neardup_candidates(
                spark.readStream.schema("doc_id long, lang string, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        return rows

    docs.where(F.col("doc_id") < 100).coalesce(1).write.mode("append").parquet(d)
    docs.where(F.col("doc_id") >= 100).coalesce(1).write.mode("append").parquet(d)
    rows = run()

    pairs = [r for r in rows if not r.is_overflow]
    markers = [r for r in rows if r.is_overflow]
    # per band: the first STATE_CAP docs all pair with each other; the
    # (n - STATE_CAP) overflow docs each pair against the stored CAP only
    per_band = STATE_CAP * (STATE_CAP - 1) // 2 + (n - STATE_CAP) * STATE_CAP
    assert len(pairs) == N_MINHASH_BANDS * per_band, (len(pairs), per_band)
    assert all(r.est_jaccard == 1.0 for r in pairs)
    # exactly one marker per overflow doc per band, and the markers name
    # exactly the docs past the cap — stored-members ∪ marker-docs covers
    # every doc, so the downstream policy loses nothing
    assert len(markers) == N_MINHASH_BANDS * (n - STATE_CAP)
    marked = {r.doc_a for r in markers}
    assert len(marked) == n - STATE_CAP
    assert all(r.doc_b is None and r.est_jaccard is None for r in markers)
    stored = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert stored | marked == set(range(n))

    # at-least-once redelivery of the overflow docs: nothing re-emitted
    docs.where(F.col("doc_id") >= 100).coalesce(1).write.mode("append").parquet(d)
    assert run() == []


def test_streaming_neardup_saturated_bucket_still_marks(spark):
    """Past BOTH caps (members + overflow ids) a bucket is saturated:
    arrivals must STILL emit the is_overflow marker (identical docs
    saturate every band in lockstep, so dropping them would silently keep
    hot-bucket dups), just untracked — so a redelivery re-emits only
    markers (at-least-once, idempotent for the drop policy) and never any
    pair."""
    import tempfile

    from iii_aibigdata_capstone_spark.streaming.neardup import (
        N_MINHASH_BANDS,
        streaming_neardup_candidates,
    )

    state_cap, ovf_cap = 3, 2
    n = 8  # 3 stored + 2 tracked overflow + 3 saturated arrivals
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, "en", text) for i in range(n)], "doc_id long, lang string, text string"
    )
    d = tempfile.mkdtemp(prefix="neardup_sat_")
    chk = tempfile.mkdtemp(prefix="neardup_sat_ck_")

    def run(df):
        rows = []
        df.coalesce(1).write.mode("append").parquet(d)
        q = (
            streaming_neardup_candidates(
                spark.readStream.schema("doc_id long, lang string, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(d),
                state_cap=state_cap,
                overflow_id_cap=ovf_cap,
            )
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        return rows

    rows = run(docs)
    pairs = [r for r in rows if not r.is_overflow]
    markers = [r for r in rows if r.is_overflow]
    # pairs: stored members all-pairs + tracked-overflow docs backward vs
    # stored; saturated arrivals emit NO pairs (marker only)
    per_band = state_cap * (state_cap - 1) // 2 + ovf_cap * state_cap
    assert len(pairs) == N_MINHASH_BANDS * per_band
    # markers: one per non-stored doc per band — INCLUDING the saturated
    # arrivals past the overflow-id cap
    assert len(markers) == N_MINHASH_BANDS * (n - state_cap)
    assert {r.doc_a for r in markers} == set(range(state_cap, n))

    # redelivery: tracked docs emit nothing; saturated docs re-emit their
    # marker only (at-least-once), never a pair
    again = run(docs.where(F.col("doc_id") >= state_cap))
    assert [r for r in again if not r.is_overflow] == []
    sat_ids = set(range(state_cap + ovf_cap, n))
    assert {r.doc_a for r in again if r.is_overflow} == sat_ids


def test_streaming_sessions_equal_batch(spark):
    """Custom stateful sessionization with EVENT-TIME TIMEOUTS: closed
    sessions stream out as the watermark passes their gap, state is
    evicted, and the emitted (user, start, end, n_events) set equals the
    batch gaps-and-islands sessions exactly — only emission time differs.
    Sentinel far-future rows advance the watermark so every session closes
    before the stream drains."""
    import tempfile

    from datetime import datetime, timezone

    from iii_aibigdata_capstone_spark.streaming.sessions import (
        SESSION_GAP_US,
        streaming_sessions,
    )

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .where(F.col("user_id") < 40)  # keep the group count test-sized
    )
    rows = ev.orderBy("ts", "event_id").collect()
    assert rows, "no events"
    max_us = max(int(r.ts.timestamp() * 1_000_000) for r in rows)

    d = tempfile.mkdtemp(prefix="sess_src_")
    third = len(rows) // 3 or 1
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for chunk in chunks:
        if chunk:
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
    # two sentinel batches: the first advances the watermark past every
    # open session's timeout, the second gives the engine a batch in
    # which those timeouts fire
    for k in (1, 2):
        flush_ts = datetime.fromtimestamp(
            (max_us + k * 7_200_000_000) / 1_000_000, tz=timezone.utc
        ).replace(tzinfo=None)
        spark.createDataFrame(
            [(-1, flush_ts, -k)],
            "user_id long, ts timestamp, event_id long",
        ).coalesce(1).write.mode("append").parquet(d)

    got_rows = []
    q = (
        streaming_sessions(
            spark.readStream.schema("user_id long, ts timestamp, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sess_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in got_rows
        if r.user_id >= 0
    }

    # batch gaps-and-islands reference
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id)
        )
    want = set()
    for uid, evs in by_user.items():
        evs.sort()
        start = last = None
        n = 0
        for t, _eid in evs:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_US:
                want.add((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        want.add((uid, start, last, n))
    assert got == want, (len(got), len(want), list(got - want)[:3], list(want - got)[:3])


def test_streaming_sessions_survive_restart(spark):
    """Session state (including pending event-time timeouts) must recover
    from the checkpoint: a session OPEN at shutdown closes correctly after
    restart — events arriving post-restart extend it or its timeout fires
    from recovered state — no session emits twice, and the union equals
    the batch sessions."""
    import tempfile
    from datetime import datetime, timezone

    from iii_aibigdata_capstone_spark.streaming.sessions import (
        SESSION_GAP_US,
        streaming_sessions,
    )

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .where(F.col("user_id") < 25)
    )
    rows = ev.orderBy("ts", "event_id").collect()
    max_us = max(int(r.ts.timestamp() * 1_000_000) for r in rows)
    d = tempfile.mkdtemp(prefix="sess_rs_src_")
    chk = tempfile.mkdtemp(prefix="sess_rs_chk_")

    def run():
        got = []
        q = (
            streaming_sessions(
                spark.readStream.schema("user_id long, ts timestamp, event_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        return got

    half = len(rows) // 2
    spark.createDataFrame(rows[:half], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    first = run()  # sessions still open at shutdown stay in state

    spark.createDataFrame(rows[half:], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    for k in (1, 2):  # flush batches so every session closes
        flush_ts = datetime.fromtimestamp(
            (max_us + k * 7_200_000_000) / 1_000_000, tz=timezone.utc
        ).replace(tzinfo=None)
        spark.createDataFrame(
            [(-1, flush_ts, -k)], "user_id long, ts timestamp, event_id long"
        ).coalesce(1).write.mode("append").parquet(d)
    second = run()

    key = lambda r: (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
    first_set = {key(r) for r in first if r.user_id >= 0}
    second_set = {key(r) for r in second if r.user_id >= 0}
    assert not (first_set & second_set), "a session emitted twice across restart"

    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id)
        )
    want = set()
    for uid, evs in by_user.items():
        evs.sort()
        start = last = None
        n = 0
        for t, _eid in evs:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_US:
                want.add((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        want.add((uid, start, last, n))
    assert first_set | second_set == want

def test_streaming_sessions_late_event_within_watermark(spark):
    """Cross-batch OUT-OF-ORDER events (late but inside the watermark) must
    join the open session without corrupting it: the event is counted, the
    start widens if the late event precedes it, and the session END never
    regresses (it anchors the event-time timeout — regressing it could
    evict prematurely or yield end < start)."""
    import tempfile
    from datetime import datetime, timezone

    from iii_aibigdata_capstone_spark.streaming.sessions import streaming_sessions

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    d = tempfile.mkdtemp(prefix="sess_late_src_")
    schema = "user_id long, ts timestamp, event_id long"
    # batch 1: user 1 session spans 1000..1600s; user 2 single event at 1600s
    # (watermark after this batch: 1600s - 10min = 1000s)
    spark.createDataFrame(
        [(1, ts(1000), 1), (1, ts(1600), 2), (2, ts(1600), 10)], schema
    ).coalesce(1).write.mode("append").parquet(d)
    # batch 2: LATE events, both >= the 1000s watermark:
    #   user 1 @1200s — inside the open session: count it, end stays 1600s
    #   user 2 @1100s — BEFORE the open session's start: start widens
    spark.createDataFrame(
        [(1, ts(1200), 3), (2, ts(1100), 11)], schema
    ).coalesce(1).write.mode("append").parquet(d)
    for k in (1, 2):  # flush batches so the sessions close
        spark.createDataFrame(
            [(-1, ts(1600 + k * 7200), -k)], schema
        ).coalesce(1).write.mode("append").parquet(d)

    got_rows = []
    q = (
        streaming_sessions(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        )
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sess_late_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in got_rows
        if r.user_id >= 0
    }
    assert got == {
        (1, 1000_000_000, 1600_000_000, 3),
        (2, 1100_000_000, 1600_000_000, 2),
    }, got


def test_session_fn_empty_batch_rearms_timeout():
    """An invocation with state but NO surviving rows (engine-permitted)
    must not crash or clobber state: the existing timeout is re-armed and
    the open session is left untouched. With neither state nor rows the
    call is a no-op."""
    from iii_aibigdata_capstone_spark.streaming.sessions import (
        SESSION_GAP_US,
        _session_fn,
    )

    class FakeState:
        def __init__(self, tup):
            self._t = tup
            self.exists = tup is not None
            self.hasTimedOut = False
            self.timeout = None
            self.updated = None
            self.removed = False

        @property
        def get(self):
            return self._t

        def update(self, t):
            self.updated = t

        def remove(self):
            self.removed = True

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

        def getCurrentWatermarkMs(self):
            return 0

    st = FakeState((1_000_000, 2_000_000, 3))
    assert list(_session_fn((7,), iter([]), st)) == []
    assert st.updated is None and not st.removed
    assert st.timeout == (2_000_000 + SESSION_GAP_US) // 1_000

    st2 = FakeState(None)
    assert list(_session_fn((7,), iter([]), st2)) == []
    assert st2.updated is None and st2.timeout is None


def test_streaming_zscore_equals_batch(spark):
    """Streaming rolling z-score: with per-key in-order arrival (ordered
    micro-batch chunks), the emitted anomaly set — every integer column —
    must equal the batch ts_rolling_zscore lane exactly; state carries
    only the trailing window (bounded), no timeouts involved."""
    import tempfile

    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.zscore import streaming_zscore

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
        )
        .where(F.col("user_id") < 40)
    )
    rows = ev.orderBy("ts", "event_id").collect()
    assert rows, "no events"

    d = tempfile.mkdtemp(prefix="zsc_src_")
    third = len(rows) // 3 or 1
    for chunk in (rows[:third], rows[third : 2 * third], rows[2 * third :]):
        if chunk:
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)

    got_rows = []
    q = (
        streaming_zscore(
            spark.readStream.schema(
                "user_id long, ts timestamp, event_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="zsc_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()
    got = {(r.user_id, r.event_id, r.cents, r.n, r.dev, r.var2) for r in got_rows}

    want = {
        (r.user_id, r.event_id, r.cents, r.n, r.dev, r.var2)
        for r in registry()["ts_rolling_zscore"].builder(spark, TEST_SF_DIR).collect()
        if r.user_id < 40
    }
    assert want, "batch lane empty at this SF — test has no teeth"
    assert got == want, (
        len(got),
        len(want),
        list(got - want)[:3],
        list(want - got)[:3],
    )


def test_streaming_ewma_equals_batch(spark):
    """Streaming dyadic EWMA: with per-key in-order arrival (ordered
    micro-batch chunks), every emitted row — exact integer num/den AND
    the bit-level float ewma — must equal the batch ts_ewma lane; state
    carries only the trailing EWMA_K - 1 cents (bounded), no timeouts."""
    import tempfile

    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.ewma import streaming_ewma

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
        )
        .where(F.col("user_id") < 40)
    )
    rows = ev.orderBy("ts", "event_id").collect()
    assert rows, "no events"

    d = tempfile.mkdtemp(prefix="ewma_src_")
    third = len(rows) // 3 or 1
    for chunk in (rows[:third], rows[third : 2 * third], rows[2 * third :]):
        if chunk:
            spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)

    got_rows = []
    q = (
        streaming_ewma(
            spark.readStream.schema(
                "user_id long, ts timestamp, event_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ewma_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()
    got = {
        (r.user_id, r.event_id, r.ewma_num, r.ewma_den, r.ewma) for r in got_rows
    }

    want = {
        (r.user_id, r.event_id, r.ewma_num, r.ewma_den, r.ewma)
        for r in registry()["ts_ewma"].builder(spark, TEST_SF_DIR).collect()
        if r.user_id < 40
    }
    assert want, "batch lane empty at this SF — test has no teeth"
    assert got == want, (
        len(got),
        len(want),
        list(got - want)[:3],
        list(want - got)[:3],
    )


def test_streaming_ewma_state_survives_restart(spark):
    """Streaming EWMA restart: a NEW query resuming from the checkpoint
    must continue each user's trailing window where the first query left
    it — the union of both queries' emissions equals the batch lane
    exactly (integers and the bit-level float), with no re-emission."""
    import tempfile

    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.ewma import streaming_ewma

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
        )
        .where(F.col("user_id") < 25)
    )
    rows = ev.orderBy("event_id").collect()
    assert rows, "no events"
    cut = rows[len(rows) // 2].event_id  # global event_id split preserves
    # per-user order (ids are ts-ordered within a user)

    src = tempfile.mkdtemp(prefix="ewma_rst_src_")
    chk = tempfile.mkdtemp(prefix="ewma_rst_chk_")

    def run() -> list:
        got = []
        q = (
            streaming_ewma(
                spark.readStream.schema(
                    "user_id long, ts timestamp, event_id long, value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        return got

    ev.where(F.col("event_id") < cut).coalesce(1).write.mode("append").parquet(src)
    first = run()
    ev.where(F.col("event_id") >= cut).coalesce(1).write.mode("append").parquet(src)
    second = run()

    k = lambda r: (r.user_id, r.event_id, r.ewma_num, r.ewma_den, r.ewma)
    first_keys = {k(r) for r in first}
    second_keys = {k(r) for r in second}
    assert not ({e[:2] for e in first_keys} & {e[:2] for e in second_keys}), (
        "events emitted before the restart must not re-emit after it"
    )
    want = {
        k(r)
        for r in registry()["ts_ewma"].builder(spark, TEST_SF_DIR).collect()
        if r.user_id < 25
    }
    assert first_keys | second_keys == want


def test_streaming_countmin_equals_python_and_is_chunking_invariant(spark):
    """Streaming Count-Min: after draining the documents corpus in
    micro-batch chunks, each sketch row's final counter array must equal
    a transparent python replay of the batch hashing (exact integers),
    and a different chunking must give BIT-IDENTICAL counters (addition
    is order-insensitive — the property that makes frequency-sketch
    partials trustworthy). Estimates derived from the emitted counters
    must never underestimate (the count-min bound)."""
    import hashlib
    import tempfile
    from collections import Counter

    from iii_aibigdata_capstone_spark.operators.analytics import CMS_D, CMS_W
    from iii_aibigdata_capstone_spark.streaming.countmin import (
        streaming_countmin,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    rows = docs.orderBy("doc_id").collect()
    assert rows

    # transparent python replay of the batch lane's hashing
    term_counts: Counter = Counter()
    for r in rows:
        for t in r.text.split(" "):
            if t:
                term_counts[t] += 1
    expect = [[0] * CMS_W for _ in range(CMS_D)]
    for t, n in term_counts.items():
        for r in range(CMS_D):
            c = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:15], 16) % CMS_W
            expect[r][c] += n

    def drain(n_chunks: int) -> dict[int, list[int]]:
        src = tempfile.mkdtemp(prefix=f"cms_src{n_chunks}_")
        per_batch: list[tuple[int, list]] = []
        step = len(rows) // n_chunks or 1
        for i in range(0, len(rows), step):
            spark.createDataFrame(rows[i : i + step], docs.schema).coalesce(
                1
            ).write.mode("append").parquet(src)
        q = (
            streaming_countmin(
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            .writeStream.foreachBatch(
                lambda df, bid: per_batch.append((bid, df.collect()))
            )
            .option("checkpointLocation", tempfile.mkdtemp(prefix="cms_ck_"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        q.stop()
        final: dict[int, list[int]] = {}
        for _bid, batch_rows in sorted(per_batch):  # latest emission wins
            for row in batch_rows:
                final[row.r] = list(row.counters)
        return final

    got3 = drain(3)
    assert set(got3) == set(range(CMS_D))
    assert [got3[r] for r in range(CMS_D)] == expect
    got5 = drain(5)  # different chunking — addition is order-insensitive
    assert got5 == got3

    # count-min one-sidedness of estimates read off the emitted counters
    for t, n in term_counts.most_common(20):
        est = min(
            got3[r][
                int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:15], 16) % CMS_W
            ]
            for r in range(CMS_D)
        )
        assert est >= n, (t, est, n)


def test_streaming_spacesaving_matches_replay_and_guarantees(spark):
    """Streaming sharded SpaceSaving: after draining the documents corpus
    in micro-batch chunks, every shard's summary must equal a python
    replay of the identical chunking through the SHARED apply function
    (one copy of the eviction rule), and the classic guarantees must hold
    per shard: est >= true >= est - err for every kept term, and every
    term with true count > shard_total / SS_CAP is present."""
    import hashlib
    import tempfile
    from collections import Counter

    from iii_aibigdata_capstone_spark.streaming.spacesaving import (
        SS_CAP,
        SS_SHARDS,
        apply_spacesaving,
        streaming_spacesaving,
    )

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    rows = docs.orderBy("doc_id").collect()
    assert rows

    def shard_of(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % SS_SHARDS

    n_chunks = 3
    step = len(rows) // n_chunks or 1
    chunks = [rows[i : i + step] for i in range(0, len(rows), step)]

    # python replay of the same chunking through the SHARED kernel
    replay: dict[int, dict] = {s: {} for s in range(SS_SHARDS)}
    true_counts: dict[int, Counter] = {s: Counter() for s in range(SS_SHARDS)}
    for chunk in chunks:
        per_shard: dict[int, Counter] = {s: Counter() for s in range(SS_SHARDS)}
        for r in chunk:
            for t in r.text.split(" "):
                if t:
                    s = shard_of(t)
                    per_shard[s][t] += 1
                    true_counts[s][t] += 1
        for s, cnt in per_shard.items():
            if cnt:
                apply_spacesaving(replay[s], sorted(cnt.items()), SS_CAP)

    src = tempfile.mkdtemp(prefix="ss_src_")
    for chunk in chunks:
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    per_batch: list[tuple[int, list]] = []
    q = (
        streaming_spacesaving(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.foreachBatch(
            lambda df, bid: per_batch.append((bid, df.collect()))
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ss_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()
    final: dict[int, dict] = {}
    for _bid, batch_rows in sorted(per_batch):  # latest emission wins
        for row in batch_rows:
            final[row.shard] = {
                t: (c, e)
                for t, c, e in zip(row.terms, row.counts, row.errs)
            }
    assert set(final) == set(range(SS_SHARDS))
    assert final == replay

    for s, summary in final.items():
        total = sum(true_counts[s].values())
        for t, (est, err) in summary.items():
            true = true_counts[s][t]
            assert est >= true >= est - err, (s, t, est, err, true)
        threshold = total / SS_CAP
        for t, true in true_counts[s].items():
            if true > threshold:
                assert t in summary, (s, t, true, threshold)


def test_spacesaving_batch_twin_matches_replay_and_single_chunk_stream(spark):
    """x5_spacesaving_topk: the batch lane's per-shard summary must equal
    (a) a python replay of one lexicographic fold of the exact per-shard
    counts through the SHARED apply_spacesaving kernel, and (b) the
    streaming twin drained in ONE micro-batch over the same corpus —
    SpaceSaving is arrival-chunking-sensitive, so single-chunk equality
    IS the batch==stream contract (the multi-chunk behavior is pinned by
    the streaming test's replay)."""
    import hashlib
    import tempfile
    from collections import Counter

    from iii_aibigdata_capstone_spark.streaming.spacesaving import (
        SS_CAP,
        SS_SHARDS,
        apply_spacesaving,
        streaming_spacesaving,
    )

    # python replay: exact counts per shard, one sorted fold
    per_shard: dict[int, Counter] = {s: Counter() for s in range(SS_SHARDS)}
    for r in table(spark, TEST_SF_DIR, "documents").select("text").collect():
        for t in r.text.split(" "):
            if t:
                s = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % SS_SHARDS
                per_shard[s][t] += 1
    expect: dict[int, dict] = {}
    for s, cnt in per_shard.items():
        if not cnt:
            continue
        summary: dict = {}
        apply_spacesaving(summary, sorted(cnt.items()), SS_CAP)
        expect[s] = summary

    from iii_aibigdata_capstone_spark.queries import registry

    batch = {}
    for row in (
        registry()["x5_spacesaving_topk"].builder(spark, TEST_SF_DIR).collect()
    ):
        batch.setdefault(row.shard, {})[row.term] = (row.est, row.err)
    assert batch == expect

    # single-micro-batch stream drain == batch lane, bit for bit
    # (the file stream source wants a DIRECTORY; one file -> one batch)
    src = tempfile.mkdtemp(prefix="ss_one_src_")
    table(spark, TEST_SF_DIR, "documents").select(
        "doc_id", "text"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream_final: dict[int, dict] = {}
    per_batch: list[tuple[int, list]] = []
    q = (
        streaming_spacesaving(
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        .writeStream.foreachBatch(
            lambda df, bid: per_batch.append((bid, df.collect()))
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ss_one_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    q.stop()
    assert len([b for b, rows in per_batch if rows]) == 1  # ONE data batch
    for _bid, batch_rows in sorted(per_batch):
        for row in batch_rows:
            stream_final[row.shard] = {
                t: (c, e)
                for t, c, e in zip(row.terms, row.counts, row.errs)
            }
    assert stream_final == batch


def test_streaming_state_schema_upgrade_path(spark):
    """The production upgrade path for applyInPandasWithState, both
    halves pinned on the EWMA twin:

    (a) resuming an old checkpoint with a WIDENED state schema fails
        LOUDLY (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE) — Spark's state
        store schema check, i.e. no silent state corruption; and
    (b) the working upgrade — a NEWER kernel with new logic and a WIDER
        OUTPUT schema over the UNCHANGED state schema — resumes the v1
        checkpoint and continues BIT-CORRECTLY: the union of v1 + v2
        emissions equals the batch ts_ewma lane (v2 read v1's state),
        via the shared ewma_fold (one spelling of the fold).

    The recipe this pins: design state forward-compatible from day one
    (kernel/output evolve freely; state evolution requires a new
    checkpoint)."""
    import tempfile

    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql.streaming.state import GroupStateTimeout

    from iii_aibigdata_capstone_spark.queries import registry
    from iii_aibigdata_capstone_spark.streaming.ewma import (
        STATE_SCHEMA,
        ewma_fold,
        streaming_ewma,
    )

    ev = (
        table(spark, TEST_SF_DIR, "events")
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
        )
        .where(F.col("user_id") < 40)
    )
    rows = ev.orderBy("ts", "event_id").collect()
    assert rows
    half = len(rows) // 2
    src = tempfile.mkdtemp(prefix="upg_src_")
    ck = tempfile.mkdtemp(prefix="upg_ck_")
    spark.createDataFrame(rows[:half], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain(builder_fn, sink):
        q = (
            builder_fn(
                spark.readStream.schema(
                    "user_id long, ts timestamp, event_id long, value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            .writeStream.foreachBatch(lambda df, _i: sink.extend(df.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(180)
        q.stop()
        assert finished, "stream did not finish"

    v1_rows: list = []
    drain(streaming_ewma, v1_rows)
    assert v1_rows

    cents_col = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")

    def make_kernel(state_schema, output_schema, extra_out):
        def fn(key, pdfs, state):
            frames = [p for p in pdfs if len(p)]
            if not frames:
                return
            batch = pd.concat(frames, ignore_index=True)
            vals = list(state.get[0]) if state.exists else []
            out, new_vals = ewma_fold(
                vals, batch["event_id"].to_numpy(), batch["cents"].to_numpy()
            )
            state.update((new_vals,) if state_schema == STATE_SCHEMA else (new_vals, 0))
            payload = {
                "user_id": int(key[0]),
                "event_id": [o[0] for o in out],
                "ewma_num": [o[1] for o in out],
                "ewma_den": [o[2] for o in out],
                "ewma": [o[3] for o in out],
            }
            if extra_out:
                payload["n_in_batch"] = len(out)
            yield pd.DataFrame(payload)

        def builder(events):
            return (
                events.select(
                    "user_id",
                    F.col("ts").cast("timestamp").alias("ts"),
                    "event_id",
                    cents_col.alias("cents"),
                )
                .groupBy("user_id")
                .applyInPandasWithState(
                    fn,
                    outputStructType=output_schema,
                    stateStructType=state_schema,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
            )

        return builder

    # second half of the data arrives, then the upgrade is attempted
    spark.createDataFrame(rows[half:], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    # (a) widened STATE schema -> loud, typed failure
    widened = make_kernel(
        STATE_SCHEMA + ", n_seen long",
        "user_id long, event_id long, ewma_num long, ewma_den long, ewma double",
        extra_out=False,
    )
    with pytest.raises(
        StreamingQueryException, match="STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE"
    ):
        drain(widened, [])

    # (b) upgraded kernel + WIDER OUTPUT over the unchanged state schema
    v2 = make_kernel(
        STATE_SCHEMA,
        "user_id long, event_id long, ewma_num long, ewma_den long, "
        "ewma double, n_in_batch long",
        extra_out=True,
    )
    v2_rows: list = []
    drain(v2, v2_rows)
    assert v2_rows and all(r.n_in_batch >= 1 for r in v2_rows)

    got = {
        (r.user_id, r.event_id, r.ewma_num, r.ewma_den, r.ewma)
        for r in [*v1_rows, *v2_rows]
    }
    expect = {
        (r.user_id, r.event_id, r.ewma_num, r.ewma_den, r.ewma)
        for r in registry()["ts_ewma"].builder(spark, TEST_SF_DIR).collect()
        if r.user_id < 40
    }
    assert got == expect  # v2 continued v1's state bit-correctly
