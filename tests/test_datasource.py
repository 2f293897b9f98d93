"""Custom Python DataSource tests: batch partitioning, determinism across
slicings, and the micro-batch stream reaching the same total multiset."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from iii_aibigdata_capstone_spark.sources import register


def _read(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_read_counts_and_schema(spark):
    register(spark)
    df = _read(spark, rows=500, partitions=8)
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert df.select("event_id").distinct().count() == 500


def test_batch_read_deterministic_across_partitioning(spark):
    register(spark)
    a = sorted(map(tuple, _read(spark, rows=300, partitions=3).collect()))
    b = sorted(map(tuple, _read(spark, rows=300, partitions=7).collect()))
    assert a == b


def test_stream_reaches_batch_total(spark):
    register(spark)
    chk = tempfile.mkdtemp(prefix="ds_chk_")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 250)
        .option("rowsPerBatch", 60)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM synth_stream").collect()))
    want = sorted(map(tuple, _read(spark, rows=250, partitions=4).collect()))
    assert got == want  # stream slicing reproduces the batch multiset


def test_filters_apply_on_top(spark):
    register(spark)
    df = _read(spark, rows=400, partitions=4)
    purchases = df.where(F.col("event_type") == "purchase")
    assert purchases.count() == df.collect().__len__() - df.where(
        F.col("event_type") != "purchase"
    ).count()


def _manifest_rows(path, manifest_names):
    import json
    import os

    rows = []
    for mf in manifest_names:
        with open(os.path.join(path, mf)) as fh:
            m = json.load(fh)
        for name in m["files"]:
            with open(os.path.join(path, "_staging", name)) as fh:
                rows += [json.loads(line) for line in fh]
    return rows


def test_batch_sink_two_phase_commit_round_trip(spark, tmp_path):
    """The custom sink's write path: every task stages a file, the driver
    publishes ONE manifest; reading exactly the manifest's files recovers
    the written multiset. Files in _staging not named by the manifest are
    invisible (the retry-safety property)."""
    import json
    import os

    register(spark)
    df = spark.read.format("synthetic_events").option("rows", 500).option(
        "partitions", 7
    ).load()
    out = str(tmp_path / "sink")
    df.write.format("synthetic_events").option("path", out).mode("append").save()

    with open(os.path.join(out, "_SUCCESS")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 500
    assert len(manifest["files"]) == 7  # one staged file per input partition
    got = _manifest_rows(out, ["_SUCCESS"])
    want = [r.asDict() for r in df.collect()]
    key = lambda d: d["event_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_stream_sink_manifests_per_epoch(spark, tmp_path):
    """Custom source -> custom sink end to end as a STREAM: availableNow
    drains the offset range; each epoch publishes its own manifest, and
    the union of all manifests equals the batch read of the same range."""
    import os

    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 300)
        .option("rowsPerBatch", 120)
        .load()
    )
    out = str(tmp_path / "stream_sink")
    q = (
        stream.writeStream.format("synthetic_events")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    manifests = sorted(n for n in os.listdir(out) if n.startswith("_SUCCESS_"))
    assert manifests, os.listdir(out)
    got = _manifest_rows(out, manifests)
    assert len(got) == 300
    want = [
        r.asDict()
        for r in spark.read.format("synthetic_events").option("rows", 300).load().collect()
    ]
    key = lambda d: d["event_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_batch_sink_abort_leaves_no_manifest(spark, tmp_path):
    """Failure path of the two-phase commit: a task that raises mid-batch
    fails the job BEFORE the driver publish, so no manifest appears (a
    manifest-honoring reader sees zero rows, never a partial batch), and
    ``abort`` removes the staged files of the tasks that had completed.
    Only the failing attempt's own orphan may remain in _staging — it is
    named by no manifest, hence invisible."""
    import os

    import pytest as _pytest

    register(spark)

    @F.udf("double")
    def boom(event_id):
        if event_id == 450:
            raise RuntimeError("mid-batch failure")
        return 0.0

    df = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 7)
        .load()
        .withColumn("value", boom("event_id"))
    )
    out = str(tmp_path / "abort_sink")
    with _pytest.raises(Exception):
        df.write.format("synthetic_events").option("path", out).mode("append").save()

    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    staged = os.listdir(os.path.join(out, "_staging")) if os.path.exists(
        os.path.join(out, "_staging")
    ) else []
    # abort() deleted every staged file it was told about; at most the
    # failing attempts' orphans (unknown to the driver) can survive
    assert len(staged) < 7, staged


def test_stream_sink_epoch_replay_is_idempotent(tmp_path):
    """ST6/at-least-once made concrete at the protocol level: an epoch
    that is retried end-to-end (new task attempts, new staged files, same
    batchId) REWRITES the same per-epoch manifest, so a manifest-keyed
    reader sees exactly one copy of the epoch — effectively-once on top of
    at-least-once delivery. Pure-Python protocol test (the writer classes
    are plain objects), no stream restart machinery needed."""
    import os

    from iii_aibigdata_capstone_spark.sources.synthetic import (
        _JsonlStreamSink,
        _row,
    )

    out = str(tmp_path / "replay_sink")
    os.makedirs(out)
    cols = ["event_id", "user_id", "event_type", "value"]
    rows = [_row(i) for i in range(40)]

    sink = _JsonlStreamSink({"path": out}, cols, "_SUCCESS")
    # first delivery of epoch 3
    m1 = sink.write(iter(rows))
    sink.commit([m1], batchId=3)
    # the whole epoch replays: fresh task attempt, fresh staged file
    m2 = sink.write(iter(rows))
    sink.commit([m2], batchId=3)

    manifests = [n for n in os.listdir(out) if n.startswith("_SUCCESS_")]
    assert manifests == ["_SUCCESS_3"]
    got = _manifest_rows(out, manifests)
    assert len(got) == 40  # one copy, not two
    assert sorted(d["event_id"] for d in got) == list(range(40))


def test_arrow_batch_equals_scalar_rows():
    """The vectorized Arrow read path must produce bit-identical rows to
    the scalar ``_row`` reference (same splitmix mixing, same rounding) —
    the determinism contract is defined by ``_row``."""
    from iii_aibigdata_capstone_spark.sources.synthetic import _arrow_batch, _row

    batch = _arrow_batch(0, 2000).to_pylist()
    want = [_row(i) for i in range(2000)]
    got = [
        (d["event_id"], d["user_id"], d["event_type"], d["value"]) for d in batch
    ]
    assert got == want
