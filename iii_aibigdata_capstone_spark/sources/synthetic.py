"""Pure-Python custom DataSource (Spark 4 ``pyspark.sql.datasource``):
a deterministic synthetic event generator, batch AND micro-batch streaming.

The reference's closest analogue is the hand-rolled Kafka receiver with a
custom ``valueDecoder`` (pi/dl_k_to_ss.py:429) plus the manual source
injector scripts (qp/ml_source.py, pi/dl_source1.py) — processes outside
the engine pushing records in. A custom DataSource inverts that: the
generator IS a planned source with partitions (batch) and offsets
(streaming), so Catalyst sees schema + partitioning and the stream gets
exactly-once offset tracking for free.

The WRITE half (``_JsonlSink`` / ``_JsonlStreamSink``) rebuilds the
reference's hand-rolled producer sinks (ml_k_to_ss.py:37-54 KafkaProducer
per partition; ml_IFTTT webhook) as a planned sink with the standard
two-phase commit: executors stage files and return commit messages, the
driver publishes a manifest once — task retries can never double-publish.

Determinism contract: row ``i`` is a pure function of ``i`` (splitmix-style
mixing), so any (partition count, batch size) slicing yields the same total
multiset — asserted in tests.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"
EVENT_TYPES = ("click", "view", "purchase", "refund")


def _mix(i: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer) — row i's entropy."""
    z = (i + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _row(i: int) -> tuple[int, int, str, float]:
    h = _mix(i)
    return (
        i,
        h % 1000,
        EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)],
        round(((h >> 16) % 100_000) / 100.0, 2),
    )


def _arrow_batch(start: int, end: int):
    """The [start, end) id range as ONE pyarrow RecordBatch — the same
    rows as ``_row`` but generated vectorized (numpy uint64 wraps mod 2^64
    exactly like the scalar splitmix) and handed to Spark as Arrow.
    Yielding per-row tuples cost ~2.5s per 200k rows of pure Python/py4j
    conversion in the bench's stream-drain probe; a RecordBatch read is
    the Python-data-source fast path (equality with ``_row`` is pinned in
    tests/test_datasource.py)."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.uint64)
    z = i + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = z ^ (z >> np.uint64(31))
    event_type = np.array(EVENT_TYPES)[
        ((h >> np.uint64(10)) % np.uint64(len(EVENT_TYPES))).astype(np.int64)
    ]
    value = np.round(
        ((h >> np.uint64(16)) % np.uint64(100_000)).astype(np.float64) / 100.0, 2
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(i.astype(np.int64)),
            pa.array((h % np.uint64(1000)).astype(np.int64)),
            pa.array(event_type),
            pa.array(value),
        ],
        names=["event_id", "user_id", "event_type", "value"],
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range) -> Iterator:
        if partition.end > partition.start:
            yield _arrow_batch(partition.start, partition.end)


class _StreamReader(DataSourceStreamReader):
    """Offset = next row id to emit. ``latestOffset`` reports everything
    available (``rows``), because availableNow snapshots it once; pacing
    comes from ``partitions`` slicing the offset range into
    ``rowsPerBatch`` tasks — many small deterministic partitions per
    micro-batch rather than many micro-batches."""

    def __init__(self, options: dict):
        self.total = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        return {"next": self.total}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["next"], end["next"]
        return [
            _Range(s, min(s + self.per_batch, hi))
            for s in range(lo, hi, self.per_batch)
        ] or [_Range(lo, hi)]

    def read(self, partition: _Range) -> Iterator:
        if partition.end > partition.start:
            yield _arrow_batch(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _FileCommit(WriterCommitMessage):
    """One staged file per task — the executor's half of the two-phase
    commit (must be picklable; travels executor -> driver)."""

    filename: str
    n_rows: int


class _JsonlSink(DataSourceWriter):
    """Two-phase-commit JSON-lines sink (S7/S8 rebuilt as a PLANNED sink,
    not a foreachPartition side effect): each task stages
    ``_staging/<uuid>.jsonl`` and returns its name; only the driver's
    ``commit`` publishes the batch, atomically, by writing a ``_SUCCESS``
    manifest naming the staged files — a reader that honors the manifest
    never sees a partial write, no matter how many tasks failed and
    retried. ``abort`` deletes the staged files. Local-FS staging stands
    in for the object store a cluster deployment would use; the protocol
    (stage on executors, publish once on the driver) is the standard
    Spark commit shape."""

    def __init__(self, options: dict, columns: list[str], manifest: str):
        self.path = options.get("path") or options.get("sink_path")
        if not self.path:
            raise ValueError("synthetic_events sink requires a 'path' option")
        self.columns = columns
        self.manifest = manifest

    def write(self, iterator) -> _FileCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        files = [m.filename for m in messages if m is not None]
        with open(os.path.join(self.path, self.manifest), "w") as fh:
            json.dump(
                {
                    "files": sorted(files),
                    "rows": sum(m.n_rows for m in messages if m is not None),
                },
                fh,
            )

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, "_staging", m.filename))
                except OSError:
                    pass


class _JsonlStreamSink(_JsonlSink, DataSourceStreamWriter):
    """Streaming flavor: one manifest per epoch (``_SUCCESS_<batchId>``) —
    at-least-once delivery upgraded to effectively-once for readers that
    key on the manifest, because a retried epoch just rewrites the same
    manifest."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        self.manifest = f"_SUCCESS_{batchId}"
        _JsonlSink.commit(self, messages)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        _JsonlSink.abort(self, messages)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> _JsonlSink:
        return _JsonlSink(self.options, schema.fieldNames(), "_SUCCESS")

    def streamWriter(self, schema, overwrite: bool) -> _JsonlStreamSink:
        return _JsonlStreamSink(self.options, schema.fieldNames(), "_SUCCESS")


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
