"""In-flight quality metrics via ``DataFrame.observe`` — production
accounting without a second scan.

The reference counts records per batch with a separate ``rdd.count()``
action (qp/ml_k_to_ss.py:17), i.e. it pays an extra job to know what it
processed. ``observe`` attaches aggregate metrics to the main query's own
pass: rows, nulls, and value bounds accumulate inside the one scan/shuffle
that already runs, and surface on the Observation handle (batch) or in
each ``StreamingQueryProgress`` (streaming). At 100 TB a second counting
scan is a second 100 TB read — this is the difference between monitoring
being free and being half the cluster bill.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observed(df: DataFrame, *cols: str) -> tuple[DataFrame, Observation]:
    """Attach a standard quality-metric set over ``cols`` to ``df``.

    Returns the instrumented frame and the Observation handle; read
    ``obs.get`` after the frame's action completes. Metrics per column:
    null count and min/max (numeric bounds double as cheap drift probes);
    plus a global row count.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"))
        metrics.append(F.min(c).alias(f"{c}_min"))
        metrics.append(F.max(c).alias(f"{c}_max"))
    obs = Observation()
    return df.observe(obs, *metrics), obs
