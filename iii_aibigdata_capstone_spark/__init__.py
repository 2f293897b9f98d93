"""iii_aibigdata_capstone_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference repo ``tony-chengchunchang/iii_AIBigData_Capstone`` (a Spark-2.4-era
Kafka + DStream basketball-analytics project), re-expressed as idiomatic
Spark 3/4: DataFrame + Spark SQL (Catalyst-optimized), Structured Streaming,
MLlib pipelines, and Arrow-batched pandas UDFs only where relational
semantics genuinely end (greedy NMS, pose-graph assembly, model inference).

Layout
------
- ``session``     SparkSession factory tuned for AQE / broadcast / Arrow.
- ``catalog``     loaders for the driver-provided parquet tables.
- ``operators``   relational, time-series, geometry (boxes/NMS), pose-graph,
                  dedup, similarity, text-analysis, multimodal operators.
- ``functions``   reusable column-expression libraries (math, text, vectors).
- ``ml``          MLlib pipeline for the quarter-prediction model (fit-once,
                  fixing the reference's per-batch-refit bug).
- ``streaming``   Structured Streaming shells: sources, sinks, watermarked
                  windows, stream-static joins.
- ``queries``     the registry mapping operator names -> (Spark builder,
                  DuckDB oracle SQL) consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
