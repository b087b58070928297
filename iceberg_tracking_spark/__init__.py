"""iceberg_tracking_spark — a PySpark-native analytics engine.

Re-expresses the dataflow operators of the reference MOT pipeline
(mj-support/iceberg-tracking) as idiomatic Spark DataFrame / SQL /
Structured Streaming programs, plus the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) needed
at 100 TB scale.

Layout:
    session     — tuned SparkSession factory
    schemas     — canonical StructTypes (MOT detections, embeddings, tracks)
    sources/    — readers/writers (MOT CSV, parquet tables, synthetic star schema)
    functions/  — scalar expression library (geometry, vectors, text, keys)
    operators/  — relational operator library (joins, dedup, windows, NMS, similarity)
    plans/      — end-to-end jobs (eval metrics, calibration) + driver query registry
    tracker/    — Kalman + per-sequence stateful tracker (applyInPandas)
    streaming/  — Structured Streaming surface (windows, stateful tracker)
"""

__version__ = "0.1.0"
