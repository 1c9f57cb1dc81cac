"""reddit_sentiment_spark_streaming_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query & data-processing
capabilities of the reference Reddit sentiment streaming pipeline
(waldepfeifer/reddit-sentiment-spark-streaming-pipeline), extended with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
- One engine, one API: every analytic is a DataFrame query builder usable in
  batch (correctness oracle, bench) and wrapped by Structured Streaming for
  live mode.
- DataFrame/SQL + Catalyst end-to-end; Arrow on; pandas UDFs only where
  built-ins genuinely can't express the semantics.
- Designed for a 1000-executor / 100 TB deployment: broadcast the dims,
  aggregate before shuffling, push filters to the parquet scan, never
  collect unbounded data to the driver.
"""

__version__ = "0.1.0"
