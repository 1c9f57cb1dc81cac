"""Deterministic file-replay source — the testable stand-in for the
reference's socket source (S1, reddit_consumer.py:143-152).

The socket source is non-replayable and offers no fault tolerance (SURVEY
§2.9 T6/T8); a file source over ts-ordered chunk files gives deterministic
micro-batches (`maxFilesPerTrigger=1`), durable checkpoints, and real
`maxOffsets`-style throttling — the replayable-source design the new engine
standardizes on (Kafka in production, files in tests).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table


def write_replay_chunks(spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 5) -> int:
    """Split `events` into n ts-ordered parquet chunk files (one per
    micro-batch when replayed with maxFilesPerTrigger=1). Returns row count.
    """
    os.makedirs(out_dir, exist_ok=True)
    pdf = load_table(spark, sf_dir, "events").orderBy("ts").toPandas()
    chunk = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            # pandas yields ns-precision timestamps, which parquet stores as
            # INT64(NANOS) — Spark reads those as BIGINT; coerce to µs
            pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                           os.path.join(out_dir, f"chunk_{i:04d}.parquet"),
                           coerce_timestamps="us", allow_truncated_timestamps=True)
    return len(pdf)


def write_wire_chunks(wire_df, out_dir: str, n_chunks: int = 4) -> int:
    """Split a wire frame (`value: string`, JSON lines) into n text chunk
    files — the replayable stand-in for the producer's TCP stream. Returns
    the line count."""
    os.makedirs(out_dir, exist_ok=True)
    lines = [r.value for r in wire_df.collect()]
    chunk = (len(lines) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = lines[i * chunk : (i + 1) * chunk]
        if part:
            with open(os.path.join(out_dir, f"chunk_{i:04d}.txt"), "w") as f:
                f.write("\n".join(part) + "\n")
    return len(lines)


def read_wire_stream(spark: SparkSession, wire_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming `value: string` frame over wire chunk files."""
    return (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(wire_dir)
    )


def read_wire_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """The reference's ingestion path (S1, reddit_consumer.py:143-152):
    TCP lines with arrival timestamp. Non-replayable — no fault tolerance;
    kept for wire-contract parity, tests and production use the file/Kafka
    path. The reference also set Kafka-only options (maxOffsetsPerTrigger,
    socketTimeout) here that the socket source silently ignores — omitted."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .option("includeTimestamp", "true")
        .load()
    )


def read_wire_kafka(spark: SparkSession, bootstrap_servers: str, topic: str,
                    max_offsets_per_trigger: int = 1000):
    """Production wire source: Kafka JSON lines → `value: string`.

    This is where the reference's ignored `maxOffsetsPerTrigger`
    (reddit_consumer.py:149 — a Kafka option set on a socket source)
    actually works: real replay, offsets-based exactly-once, and
    backpressure. Returns the configured reader; `.load()` requires the
    spark-sql-kafka package, which this container doesn't ship, so tests
    cover construction and the file-replay source covers the semantics.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("startingOffsets", "earliest")
    )


def read_replay_stream(spark: SparkSession, replay_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming DataFrame over the replay directory (schema from files).

    pyarrow writes timestamps without isAdjustedToUTC, which Spark reads as
    TIMESTAMP_NTZ — watermarks require TIMESTAMP, so cast those back.
    """
    schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )
    for f in schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            stream = stream.withColumn(f.name, stream[f.name].cast("timestamp"))
    return stream
