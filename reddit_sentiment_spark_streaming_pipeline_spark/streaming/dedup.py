"""Streaming incremental dedup gate: per-micro-batch admission against a
growing fingerprint store — the streaming twin of the batch
`incremental_dedup_gate` (operators/curation.py).

Each micro-batch of incoming documents computes md5 fingerprints,
anti-joins the durable fingerprint store (parquet), appends only the
newly-admitted fingerprints back to the store, and records one stats row
per batch. Micro-batches execute sequentially, so the read-check-append
cycle is race-free; and because the gate checks MEMBERSHIP (not counts),
a replayed batch finds its own fingerprints already present and admits
nothing — admission is idempotent under the retry semantics foreachBatch
actually has.

At 100 TB the store is a fingerprint-only table: 16-byte keys, orders of
magnitude smaller than the corpus. The per-batch anti-join shuffles only
the batch's fingerprints; with the store bucketed on fingerprint the
exchange disappears entirely, and a broadcast Bloom filter of the store
serves as the cheap first-pass gate in front of the exact join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import _order_files_by_name

DOC_CHUNK_SCHEMA = "doc_id bigint, text string, source string"


def write_doc_chunks(spark: SparkSession, sf_dir: str, out_dir: str,
                     n_chunks: int = 4) -> int:
    """Replayable document chunks with planted cross-batch duplicates.

    Corpus = originals ∪ exact resubmits (doc_id+1M, same text) ∪ tailed
    novel docs (doc_id+2M) — the same construction as the batch gate —
    range-partitioned on doc_id so originals replay in earlier
    micro-batches than their resubmits: the duplicates the gate must
    reject arrive in LATER batches than the texts they collide with,
    which is exactly the cross-batch case an in-batch dropDuplicates
    cannot cover. Returns the corpus row count.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text"), "source"
    )
    resubmit = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    novel = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz fresh snapshot tail")).alias("text"),
        "source",
    )
    corpus = docs.unionByName(resubmit).unionByName(novel)
    n = corpus.count()
    (
        corpus.repartitionByRange(n_chunks, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    _order_files_by_name(out_dir, ".parquet")
    return n


def read_doc_stream(spark: SparkSession, chunk_dir: str,
                    max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(DOC_CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunk_dir)
    )


def gate_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
               stats_dir: str) -> None:
    """Admit the batch's unseen fingerprints into the store; append stats.

    Within-batch collisions keep the lowest doc_id (the same greedy
    keep-first rule as the batch operators); cross-batch collisions are
    rejected by the store anti-join.
    """
    spark = batch_df.sparkSession
    fps = batch_df.select(
        "doc_id", "source", F.md5("text").alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    firsts = (
        fps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_batch = fps.count()
    try:
        store = spark.read.parquet(store_dir).select("fingerprint")
    except Exception:  # noqa: BLE001 — first batch: store not created yet
        store = None
    admitted = (
        firsts if store is None
        else firsts.join(store, "fingerprint", "left_anti")
    )
    n_admitted = admitted.count()
    (
        admitted.select("fingerprint", "doc_id", "source")
        .write.mode("append")
        .parquet(store_dir)
    )
    spark.createDataFrame(
        [(batch_id, n_batch, n_admitted, n_batch - n_admitted)],
        "batch_id long, n_batch long, n_admitted long, n_rejected long",
    ).coalesce(1).write.mode("append").parquet(stats_dir)


def start_dedup_gate(docs_stream: DataFrame, out_root: str) -> StreamingQuery:
    """foreachBatch gate with a durable checkpoint under the output root."""
    store_dir = os.path.join(out_root, "fingerprint_store")
    stats_dir = os.path.join(out_root, "gate_stats")
    return (
        docs_stream.writeStream.foreachBatch(
            lambda df, bid: gate_batch(df, bid, store_dir, stats_dir)
        )
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint"))
        .queryName("dedup_gate")
        .start()
    )
