"""Composed streaming INGEST pipeline: exact dedup -> SimHash near-dup
-> frozen-model DSIR selection, per micro-batch, in ONE foreachBatch —
the streaming production path of the batch `incremental_ingest_pipeline`
twin (operators/ingest.py), which is the oracle-checked semantics spec.

This is the shape a crawl-ingestion deployment actually runs: each gate
alone is proven (streaming/dedup.py, streaming/selection.py); this
module proves they COMPOSE without extra source scans or contract
drift. Per batch: one persisted base projection feeds all three stages;
stage 2 sees only stage-1 survivors (an exact dup's byte-identical
original carries the same fingerprint and plays its blocker); stage 3
scores stage-2 survivors against the model FROZEN before the stream
opened (freeze-once semantics shared with the selection gate — the
model lives beside the checkpoint and a resume reuses it untouched).

Replay contract (the gate_batch contract, three stores wide): candidate
reads filter `batch_id < N`; every batch overwrites its OWN batch_id=N
partition in the exact store (admitted fingerprints), the near-dup
store (ALL stage-1 survivors, admission flagged — a stage-2-rejected
doc must keep blocking), the per-doc results table (all flags), and the
stats table — so a crash-after-side-effects-before-commit replay
recomputes the identical decision set and repairs partial writes.

Scale shape: both store joins are the inverted broadcast-batch form
with the measured batch-size gate and sort-free shuffle-hash fallback
(novel_against_store / neardup_rejected — stores scanned once, never
shuffled, in the default regime); stage 3 is the bounded-model
broadcast join + one map-side-combined doc aggregate. Per-batch cost
grows only with the store scans the dedup gates already pay —
composition adds nothing corpus-proportional.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from reddit_sentiment_spark_streaming_pipeline_spark.streaming.dedup import (
    _store_path_exists,
    assert_store_not_mid_compaction,
    neardup_rejected,
    novel_against_store,
)
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import _order_files_by_name
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.selection import (
    freeze_selection_model,
    read_selection_model,
    read_selection_stream,
)

# Store layouts (explicit read schemas — no footer inference)
INGEST_EXACT_STORE_SCHEMA = "fingerprint string, doc_id bigint, batch_id bigint"
INGEST_NEARDUP_STORE_SCHEMA = (
    "doc_id bigint, h0 int, h1 int, h2 int, h3 int, "
    "admitted boolean, batch_id bigint"
)
INGEST_RESULT_SCHEMA = (
    "doc_id bigint, lang string, exact_ok boolean, neardup_ok boolean, "
    "kept boolean, batch_id bigint"
)


def write_ingest_chunks(spark: SparkSession, sf_dir: str, out_dir: str,
                        n_chunks: int = 4) -> int:
    """Replayable chunks of the ingest corpus (base docs + planted
    resubmits and tail-edited near copies — operators/ingest.py), range-
    partitioned on doc_id so replay is id-ordered (the batching-
    invariance premise of the keep-first / smaller-id rules)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.ingest import ingest_corpus

    corpus = ingest_corpus(spark, sf_dir)
    n = corpus.count()
    (
        corpus.repartitionByRange(n_chunks, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    _order_files_by_name(out_dir, ".parquet")
    return n


# chunk schema == the selection stream's (doc_id, text, lang, source)
read_ingest_stream = read_selection_stream


def ingest_batch(batch_df: DataFrame, batch_id: int, out_root: str) -> None:
    """All three admission stages for one micro-batch; batch-owned
    partition writes throughout (see module docstring)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import simhash_fp
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
        dsir_features,
        dsir_score_against_model,
    )

    spark = batch_df.sparkSession
    exact_dir = os.path.join(out_root, "exact_store")
    neardup_dir = os.path.join(out_root, "neardup_store")
    results_dir = os.path.join(out_root, "ingest_results")
    stats_dir = os.path.join(out_root, "ingest_stats")
    model_dir = os.path.join(out_root, "dsir_model")

    base = batch_df.select("doc_id", "lang", "text").persist()
    try:
        n_batch = base.count()
        assert_store_not_mid_compaction(spark, exact_dir)
        assert_store_not_mid_compaction(spark, neardup_dir)

        # ---- stage 1: exact (within-batch keep-first + store anti-join)
        fps = base.select("doc_id", F.md5("text").alias("fingerprint"))
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        firsts = (
            fps.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        if _store_path_exists(spark, exact_dir):
            store1 = (
                spark.read.schema(INGEST_EXACT_STORE_SCHEMA)
                .parquet(exact_dir)
                .filter(F.col("batch_id") < batch_id)
            )
            s1_ids = novel_against_store(firsts, store1, batch_rows=n_batch)
        else:
            s1_ids = firsts
        # persist the survivor id+fingerprint set: it feeds the flag
        # assembly, the exact-store write, and (via s1) the stage-2/3
        # inputs — without the cache each action would re-run the store
        # anti-join (one extra store scan per sink)
        s1_ids = s1_ids.persist()
        s1 = base.join(s1_ids.select("doc_id"), "doc_id").persist()

        # ---- stage 2: near-dup among stage-1 survivors
        fp2 = simhash_fp(s1.select("doc_id", "text")).persist()
        try:
            n_s1 = fp2.count()
            store2 = None
            if _store_path_exists(spark, neardup_dir):
                store2 = (
                    spark.read.schema(INGEST_NEARDUP_STORE_SCHEMA)
                    .parquet(neardup_dir)
                    .filter(F.col("batch_id") < batch_id)
                )
            rej2 = (
                neardup_rejected(fp2, store2, batch_rows=n_s1)
                .distinct()
                .withColumn("r2", F.lit(1))
            )

            # ---- stage 3: frozen-model scoring of stage-2 survivors
            lr, params = read_selection_model(spark, model_dir)
            s2 = s1.join(rej2.select("doc_id"), "doc_id", "left_anti")
            scored = dsir_score_against_model(
                dsir_features(s2), lr, params
            ).select("doc_id", "admitted")

            # ---- flag assembly + batch-owned writes
            out = (
                base.select("doc_id", "lang")
                .join(s1_ids.select("doc_id", F.lit(1).alias("e")), "doc_id", "left")
                .join(rej2, "doc_id", "left")
                .join(scored, "doc_id", "left")
            )
            neardup_ok = F.col("e").isNotNull() & F.col("r2").isNull()
            out = out.select(
                "doc_id",
                "lang",
                F.col("e").isNotNull().alias("exact_ok"),
                neardup_ok.alias("neardup_ok"),
                F.coalesce(neardup_ok & F.col("admitted"), F.lit(False)).alias("kept"),
            ).persist()
            try:
                n_exact = out.filter("exact_ok").count()
                n_neardup = out.filter("neardup_ok").count()
                n_kept = out.filter("kept").count()
                out.write.mode("overwrite").parquet(
                    os.path.join(results_dir, f"batch_id={batch_id}")
                )
                s1_ids.select("fingerprint", "doc_id").write.mode(
                    "overwrite"
                ).parquet(os.path.join(exact_dir, f"batch_id={batch_id}"))
                fp2.join(rej2, "doc_id", "left").select(
                    "doc_id", "h0", "h1", "h2", "h3",
                    F.col("r2").isNull().alias("admitted"),
                ).write.mode("overwrite").parquet(
                    os.path.join(neardup_dir, f"batch_id={batch_id}")
                )
            finally:
                out.unpersist()
        finally:
            fp2.unpersist()
            s1.unpersist()
            s1_ids.unpersist()
    finally:
        base.unpersist()
    spark.createDataFrame(
        [(n_batch, n_exact, n_neardup, n_kept)],
        "n_batch long, n_exact_ok long, n_neardup_ok long, n_kept long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch_id={batch_id}")
    )


def read_ingest_results(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(INGEST_RESULT_SCHEMA).parquet(
        os.path.join(out_root, "ingest_results")
    )


def read_ingest_stats(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_root, "ingest_stats"))


def start_ingest_pipeline(docs_stream: DataFrame, out_root: str,
                          cal_docs: DataFrame | None = None,
                          after_batch_hook=None) -> StreamingQuery:
    """foreachBatch ingest pipeline with a durable checkpoint under its
    own output root. Model freeze-once semantics are the selection
    gate's (params dir written last keys the check; a resume reuses the
    durable model; a fresh root without cal_docs refuses loudly)."""
    spark = docs_stream.sparkSession
    model_dir = os.path.join(out_root, "dsir_model")
    if not _store_path_exists(spark, os.path.join(model_dir, "params")):
        if cal_docs is None:
            raise ValueError(
                "start_ingest_pipeline: no frozen model under "
                f"{model_dir} and no cal_docs to freeze one from"
            )
        freeze_selection_model(cal_docs, model_dir)

    def _fn(df: DataFrame, bid: int) -> None:
        ingest_batch(df, bid, out_root)
        if after_batch_hook is not None:
            after_batch_hook(bid)

    return (
        docs_stream.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint"))
        .queryName("ingest_pipeline")
        .start()
    )
