"""The reference's full per-batch analytics over the wire stream.

This is the complete `process_batch` (reddit_consumer.py:282-444) re-built
idiomatically: one persisted parse of the micro-batch feeds every sink —
the reference recomputed the parse/filter/UDF pipeline for each of its ~10
actions per batch (SURVEY §3.1, X9).

Result tables (exact reference shapes):
- ``sentiment(timestamp, average_sentiment)`` — one row per micro-batch
  (reddit_consumer.py:361-366).
- ``subreddit_stats(subreddit, post_count, unique_authors, avg_length,
  timestamp)`` — one row per (batch × subreddit); the reference writes no
  timestamp and its dashboard back-fills one from file ctime
  (streamlit_app.py:114-115) — here the batch event-time is written so the
  column is real, not forensic.
- ``references(timestamp, total_user_refs, total_sub_refs, total_urls)``
  — one row per batch (reddit_consumer.py:422-429).
Plus raw wire append (K1) and the processed posts table (K2 made an append
to one directory instead of one overwrite-file per batch).

Scale: every write is either the raw pass-through or a per-batch aggregate
of bounded cardinality; nothing collects to the driver except three scalar
rows. unique_authors keeps approx_count_distinct (HLL++) exactly like the
reference (reddit_consumer.py:379) — exact distinct would shuffle author
strings per subreddit for no consumer benefit.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import with_sentiment
from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import parse_posts
from reddit_sentiment_spark_streaming_pipeline_spark.operators.refs import (
    SUB_REF_PATTERN,
    URL_PATTERN,
    USER_REF_PATTERN,
)
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.retention import enforce_retention

EPOCH_FALLBACK = datetime.datetime(1970, 1, 1)


class PostsSinks:
    """The reference's five output tables under one root."""

    def __init__(self, out_root: str, retention_bytes: int | None = None):
        self.out_root = out_root
        self.retention_bytes = retention_bytes
        self.raw_dir = os.path.join(out_root, "raw")
        self.processed_dir = os.path.join(out_root, "processed")
        self.sentiment_dir = os.path.join(out_root, "sentiment")
        self.stats_dir = os.path.join(out_root, "subreddit_stats")
        self.refs_dir = os.path.join(out_root, "references")

    def dirs(self) -> list[str]:
        return [self.raw_dir, self.processed_dir, self.sentiment_dir,
                self.stats_dir, self.refs_dir]


def enrich_posts(wire: DataFrame) -> DataFrame:
    """Wire lines → the engine's central posts fact table:
    parse/filter/derive (P1-P3) + sentiment (U1) in one narrow pass."""
    return with_sentiment(parse_posts(wire))


def subreddit_stats_frame(posts: DataFrame) -> DataFrame:
    """A4/A5/O2 (reddit_consumer.py:375-384), HLL++ distinct kept."""
    return (
        posts.groupBy("subreddit")
        .agg(
            F.count(F.lit(1)).alias("post_count"),
            F.approx_count_distinct("author").alias("unique_authors"),
            F.round(F.avg("text_length"), 6).alias("avg_length"),
        )
        .filter(F.col("post_count") > 0)
        .orderBy(F.desc("post_count"), "subreddit")
    )


def references_totals_frame(posts: DataFrame) -> DataFrame:
    """F3-F6 + A8 grand totals (reddit_consumer.py:398-420) in one pass."""
    return (
        posts.select(
            F.size(F.regexp_extract_all("text", F.lit(USER_REF_PATTERN), F.lit(0))).alias("u"),
            F.size(F.regexp_extract_all("text", F.lit(SUB_REF_PATTERN), F.lit(0))).alias("s"),
            F.size(F.regexp_extract_all("text", F.lit(URL_PATTERN), F.lit(0))).alias("l"),
        )
        .agg(
            F.sum("u").cast("double").alias("total_user_refs"),
            F.sum("s").cast("double").alias("total_sub_refs"),
            F.sum("l").cast("double").alias("total_urls"),
        )
    )


def process_posts_batch(batch_df: DataFrame, batch_id: int, sinks: PostsSinks) -> None:
    batch_df.persist()
    try:
        if batch_df.isEmpty():
            return
        # K1: raw wire append — keepalives and malformed lines included,
        # so the raw table is a replayable record of the stream
        batch_df.write.mode("append").parquet(sinks.raw_dir)

        posts = enrich_posts(batch_df).persist()
        try:
            # A1: batch event-time stamp, deterministic fallback (the
            # reference falls back to now(), reddit_consumer.py:315-317)
            batch_time = posts.agg(F.max("created_time")).first()[0] or EPOCH_FALLBACK
            stamp = F.lit(batch_time)

            # K2: processed posts append (reference: one overwrite-file per
            # batch, reddit_consumer.py:321-327 — append scales, files don't)
            posts.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                sinks.processed_dir
            )

            # A3/K3: sentiment(timestamp, average_sentiment)
            (
                posts.agg(F.round(F.avg("sentiment"), 6).alias("average_sentiment"))
                .select(stamp.alias("timestamp"), "average_sentiment")
                .write.mode("append")
                .parquet(sinks.sentiment_dir)
            )

            # A4/A5/K3: subreddit_stats
            (
                subreddit_stats_frame(posts)
                .withColumn("timestamp", stamp)
                .write.mode("append")
                .parquet(sinks.stats_dir)
            )

            # A7/A8/K3: references totals
            (
                references_totals_frame(posts)
                .select(stamp.alias("timestamp"), "total_user_refs",
                        "total_sub_refs", "total_urls")
                .write.mode("append")
                .parquet(sinks.refs_dir)
            )
        finally:
            posts.unpersist()

        if sinks.retention_bytes:
            for d in sinks.dirs():
                enforce_retention(d, sinks.retention_bytes)
    finally:
        batch_df.unpersist()


def windowed_sentiment_stream(wire: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Native streaming form of `windowed_subreddit_sentiment`: the parsed
    wire stream with an event-time watermark feeding the shared windowed
    frame (append-mode safe; state bounded by the watermark)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.windows import windowed_sentiment_frame

    posts = enrich_posts(wire).withWatermark("created_time", watermark)
    return windowed_sentiment_frame(posts)


def subreddit_dim(spark, sf_dir: str) -> DataFrame:
    """Tiny static dimension: subreddit → activity category (derived
    deterministically from the corpus so tests have a closed form)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.col("source").alias("subreddit"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "subreddit",
            F.when(F.col("n_docs") >= 100, F.lit("high"))
            .when(F.col("n_docs") >= 30, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("category"),
        )
    )


def enriched_posts_stream(wire: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension — Catalyst broadcasts the dim into every batch, so the
    stream side never shuffles. The standard dimension-lookup pattern that
    replaces driver-side dict lookups at scale."""
    return parse_posts(wire).join(F.broadcast(dim), "subreddit", "left")


def deduped_posts_stream(wire: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-id posts: at-least-once wire delivery
    (producer reconnects, replayed chunks) deduped on the post id within
    the event-time watermark — state is bounded by the watermark instead of
    growing with the stream (dropDuplicates without one never evicts)."""
    return (
        parse_posts(wire)
        .withWatermark("created_time", watermark)
        .dropDuplicatesWithinWatermark(["id"])
    )


def start_posts_pipeline(wire: DataFrame, out_root: str,
                         retention_bytes: int | None = None) -> StreamingQuery:
    """Wire stream (`value: string`) → the five reference tables."""
    sinks = PostsSinks(out_root, retention_bytes)
    return (
        wire.writeStream.foreachBatch(lambda df, bid: process_posts_batch(df, bid, sinks))
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint"))
        .start()
    )


# DuckDB mirror of the drained sink tables: survivors (the engine's
# P1/P2 filter) per deterministic micro-batch (doc_id % 3), per-doc
# sentiment via the inlined lexicon (identical CTE to operators/sentiment),
# per-batch avg + reference totals + processed-post counts — i.e. the
# EXPECTED CONTENTS of the sentiment / references / processed sinks.
def _batch_tables_sql() -> str:
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import lexicon_values_sql
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import _EPOCH_2024

    return f"""
    WITH lex(word, score) AS (VALUES {lexicon_values_sql()}),
    surv AS (
        SELECT doc_id, text, doc_id % 3 AS batch,
               make_timestamp(({_EPOCH_2024} + doc_id) * 1000000) AS created_time
        FROM documents
        WHERE doc_id % 97 <> 0
          AND text IS NOT NULL AND text <> '' AND length(text) > 10
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM surv
    ),
    valence AS (
        SELECT t.doc_id, sum(coalesce(CAST(l.score AS DOUBLE), 0.0)) AS s
        FROM tok t LEFT JOIN lex l ON t.word = l.word
        GROUP BY t.doc_id
    ),
    sent AS (
        SELECT doc_id, round(s / sqrt(s * s + 15.0), 6) AS sentiment FROM valence
    )
    SELECT max(s.created_time)                    AS timestamp,
           round(avg(st.sentiment), 6)            AS average_sentiment,
           CAST(sum(len(regexp_extract_all(s.text, '/u/\\w+'))) AS DOUBLE)          AS total_user_refs,
           CAST(sum(len(regexp_extract_all(s.text, '/r/\\w+'))) AS DOUBLE)          AS total_sub_refs,
           CAST(sum(len(regexp_extract_all(s.text, 'https?://[^\\s]+'))) AS DOUBLE) AS total_urls,
           count(*)                               AS n_posts
    FROM surv s JOIN sent st USING (doc_id)
    GROUP BY s.batch
    ORDER BY timestamp
    """


from reddit_sentiment_spark_streaming_pipeline_spark.registry import register  # noqa: E402


@register(
    "posts_batch_result_tables",
    oracle=_batch_tables_sql(),
    doc="K1-K3 end-to-end: the synthetic wire fixture drained through the "
    "REAL Structured Streaming foreachBatch pipeline (3 deterministic "
    "micro-batches, one chunk file per trigger), then the committed "
    "sentiment / references / processed sink tables read back and "
    "reconciled per batch — a green row proves the streaming sink "
    "CONTENTS, not just the batch operators they reuse "
    "(reference reddit_consumer.py:282-444)",
)
def posts_batch_result_tables(spark, sf_dir: str) -> DataFrame:
    """Drain → read-back → reconcile. The per-batch timestamp (max
    surviving created_time) is the join key across sink tables: it is
    unique per batch and independent of trigger order, so the check does
    not assume which chunk the engine picked up first.

    Fixture setup (3 tiny chunk writes) is test-scale machinery; the
    drained pipeline itself is the production path (one persisted parse
    per micro-batch feeding all five sinks)."""
    import glob
    import shutil
    import tempfile

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import synthetic_wire
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import (
        _order_files_by_name,
        read_wire_stream,
    )

    # pid-keyed path: the returned frame lazily reads the sink parquet, so
    # the directory must outlive this function — but a FIXED shared path
    # would let two concurrent processes (oracle sweep + pytest on the
    # same sf) rmtree each other's in-flight streaming drain. Stale
    # siblings from dead processes are reaped by age so /tmp stays
    # bounded at ~one copy per live process.
    parent = os.path.join(tempfile.gettempdir(), "spark_graft_roundtrips")
    prefix = "posts_batch_" + os.path.basename(os.path.normpath(sf_dir)) + "_"
    if os.path.isdir(parent):
        import time as _time

        cutoff = _time.time() - 2 * 3600
        for d in os.listdir(parent):
            p = os.path.join(parent, d)
            if d.startswith(prefix) and os.path.isdir(p):
                try:
                    if os.path.getmtime(p) < cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    pass
    root = os.path.join(parent, prefix + str(os.getpid()))
    shutil.rmtree(root, ignore_errors=True)
    chunks = os.path.join(root, "wire")
    os.makedirs(chunks)
    wire = synthetic_wire(spark, sf_dir, n_batches=3)
    for b in range(3):
        part_dir = os.path.join(root, f"_part{b}")
        (
            wire.filter(F.col("batch") == b)
            .select("value")
            .coalesce(1)
            .write.mode("overwrite")
            .text(part_dir)
        )
        src = glob.glob(os.path.join(part_dir, "part-*"))[0]
        os.replace(src, os.path.join(chunks, f"{b:03d}.txt"))
        shutil.rmtree(part_dir, ignore_errors=True)
    _order_files_by_name(chunks, ".txt")

    out_root = os.path.join(root, "tables")
    q = start_posts_pipeline(read_wire_stream(spark, chunks), out_root)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sinks = PostsSinks(out_root)
    sent = spark.read.parquet(sinks.sentiment_dir)
    refs = spark.read.parquet(sinks.refs_dir)
    proc = (
        spark.read.parquet(sinks.processed_dir)
        .groupBy("batch_id")
        .agg(
            F.max("created_time").alias("timestamp"),
            F.count(F.lit(1)).alias("n_posts"),
        )
        .select("timestamp", "n_posts")
    )
    return (
        sent.join(refs, "timestamp")
        .join(proc, "timestamp")
        .select(
            "timestamp", "average_sentiment", "total_user_refs",
            "total_sub_refs", "total_urls", "n_posts",
        )
        .orderBy("timestamp")
    )
