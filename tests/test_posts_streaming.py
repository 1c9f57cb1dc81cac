"""The full reference consumer over the wire stream: five sink tables,
socket-source parity."""

from __future__ import annotations

import json
import os
import socket
import threading
import time

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import parse_posts, synthetic_wire
from reddit_sentiment_spark_streaming_pipeline_spark.streaming import posts as P
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import (
    read_wire_socket,
    read_wire_stream,
    write_wire_chunks,
)


def test_posts_pipeline_five_tables(spark, sf_dir, tmp_path):
    wire_dir = str(tmp_path / "wire")
    n_lines = write_wire_chunks(synthetic_wire(spark, sf_dir), wire_dir, n_chunks=3)
    out_root = str(tmp_path / "out")
    q = P.start_posts_pipeline(read_wire_stream(spark, wire_dir), out_root)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sinks = P.PostsSinks(out_root)

    raw = spark.read.parquet(sinks.raw_dir)
    assert raw.count() == n_lines  # K1 keeps keepalives + malformed lines

    processed = spark.read.parquet(sinks.processed_dir)
    batch_posts = P.enrich_posts(synthetic_wire(spark, sf_dir))
    assert processed.count() == batch_posts.count()
    n_batches = processed.select("batch_id").distinct().count()
    assert n_batches >= 2  # micro-batching actually happened

    # sentiment: one row per batch, each equal to the per-batch average
    # recomputed from the processed table (modulo the written rounding)
    sent = spark.read.parquet(sinks.sentiment_dir)
    assert sent.count() == n_batches
    recomputed = (
        processed.groupBy("batch_id")
        .agg(F.round(F.avg("sentiment"), 6).alias("expect"))
    )
    per_batch = (
        processed.groupBy("batch_id").agg(F.max("created_time").alias("timestamp"))
        .join(sent, "timestamp")
        .join(recomputed, "batch_id")
    )
    assert per_batch.count() == n_batches
    bad = per_batch.filter(F.abs(F.col("average_sentiment") - F.col("expect")) > 1e-9)
    assert bad.count() == 0

    # subreddit_stats re-aggregates to the full post count
    stats = spark.read.parquet(sinks.stats_dir)
    assert stats.agg(F.sum("post_count")).first()[0] == batch_posts.count()
    assert stats.filter(F.col("unique_authors") < 1).count() == 0

    # references grand totals across batches == batch-mode totals
    refs = spark.read.parquet(sinks.refs_dir)
    assert refs.count() == n_batches
    got = refs.agg(F.sum("total_user_refs"), F.sum("total_sub_refs"), F.sum("total_urls")).first()
    want = P.references_totals_frame(batch_posts).first()
    assert tuple(got) == tuple(want)


def test_socket_wire_source(spark):
    """S1 parity: real TCP server → socket source → parse_posts."""
    lines = []
    for i in range(30):
        lines.append(json.dumps({
            "type": "submission", "subreddit": f"sub{i % 3}", "id": str(i),
            "text": f"hello world this is post number {i}",
            "created_utc": 1704067200.0 + i, "author": f"user{i % 5}",
        }))
        if i % 10 == 0:
            lines.append(json.dumps({"type": "keepalive", "created_utc": 1704067200.0 + i}))

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(timeout=60)  # keep the connection open until told

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    q = (
        parse_posts(read_wire_socket(spark, "127.0.0.1", port))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("socket_posts")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if spark.sql("SELECT count(*) c FROM socket_posts").first().c == 30:
                break
            time.sleep(0.5)
        got = spark.sql("SELECT * FROM socket_posts").toPandas()
    finally:
        q.stop()
        stop.set()
        server.close()
    assert len(got) == 30  # keepalives dropped by the P2 predicates
    assert set(got.subreddit) == {"sub0", "sub1", "sub2"}
    assert got.text_length.min() > 10


def test_windowed_sentiment_stream_matches_batch(spark, sf_dir, tmp_path):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.windows import windowed_subreddit_sentiment
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts import windowed_sentiment_stream

    wire_dir = str(tmp_path / "wire")
    write_wire_chunks(synthetic_wire(spark, sf_dir), wire_dir, n_chunks=3)
    # complete mode: sf0.001's wire spans <1 window, so append-mode would
    # emit nothing until the watermark passes — complete gives the final
    # table, which must equal the batch query exactly
    q = (
        windowed_sentiment_stream(read_wire_stream(spark, wire_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("wss_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    keys = ["window_start", "subreddit"]
    got = spark.sql("SELECT * FROM wss_test").toPandas().sort_values(keys, ignore_index=True)
    batch = windowed_subreddit_sentiment(spark, sf_dir).toPandas()
    assert len(got) == len(batch) > 0
    assert (got[keys + ["n_posts", "avg_sentiment"]]
            == batch[keys + ["n_posts", "avg_sentiment"]]).all().all()


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts import deduped_posts_stream

    wire = synthetic_wire(spark, sf_dir)
    # at-least-once delivery: the first chunk is replayed verbatim
    wire_dir = str(tmp_path / "wire")
    write_wire_chunks(wire, wire_dir, n_chunks=3)
    import shutil
    first = sorted(f for f in os.listdir(wire_dir) if f.endswith(".txt"))[0]
    shutil.copy(os.path.join(wire_dir, first), os.path.join(wire_dir, "zz_replayed.txt"))

    q = (
        deduped_posts_stream(read_wire_stream(spark, wire_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_posts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT id, count(*) n FROM dedup_posts GROUP BY id").toPandas()
    n_distinct = parse_posts(wire).select("id").distinct().count()
    assert len(got) == n_distinct  # every post exactly once
    assert got.n.max() == 1  # the replayed chunk produced no duplicates


def test_stream_static_enrichment_join(spark, sf_dir, tmp_path):
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts import enriched_posts_stream, subreddit_dim

    wire_dir = str(tmp_path / "wire")
    write_wire_chunks(synthetic_wire(spark, sf_dir), wire_dir, n_chunks=3)
    dim = subreddit_dim(spark, sf_dir)
    q = (
        enriched_posts_stream(read_wire_stream(spark, wire_dir), dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_posts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT count(*) n, count(category) with_cat FROM enriched_posts"
    ).first()
    want = parse_posts(synthetic_wire(spark, sf_dir)).count()
    assert got.n == want
    assert got.with_cat == want  # every subreddit resolved in the static dim


def test_wire_chunks_are_event_time_ordered(spark, sf_dir, tmp_path):
    """Replay order must be event-time order: chunk files (replayed in
    filename/mtime order) carry disjoint, increasing created_utc ranges,
    so a watermarked consumer never depends on watermark slack exceeding
    the fixture's full time spread."""
    import glob
    import json
    import os

    wire_dir = str(tmp_path / "wire")
    write_wire_chunks(synthetic_wire(spark, sf_dir), wire_dir, n_chunks=3)
    ranges = []
    for fn in sorted(glob.glob(os.path.join(wire_dir, "*.txt"))):
        times = []
        with open(fn) as f:
            for line in f:
                try:
                    cu = json.loads(line).get("created_utc")
                except ValueError:
                    continue
                if isinstance(cu, (int, float)):
                    times.append(cu)
        if times:
            ranges.append((min(times), max(times)))
    assert len(ranges) >= 2
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"chunk event-time ranges overlap: {ranges}"


def test_posts_batch_result_tables_query(spark, sf_dir, duck):
    """The registered drain-and-reconcile query: 3 deterministic batches,
    sink contents equal the DuckDB closed form."""
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    spec = registry.load_all()["posts_batch_result_tables"]
    got = spec.fn(spark, sf_dir).toPandas()
    assert len(got) == 3  # one row per micro-batch
    exp = duck.execute(spec.oracle).df()
    assert list(got.columns) == list(exp.columns)
    assert got["n_posts"].sum() == exp["n_posts"].sum()
    # per-batch reconciliation on the closed-form join key
    g = got.sort_values("timestamp").reset_index(drop=True)
    e = exp.sort_values("timestamp").reset_index(drop=True)
    assert (g["timestamp"] == e["timestamp"]).all()
    assert (g["n_posts"] == e["n_posts"]).all()
    assert (g["total_user_refs"] == e["total_user_refs"]).all()
    assert abs(g["average_sentiment"] - e["average_sentiment"]).max() < 1e-6
