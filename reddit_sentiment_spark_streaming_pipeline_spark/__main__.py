"""Runnable CLI: the reference's three programs under one entry point.

The reference ships as three processes the user runs by hand — a producer
(reference reddit_producer.py: Reddit API -> JSON lines over TCP), a Spark
consumer (reference reddit_consumer.py:473-516: socket source -> parse ->
five output tables), and a dashboard (reference streamlit_app.py: reads
the tables back and renders panels). This module is the engine's
equivalent surface:

    python -m reddit_sentiment_spark_streaming_pipeline_spark produce --sf-dir /root/testdata/sf0.001 --out /tmp/wire
    python -m reddit_sentiment_spark_streaming_pipeline_spark produce --serve 19555 --sf-dir ...   # TCP mode
    python -m reddit_sentiment_spark_streaming_pipeline_spark consume --wire /tmp/wire --out /tmp/pipeline
    python -m reddit_sentiment_spark_streaming_pipeline_spark consume --socket 127.0.0.1:19555 --out /tmp/pipeline --follow
    python -m reddit_sentiment_spark_streaming_pipeline_spark dashboard --out /tmp/pipeline
    python -m reddit_sentiment_spark_streaming_pipeline_spark query event_stats --sf-dir /root/testdata/sf0.01
    python -m reddit_sentiment_spark_streaming_pipeline_spark list

`produce` replaces the external Reddit API with the deterministic wire
fixture (same 6-field contract incl. keepalives and corrupt lines);
`consume` is the full foreachBatch fan-out (raw/processed/sentiment/
subreddit_stats/references) with optional size-bounded retention;
`dashboard` prints what streamlit_app.py charts, straight from the sinks.
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark(app: str):
    from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark

    return get_spark(f"reddit_sentiment_spark_streaming_pipeline_spark-{app}")


def cmd_produce(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import synthetic_wire
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import write_wire_chunks

    spark = _spark("produce")
    wire = synthetic_wire(spark, args.sf_dir)
    if args.serve:
        # TCP mode (reference reddit_producer.py:150-183): stream the wire
        # lines to one consumer connection, newline-delimited.
        import socket

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((args.host, args.serve))
        srv.listen(1)
        print(f"serving wire fixture on {args.host}:{args.serve} ...",
              file=sys.stderr)
        conn, peer = srv.accept()
        print(f"consumer connected: {peer}", file=sys.stderr)
        n = 0
        with conn:
            # toLocalIterator streams one partition at a time to the
            # producer process — the fixture never materializes fully.
            for row in wire.toLocalIterator():
                conn.sendall((row.value + "\n").encode())
                n += 1
            import time as _t

            _t.sleep(args.linger)  # let the socket source drain
        print(f"served {n} wire lines", file=sys.stderr)
        return 0
    n = write_wire_chunks(wire, args.out, n_chunks=args.chunks)
    print(f"wrote {n} wire chunk files to {args.out}", file=sys.stderr)
    return 0


def cmd_consume(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts import start_posts_pipeline
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import read_wire_socket, read_wire_stream

    spark = _spark("consume")
    if args.socket:
        host, _, port = args.socket.partition(":")
        wire = read_wire_socket(spark, host, int(port))
    else:
        wire = read_wire_stream(spark, args.wire)
    q = start_posts_pipeline(wire, args.out, retention_bytes=args.retention_bytes)
    if args.follow:
        print("consuming (ctrl-c to stop) ...", file=sys.stderr)
        try:
            q.awaitTermination()
        except KeyboardInterrupt:
            q.stop()
    else:
        q.processAllAvailable()
        q.stop()
        print(f"drained wire into {args.out}", file=sys.stderr)
    return 0


def cmd_dashboard(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import show_console
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts import PostsSinks

    from pyspark.sql import functions as F

    spark = _spark("dashboard")
    sinks = PostsSinks(args.out)
    panels = [
        ("latest posts", sinks.processed_dir,
         lambda df: df.select(
             "subreddit", "id", "author", "created_time",
             "text_length", "sentiment",
         ).orderBy(F.desc("created_time"), "id").limit(args.n)),
        ("sentiment over time", sinks.sentiment_dir,
         lambda df: df.orderBy(F.desc("timestamp")).limit(args.n)),
        ("subreddit stats", sinks.stats_dir,
         lambda df: df.groupBy("subreddit").agg(
             F.sum("post_count").alias("post_count"),
             F.max("unique_authors").alias("unique_authors"),
             F.round(F.avg("avg_length"), 2).alias("avg_length"),
         ).orderBy(F.desc("post_count"), "subreddit")),
        ("reference totals", sinks.refs_dir,
         lambda df: df.groupBy().agg(
             F.sum("total_user_refs").alias("total_user_refs"),
             F.sum("total_sub_refs").alias("total_sub_refs"),
             F.sum("total_urls").alias("total_urls"),
         )),
    ]
    for title, path, shape in panels:
        print(f"== {title} ({path})")
        if not os.path.isdir(path):
            print("   (no data yet)")
            continue
        show_console(shape(spark.read.parquet(path)), n=args.n)
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark import registry
    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import show_console

    spark = _spark("query")
    show_console(registry.get(args.name).fn(spark, args.sf_dir), n=args.n)
    return 0


def cmd_plan(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    spark = _spark("plan")
    registry.get(args.name).fn(spark, args.sf_dir).explain(args.mode)
    return 0


def cmd_gate(args: argparse.Namespace) -> int:
    """Streaming incremental dedup gate: chunk the corpus, drain it
    through the fingerprint-store gate, print per-batch admissions."""
    import os as _os

    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import show_console
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.dedup import (
        read_doc_stream,
        read_gate_stats,
        start_dedup_gate,
        write_doc_chunks,
    )

    spark = _spark("gate")
    # same resume-only contract as cmd_ingest: a durable checkpoint under
    # --out means the default chunk paths were already consumed
    if _os.path.isdir(_os.path.join(args.out, "_checkpoint")):
        print(
            f"existing checkpoint under {args.out}: resume-only mode — "
            f"reusing chunks in {args.chunks_dir} (not re-chunking)",
            file=sys.stderr,
        )
    else:
        n = write_doc_chunks(
            spark, args.sf_dir, args.chunks_dir, n_chunks=args.chunks
        )
        print(f"wrote {n} docs as {args.chunks} replay chunks", file=sys.stderr)
    # the gate's outputs are durable across runs (that is the point); note
    # any batches already in the stats so the report covers THIS run only
    prev_max = -1
    if _os.path.isdir(_os.path.join(args.out, "gate_stats")):
        row = read_gate_stats(spark, args.out).agg(F.max("batch_id")).first()
        prev_max = -1 if row[0] is None else row[0]
    q = start_dedup_gate(read_doc_stream(spark, args.chunks_dir), args.out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stats = (
        read_gate_stats(spark, args.out)
        .filter(F.col("batch_id") > prev_max)
        .orderBy("batch_id")
    )
    show_console(stats, n=args.chunks + 1)
    return 0


def cmd_ingest(args: argparse.Namespace) -> int:
    """Composed streaming ingest pipeline: chunk the ingest corpus,
    freeze the DSIR model from the calibration slice, drain exact →
    near-dup → selection, print the per-batch stage funnel."""
    import os as _os

    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.ingest import ingest_cal_docs
    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import show_console
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.ingest import (
        read_ingest_stats,
        read_ingest_stream,
        start_ingest_pipeline,
        write_ingest_chunks,
    )

    spark = _spark("ingest")
    # a prior run's durable checkpoint already marks the default chunk
    # paths as consumed — re-chunking over them would drain nothing (or a
    # misleading subset). Detect the checkpoint and run resume-only: the
    # existing chunks replay from where the checkpoint left off.
    if _os.path.isdir(_os.path.join(args.out, "_checkpoint")):
        print(
            f"existing checkpoint under {args.out}: resume-only mode — "
            f"reusing chunks in {args.chunks_dir} (not re-chunking)",
            file=sys.stderr,
        )
    else:
        n = write_ingest_chunks(
            spark, args.sf_dir, args.chunks_dir, n_chunks=args.chunks
        )
        print(f"wrote {n} docs as {args.chunks} replay chunks", file=sys.stderr)
    prev_max = -1
    if _os.path.isdir(_os.path.join(args.out, "ingest_stats")):
        row = read_ingest_stats(spark, args.out).agg(F.max("batch_id")).first()
        prev_max = -1 if row[0] is None else row[0]
    q = start_ingest_pipeline(
        read_ingest_stream(spark, args.chunks_dir), args.out,
        ingest_cal_docs(spark, args.sf_dir),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stats = (
        read_ingest_stats(spark, args.out)
        .filter(F.col("batch_id") > prev_max)
        .orderBy("batch_id")
    )
    show_console(stats, n=args.chunks + 1)
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    for name, spec in registry.load_all().items():
        oracle = "oracle" if spec.oracle else "rows-only"
        print(f"{name:36s} [{oracle}] {spec.doc.split('.')[0][:80]}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="reddit_sentiment_spark_streaming_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("produce", help="write or serve the wire fixture")
    pp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pp.add_argument("--out", default="/tmp/reddit_sentiment_spark_streaming_pipeline_wire")
    pp.add_argument("--chunks", type=int, default=4)
    pp.add_argument("--serve", type=int, default=0, metavar="PORT")
    pp.add_argument("--host", default="127.0.0.1")
    pp.add_argument("--linger", type=float, default=15.0,
                    help="seconds to keep the TCP connection open after the last line")
    pp.set_defaults(fn=cmd_produce)

    pc = sub.add_parser("consume", help="run the five-table consumer pipeline")
    src = pc.add_mutually_exclusive_group()
    src.add_argument("--wire", default="/tmp/reddit_sentiment_spark_streaming_pipeline_wire")
    src.add_argument("--socket", metavar="HOST:PORT")
    pc.add_argument("--out", default="/tmp/reddit_sentiment_spark_streaming_pipeline_out")
    pc.add_argument("--retention-bytes", type=int, default=None)
    pc.add_argument("--follow", action="store_true")
    pc.set_defaults(fn=cmd_consume)

    pd = sub.add_parser("dashboard", help="print the dashboard panels")
    pd.add_argument("--out", default="/tmp/reddit_sentiment_spark_streaming_pipeline_out")
    pd.add_argument("-n", type=int, default=10)
    pd.set_defaults(fn=cmd_dashboard)

    pq = sub.add_parser("query", help="run one registry query")
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("-n", type=int, default=20)
    pq.set_defaults(fn=cmd_query)

    pe = sub.add_parser("plan", help="explain one registry query's physical plan")
    pe.add_argument("name")
    pe.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pe.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost", "codegen"])
    pe.set_defaults(fn=cmd_plan)

    pg = sub.add_parser("gate", help="run the streaming incremental dedup gate")
    pg.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pg.add_argument("--chunks-dir", default="/tmp/reddit_sentiment_spark_streaming_pipeline_doc_chunks")
    pg.add_argument("--chunks", type=int, default=4)
    pg.add_argument("--out", default="/tmp/reddit_sentiment_spark_streaming_pipeline_gate")
    pg.set_defaults(fn=cmd_gate)

    pi = sub.add_parser(
        "ingest", help="run the composed streaming ingest pipeline"
    )
    pi.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pi.add_argument("--chunks", type=int, default=4)
    pi.add_argument("--chunks-dir", default="/tmp/reddit_sentiment_spark_streaming_pipeline_ingest_chunks")
    pi.add_argument("--out", default="/tmp/reddit_sentiment_spark_streaming_pipeline_ingest")
    pi.set_defaults(fn=cmd_ingest)

    pl = sub.add_parser("list", help="list registry queries")
    pl.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
