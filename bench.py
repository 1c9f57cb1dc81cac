"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the noop datasource sink — the full plan runs
JVM-side (scan → shuffle → agg → sink) without collect()-to-driver cost,
so timings reflect engine throughput, not Py4J serialization. One small
warm-up query absorbs JVM/codegen startup so per-query numbers are
comparable across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

from reddit_sentiment_spark_streaming_pipeline_spark import registry  # noqa: E402
from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

# One per workload category (SURVEY §2 + training-data extensions):
HEADLINE = [
    "event_stats",               # flagship grouped agg (A4/A5/O2)
    "wire_posts_pipeline",       # JSON wire parse + filter + derive (P1-P3)
    "doc_sentiment",             # lexicon sentiment, built-in expressions (U1)
    "doc_sentiment_vader",       # full VADER heuristics, column algebra (U1)
    "refs_rollup",               # regexp_extract_all + ROLLUP (F3-F6, A7/A8)
    "tfidf_topk",                # keyword query (§2.11)
    "q1_pricing_summary",        # heavy scan+agg at lineitem scale
    "supplier_running_revenue",  # ordered analytics at fact scale (W1-W4)
    "regional_customer_value",   # star join, broadcast dims (J1)
    "windowed_event_counts",     # event-time tumbling windows (T2)
    "session_windows",           # sessionization
    "windowed_subreddit_sentiment",  # full wire pipeline under event-time windows
    "minhash_near_dups",         # MinHash+LSH near-dup dedup
    "repeated_ngram_spans",      # exact substring (repeated-span) dedup
    "embedding_near_dups",       # embedding-cosine near-dup dedup
    "cosine_topk",               # embedding similarity search (exact)
    "ivf_ann_topk",              # embedding similarity search (IVF ANN)
    "rolling_sentiment_band",    # dashboard rolling mean/stddev band
    "token_stats",               # text analysis / token counting
    "bpe_token_counts",          # BPE-ish tokenizer counts
    "media_frame_samples",       # multimodal mapInPandas frame sampling
    "pii_redaction",             # PII regex scan + redact (zero shuffle)
    "benchmark_contamination",   # n-gram overlap vs broadcast benchmark set
    "repetition_stats",          # repetition-based quality filter
    "unigram_logprob_scores",    # unigram-LM quality (broadcast vocab head)
    "winnowing_overlap_pairs",   # MOSS winnowing contamination index join
    "prefix_editdist_dups",      # prefix-blocked Levenshtein near-dup verify
    "cms_heavy_hitters",         # count-min sketch vs exact heavy hitters
    "bigram_pmi_topk",           # PMI collocations (phrase detection)
    "resample_gapfill",          # time-series regular grid + forward fill
    "merge_upsert_orders",       # MERGE INTO upsert (union + keep-last)
    "corpus_curation_pipeline",  # filter->dedup->redact->split in one plan
    "semantic_dedup_prune",      # SemDeDup: cluster-partitioned cosine prune
    "doc_chunks",                # overlapping token-window chunking (map-only)
    "dsir_logratio_scores",      # DSIR importance-weighted data selection
    "semantic_decontam_flags",   # embedding-space eval-set decontamination
    "incremental_selection_gate",  # frozen-model DSIR admission (batch twin)
    "incremental_ingest_pipeline",  # composed exact->neardup->selection twin
]


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_streaming_replay(spark, sf_dir: str, n_chunks: int = 10) -> float:
    """Drain the whole events table through the watermarked event-time
    windowed aggregation via Structured Streaming; returns seconds.

    Chunk writing is setup and untimed — the measured span is the
    Structured Streaming engine processing every micro-batch (the
    reference's operating mode, reddit_consumer.py:495-502). The drain
    reads 2 ts-ordered chunk files per trigger (10 chunks → 5 batches):
    per-trigger overhead (state-store commit + progress bookkeeping)
    dominates at this volume, and a production stream under backpressure
    would batch the backlog the same way rather than replay one file per
    trigger.
    """
    import shutil
    import tempfile

    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.pipeline import start_windowed_query
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import (
        read_replay_stream,
        write_replay_chunks,
    )

    replay_dir = tempfile.mkdtemp(prefix="bench_replay_")
    try:
        write_replay_chunks(spark, sf_dir, replay_dir, n_chunks=n_chunks)
        # untimed: the session's FIRST stateful streaming query pays one-off
        # engine setup (streaming classloading, state-store provider init,
        # checkpoint manager) — absorb it with a single-batch drain of the
        # same windowed-agg shape over one tiny chunk, so the timed span
        # measures micro-batch throughput, not first-query setup.
        warm_dir = tempfile.mkdtemp(prefix="bench_replay_warm_")
        try:
            import glob
            import shutil as _sh
            first_chunk = sorted(glob.glob(os.path.join(replay_dir, "*.parquet")))[0]
            _sh.copy(first_chunk, warm_dir)
            wq = start_windowed_query(read_replay_stream(spark, warm_dir),
                                      "bench_wq_warm", state_partitions=4)
            wq.processAllAvailable()
            wq.stop()
        finally:
            shutil.rmtree(warm_dir, ignore_errors=True)
        # State partitions sized to stream volume (~30k rows/batch), not
        # core count: each partition's state store pays a commit per batch,
        # which dominates at this scale (measured at sf0.1: 15.7s @ 32,
        # 6.4s @ 8, 5.0s @ 4 — 4 keeps headroom without paying for empty
        # store commits; a production stream re-sizes this to its volume).
        # Min-of-2 drains (fresh checkpoint each) for the same
        # interference-rejection as the batch timings.
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            q = start_windowed_query(
                read_replay_stream(spark, replay_dir, max_files_per_trigger=2),
                f"bench_wq_{rep}", state_partitions=4)
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)


def time_streaming_socket_replay(spark, sf_dir: str) -> float:
    """S1 (the reference's socket wire source, reddit_consumer.py:143-152)
    under the bench harness: the same events fixture as streaming_replay
    served over a localhost TCP socket and drained through the identical
    watermarked windowed aggregation. What differs from the file replay is
    the ingestion edge — TCP framing, driver-side line buffering, and
    arrival-batched (rather than file-bounded) triggers — so a number
    within ~2x of streaming_replay says the socket edge adds no
    pathological cost. Serialization dump + TCP serve are setup (untimed);
    the timed span is payload release → all lines aggregated. The server
    holds the payload until the query's warm-up batch has committed:
    releasing at t0 otherwise races the first offset snapshot, and the
    lap goes bimodal on whether the rows ride the warm-up batch or
    serialize behind it (measured 3.9 ↔ 12.9 s across identical laps).
    """
    import glob
    import shutil
    import socket as socketlib
    import tempfile
    import threading

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.pipeline import start_windowed_query
    from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import read_wire_socket

    dump_dir = tempfile.mkdtemp(prefix="bench_socket_wire_")
    try:
        # distributed JSONL dump; ts as epoch micros for an exact round-trip.
        # Range-partitioned and sorted on ts (like write_replay_chunks):
        # part files concatenated in name order give a globally event-time-
        # ordered wire, so the 2h watermark never drops rows regardless of
        # how the source parquet was laid out — an unordered dump would
        # silently shrink the aggregation work on any multi-file fixture.
        ev = load_table(spark, sf_dir, "events")
        (
            ev.repartitionByRange(8, "ts")
            .sortWithinPartitions("ts")
            .select(
                F.to_json(
                    F.struct(
                        "event_id",
                        F.unix_micros("ts").alias("ts_us"),
                        "user_id",
                        "event_type",
                        "value",
                    )
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(dump_dir)
        )
        files = sorted(glob.glob(os.path.join(dump_dir, "part-*")))
        chunks = [open(f, "rb").read() for f in files]
        payload = b"".join(chunks)
        n = payload.count(b"\n")

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts_us", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )

        def drain_once(rep: int) -> float:
            server = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_STREAM)
            server.setsockopt(socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1)
            server.bind(("127.0.0.1", 0))
            server.listen(1)
            port = server.getsockname()[1]
            stop_evt = threading.Event()
            go_evt = threading.Event()

            def serve() -> None:
                try:
                    conn, _ = server.accept()
                except OSError:
                    return
                with conn:
                    # covers the warm-up's own 300s budget plus slack —
                    # a timeout here would silently drop the payload
                    if not go_evt.wait(timeout=360):
                        return
                    try:
                        conn.sendall(payload)
                    except OSError:
                        return
                    stop_evt.wait(timeout=300)

            threading.Thread(target=serve, daemon=True).start()
            wire = read_wire_socket(spark, "127.0.0.1", port)
            parsed = (
                wire.select(F.from_json("value", schema).alias("d"))
                .select(
                    "d.event_id",
                    F.timestamp_micros(F.col("d.ts_us")).alias("ts"),
                    "d.user_id",
                    "d.event_type",
                    "d.value",
                )
            )
            q = start_windowed_query(parsed, f"bench_socket_{rep}",
                                     state_partitions=4)
            try:
                # hold the payload until the warm-up batch committed (the
                # deterministic-lap contract in the docstring above).
                # The warm-up gets its OWN deadline: sharing one budget
                # with the drain loop would let a slow warm-up eat the
                # drain's 300s and raise a spurious "truncated" error on
                # a healthy stream. 60s is already ~20x the observed
                # warm-up; a louder, shorter failure beats a silent
                # multi-minute stall if Spark ever stops emitting the
                # zero-data batch-0 progress event this poll relies on.
                warm_deadline = time.monotonic() + 60
                while not q.recentProgress and time.monotonic() < warm_deadline:
                    time.sleep(0.02)
                if not q.recentProgress:
                    print(
                        f"WARN socket replay rep {rep}: no batch-0 progress "
                        "event within 60s warm-up; proceeding anyway",
                        file=sys.stderr,
                    )
                deadline = time.monotonic() + 300
                t0 = time.perf_counter()
                go_evt.set()
                # the socket source has no end-of-stream: poll cumulative
                # input rows across micro-batches until every line landed
                seen: dict[int, int] = {}
                while sum(seen.values()) < n and time.monotonic() < deadline:
                    for p in q.recentProgress:
                        seen[p["batchId"]] = p["numInputRows"]
                    time.sleep(0.05)
                q.processAllAvailable()
                for p in q.recentProgress:
                    seen[p["batchId"]] = p["numInputRows"]
            finally:
                q.stop()
                stop_evt.set()
                server.close()
            # a deadline hit means the drain did NOT complete — failing
            # loudly beats silently reporting the truncated elapsed time
            # as if it covered the full fixture
            if sum(seen.values()) < n:
                raise RuntimeError(
                    f"socket replay rep {rep} truncated: drained "
                    f"{sum(seen.values())}/{n} lines before the 300s "
                    "deadline"
                )
            return time.perf_counter() - t0

        return round(min(drain_once(r) for r in range(2)), 3)
    finally:
        shutil.rmtree(dump_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    specs = registry.load_all()

    # warm-up: JVM classloading + codegen, one Arrow/pandas-UDF round-trip
    # to fork the Python worker pool, and one footer-read per benched table
    # so scans measure engine throughput, not first-touch metadata I/O.
    run_noop(specs["latest_event"].fn(spark, sf_dir))
    import pandas as pd
    from pyspark.sql import functions as F

    def _ident(it):
        yield from it

    spark.createDataFrame(pd.DataFrame({"x": [1, 2]})).mapInPandas(
        _ident, "x bigint"
    ).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "lineitem", "orders", "customer",
              "nation", "region", "supplier"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).select(F.lit(1)).limit(1).write.format(
                "noop").mode("overwrite").save()
    # One untimed pass of every headline query at the smoke scale factor:
    # whole-stage codegen compiles per generated-class shape, and the first
    # action on a shape pays ~seconds of JIT regardless of data volume
    # (measured: minhash_near_dups 15.6s cold vs 2.9s warm at sf0.1).
    # Compiling on sf0.001 makes the timed sf0.1 numbers measure data-scale
    # throughput — what actually extrapolates to a cluster — not one-time
    # driver-side compilation.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    # normpath: a trailing-slash/unnormalized $SPARK_GRAFT_SF_DIR spelling of
    # the warm dir itself must not warm-run the timed dataset.
    if os.path.isdir(warm_dir) and os.path.normpath(warm_dir) != os.path.normpath(sf_dir):
        for name in HEADLINE:
            try:
                run_noop(specs[name].fn(spark, warm_dir))
            except Exception:  # noqa: BLE001 — warm-up is best-effort
                pass
        spark.catalog.clearCache()  # drop sf0.001 persists before timing

    # Each query is timed three times and the MINIMUM reported: the box
    # is shared, and a co-tenant burst during a single timing inflates it
    # 2-4x (observed; load_avg_1m below flags such runs). Min-of-N is the
    # standard interference-robust estimator of the engine's actual cost.
    # (r5: min-of-2 still let ambient load move per-query numbers ±30%
    # round-over-round; a third repeat measurably tightens the floor for
    # ~25s of extra bench wall.)
    #
    # Isolation between repeats (r13): queries that persist() internally
    # (minhash_near_dups, containment_pairs, cosine_topk, ...) register
    # those frames via caching.track(); Spark's CacheManager plan-matches
    # the logically identical subtree on repeats 2-3, which would report a
    # warm-cache floor instead of engine cost. Releasing the tracked
    # persists and clearing the cache AFTER each timed repeat (untimed)
    # keeps every repeat cold — each one re-executes the full plan from
    # the parquet inputs.
    from reddit_sentiment_spark_streaming_pipeline_spark import caching

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            run_noop(specs[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            caching.release_tracked()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    # Structured Streaming drain: the reference's operating mode — the whole
    # events table replayed as micro-batches through the watermarked
    # event-time windowed agg (not a registry query; timed end-to-end).
    timings["streaming_replay"] = time_streaming_replay(spark, sf_dir)
    # S1 parity lap: same volume and agg over the TCP socket source
    timings["streaming_socket_replay"] = time_streaming_socket_replay(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        # 1-minute load BEFORE this process's own burst is long gone, but
        # it still flags runs that shared the box (numbers inflate 2-4x
        # under host contention — interpret totals with this in view).
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
        "load_avg_1m": load1,
    }))


if __name__ == "__main__":
    main()
