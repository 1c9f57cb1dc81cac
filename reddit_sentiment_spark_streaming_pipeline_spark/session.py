"""SparkSession factory with scale-appropriate defaults.

The reference disables AQE and Arrow and leaves 200 shuffle partitions
(reference reddit_consumer.py:64-70) — all three are wrong for both the
tiny-batch case and the 100 TB case. Here: AQE on (runtime coalescing +
skew-join handling), Arrow on (vectorized pandas UDF / toPandas), shuffle
partitions sized to the local core count (on a real cluster this is set to
~2-3× total cores, or left to AQE's coalescer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "reddit_sentiment_spark_streaming_pipeline_spark",
              shuffle_partitions: int | None = None,
              driver_memory: str | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this workload.

    In production the same config block applies except master/memory come
    from the cluster manager; session timezone is pinned UTC so results are
    byte-comparable across engines and sites.
    """
    cpus = default_parallelism()
    shuffle = shuffle_partitions or cpus
    mem = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate synthesizes size(e) > 0 AND
        # isnotnull(e) under every explode and pushes both conjuncts to
        # the scan, re-evaluating the generator operand per input row.
        # Every exploded operand in this engine is an interpreted
        # higher-order expression (tokenizers, byte-n-gram transforms,
        # regexp_extract_all, quadratic bucket expansions) and is
        # essentially never empty, so the rule costs up to 2 extra
        # operand evaluations in the parallelism-bound scan stage and
        # prunes nothing — measured 19x wall at 10x data on the
        # byte-4-gram payload dedup pipeline. Excluding it is safe:
        # explode already drops empty/null arrays at the Generate.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Streaming state-store commit cost dominates high-frequency
        # micro-batches (the reference triggers every 10s): keep only the
        # checkpoint files recovery actually needs and stop compacting
        # deltas into snapshots on a fast-moving store — measured 5.8s →
        # 4.3s for the 10-batch sf0.1 replay drain. Recovery still works
        # (the checkpoint-resume test runs under these), it just replays
        # deltas instead of loading a snapshot.
        .config("spark.sql.streaming.minBatchesToRetain", "2")
        .config("spark.sql.streaming.stateStore.minDeltasForSnapshot", "100")
        # RocksDB state store + changelog checkpointing: per-batch commit
        # writes only the key deltas instead of snapshotting the store
        # (measured 5.3s → 4.1s on the 10-batch sf0.1 replay drain), and at
        # production scale keeps streaming state off-heap — the provider
        # you'd run with 100 GB of window state per executor.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def smoke_test(spark: SparkSession) -> bool:
    """Startup self-check (S3, reference reddit_consumer.py:473-475): a
    literal/range source round-trip proving the session executes jobs."""
    from pyspark.sql import functions as F

    return spark.range(1).select(F.lit(1).alias("ok")).count() == 1
