"""Measure compact_store's payoff as a function of store partition count.

The gate's batch-owned store layout pays one directory per micro-batch;
`compact_store` exists to bound the resulting partition-listing and
small-file overhead on every subsequent batch's store scan. The r7 A/B
(REHEARSAL_r07_compaction.json) proved the op membership-safe but
recorded NO wall win at its scale (~100 partitions of real data, ratio
1.03) — this tool answers the open question from the r7 verdict: WHERE
does compaction start to pay?

Protocol (listing-overhead test, not a data-volume test):
  for each partition count P in the sweep:
    1. synthesize a fingerprint store with P batch-owned partitions,
       each holding a handful of tiny rows (one small parquet file per
       partition — the long-lifetime stream shape);
    2. time `gate_batch` for an incoming micro-batch of fresh docs
       against the P-partition store (min of REPS, fresh copy each rep
       since gate_batch mutates the store);
    3. compact_store the store to ONE history partition and time the
       same micro-batch again (min of REPS);
  and report wall ratios + the admitted-set equality check (compaction
  may never change admission).

Run:  python tools/compaction_payoff.py [--parts 64,256,1024,2048]
          [--reps 3] [--out REHEARSAL_r08_compaction_payoff.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.dedup import (  # noqa: E402
    compact_store,
    gate_batch,
)

ROWS_PER_PART = 8  # tiny on purpose: the cost under test is listing, not data


def synth_store(spark, store_dir: str, n_parts: int) -> None:
    """P batch-owned partitions, one small file each, ROWS_PER_PART rows
    of synthetic-but-well-formed fingerprints per partition."""
    rows = (
        spark.range(n_parts * ROWS_PER_PART)
        .select(
            F.md5(F.concat(F.lit("hist:"), F.col("id"))).alias("fingerprint"),
            F.col("id").alias("doc_id"),
            F.lit("hist").alias("source"),
            (F.col("id") % n_parts).alias("batch_id"),
        )
    )
    (
        rows.repartition(n_parts, "batch_id")
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def fresh_batch(spark, n_rows: int = 5000):
    """An incoming micro-batch disjoint from the synthetic history."""
    return spark.range(n_rows).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("fresh document "), F.col("id")).alias("text"),
        F.lit("batch").alias("source"),
    )


def time_gate(spark, store_src: str, work: str, batch_df, batch_id: int,
              reps: int) -> tuple[float, set]:
    """Min-of-reps wall for one gate_batch against a copy of store_src.
    Returns (min_sec, admitted fingerprint set of the last rep)."""
    best = float("inf")
    admitted: set = set()
    for r in range(reps):
        store = os.path.join(work, f"store_run_{r}")
        stats = os.path.join(work, f"stats_run_{r}")
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(stats, ignore_errors=True)
        shutil.copytree(store_src, store)
        t0 = time.monotonic()
        gate_batch(batch_df, batch_id, store, stats)
        best = min(best, time.monotonic() - t0)
        admitted = {
            row[0]
            for row in spark.read.parquet(
                os.path.join(store, f"batch_id={batch_id}")
            ).select("fingerprint").collect()
        }
        shutil.rmtree(store)
        shutil.rmtree(stats)
    return best, admitted


def main() -> None:
    args = list(sys.argv[1:])
    parts = [64, 256, 1024, 2048]
    if "--parts" in args:
        i = args.index("--parts")
        parts = [int(x) for x in args[i + 1].split(",")]
        del args[i : i + 2]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    work = args[0] if args else "/tmp/compaction_payoff"

    spark = get_spark("compaction-payoff")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    batch_df = fresh_batch(spark)
    batch_df.persist().count()

    curve = []
    for p in parts:
        raw = os.path.join(work, f"store_p{p}")
        synth_store(spark, raw, p)
        t_raw, adm_raw = time_gate(
            spark, raw, work, batch_df, batch_id=p, reps=reps)

        compacted = os.path.join(work, f"store_p{p}_compacted")
        shutil.copytree(raw, compacted)
        folded = compact_store(spark, compacted, p)
        n_dirs = len([d for d in os.listdir(compacted)
                      if d.startswith("batch_id=")])
        t_cmp, adm_cmp = time_gate(
            spark, compacted, work, batch_df, batch_id=p, reps=reps)

        curve.append({
            "store_partitions": p,
            "store_rows": p * ROWS_PER_PART,
            "compacted_partitions": n_dirs,
            "compacted_rows": folded,
            "gate_batch_sec_uncompacted": round(t_raw, 3),
            "gate_batch_sec_compacted": round(t_cmp, 3),
            "speedup_x": round(t_raw / t_cmp, 2),
            "admitted_equal": adm_raw == adm_cmp,
        })
        print(json.dumps(curve[-1]), flush=True)
        shutil.rmtree(raw)
        shutil.rmtree(compacted)

    out = {
        "rehearsal": "compaction_payoff_curve",
        "reps": reps,
        "batch_rows": 5000,
        "rows_per_store_partition": ROWS_PER_PART,
        "curve": curve,
        "pass": all(c["admitted_equal"] for c in curve),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
