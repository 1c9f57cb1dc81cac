"""Quiet-box interleaved timing lap for one registry query.

The bench runs on a shared box, so round-over-round per-query deltas up
to ~1.4x have repeatedly turned out environmental (r5 minhash, r6
merge_upsert). This is the bisect protocol those verdicts prescribe,
as a reusable script: ONE warm process per code tree, mirroring
bench.py (sf0.001 codegen warm-up, clearCache, then N timed noop-sink
executions at the target sf), interleaving across trees at the SHELL
level so ambient load hits both trees alike:

    git worktree add /tmp/rNcode <results-commit>
    for i in 1 2; do
      python tools/quiet_box_lap.py /root/repo      merge_upsert_orders
      python tools/quiet_box_lap.py /tmp/rNcode     merge_upsert_orders
    done
    git worktree remove --force /tmp/rNcode

Overlapping min-of-reps across trees = environmental; a consistent gap
= bisect the diff. Each invocation prints one dict with all reps + min.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: quiet_box_lap.py <repo_tree> <query> [reps] [sf_dir]"
        )
    repo, query = sys.argv[1], sys.argv[2]
    reps_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)

    from reddit_sentiment_spark_streaming_pipeline_spark import registry
    from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark

    spark = get_spark("quiet-box-lap")
    spec = registry.load_all()[query]
    # bench-identical codegen warm-up on the tiny sf, then drop its caches
    spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()
    reps = []
    for _ in range(reps_n):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    print({"repo": repo, "query": query, "reps": reps, "min": min(reps)})


if __name__ == "__main__":
    main()
