"""Bucketed-table utilities: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem-scale)
is shuffling both sides on the key. Writing both tables bucketed on that
key with the same bucket count lets Spark's bucketed scan align partitions
directly — the join plan contains no Exchange on either side. The same
layout accelerates repeated groupBy on the bucket key.

This is a storage-layout decision, so it lives beside the sinks rather
than the query builders: queries are unchanged — Catalyst simply notices
the output partitioning of the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str, n_buckets: int,
                   sort_by: str | None = None) -> None:
    """Persist as a bucketed (optionally sort-bucketed) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)
