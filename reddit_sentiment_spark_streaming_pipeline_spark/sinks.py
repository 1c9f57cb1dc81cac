"""Batch sink inventory (SURVEY §2.2).

The streaming sinks (foreachBatch parquet fan-out, retention) live in
``streaming/``; these are the batch-side writers:

- K1 made scalable: date-partitioned parquet append — partition pruning
  then applies to every dashboard recency query for free.
- K4 done natively: the reference rode ``df.toPandas().to_sql`` through
  SQLAlchemy (reddit_consumer.py:330-338), collecting every batch to the
  driver; ``write_jdbc`` is the executor-parallel JDBC writer. No JDBC
  driver jar ships in this environment, so it is config-only here and
  verified by construction in tests.
- K5: console sink (``reddit_consumer.py:243,387,435``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(df: DataFrame, path: str, ts_col: str = "ts",
                              mode: str = "append") -> None:
    """Append as parquet partitioned by event date (K1 at scale).

    At 100 TB the date directory is the unit of retention, compaction and
    pruning; writers never coalesce(1) — small-file pressure is handled by
    AQE's coalesced shuffle output, not by single-file writes.
    """
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def jdbc_writer(df: DataFrame, url: str, table: str, mode: str = "append",
                num_partitions: int | None = None, **properties):
    """Configured native JDBC writer (K4) — call ``.save()`` to execute.

    Executors write in parallel (optionally capped by ``numPartitions`` to
    respect the database's connection budget); nothing is collected to the
    driver. Returns the writer so environments without a driver jar can
    still construct and inspect it.
    """
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
    )
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in properties.items():
        writer = writer.option(k, str(v))
    return writer


def show_console(df: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """K5 console sink (the reference's .show(truncate=False))."""
    df.show(n=n, truncate=truncate)
