"""Parquet table loaders for the test corpus.

Single-file parquet scans at test scale; at 100 TB these paths become
date-partitioned directories and the same ``spark.read.parquet`` call picks
up partition pruning + predicate pushdown for free — query code never
changes. (Contrast with the reference dashboard, which globs files by ctime
and concatenates pandas frames by hand: streamlit_app.py:79-187.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    # Queries run under the caller's session (the driver passes its own).
    # Pin the session timezone so naive parquet timestamps collect as UTC —
    # otherwise results drift against the DuckDB oracle on non-UTC hosts.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Older fixture generations wrote events.ts as TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects. Read nanos as long, then
        # integer-divide to microseconds (exact on int64 — a double division
        # would lose precision above 2^53) to match DuckDB's ns→us
        # truncation. Harmless for micros fixtures (ts arrives as timestamp).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    # Naive parquet timestamps (isAdjustedToUTC=false) infer as
    # TIMESTAMP_NTZ, which Spark refuses to cast to numeric epoch and which
    # diverges from DuckDB's naive-timestamp reading in window/interval
    # arithmetic. With the session timezone pinned UTC above, an NTZ →
    # TIMESTAMP cast is value-identical, so normalize every NTZ column.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def from_rows(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Local-collection source (S4, reference reddit_consumer.py:230):
    driver-built dim tables (e.g. a ≤10k-row vocabulary). Small by
    construction — always broadcast-joinable."""
    return spark.createDataFrame(rows, schema)


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """Pandas-DataFrame source (S5, reference reddit_consumer.py:366,429).
    With Arrow enabled (session.py) the transfer is columnar, not
    row-pickled as in the reference (Arrow off, reddit_consumer.py:68)."""
    return spark.createDataFrame(pdf)
