"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's full registered query
surface (reddit_sentiment_spark_streaming_pipeline_spark.registry) for the driver's DuckDB
correctness oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from reddit_sentiment_spark_streaming_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (grouped event stats) on /root/testdata/sf0.001."""
    spec = registry.get("event_stats")
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry.load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (driver then records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry.load_all().items()
        if spec.oracle is not None
    }
