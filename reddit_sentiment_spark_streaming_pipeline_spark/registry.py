"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers here as a named QuerySpec:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for the DuckDB correctness oracle, or
  ``None`` for genuinely non-SQL-expressible ops (driver then records a
  weaker rows-only check).

``__spark_entry__.py`` exposes this registry to the driver; ``bench.py``
times a subset of it; ``tests/`` assert per-operator semantics on top.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import (order = SURVEY.md §7 build order).
_QUERY_MODULES = [
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.events",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.posts",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.refs",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.sentiment",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.tfidf",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.dashboard",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.relational",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.pii",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.windows",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.temporal",
    "reddit_sentiment_spark_streaming_pipeline_spark.sql",
]


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — only swallow the
            # *target* module being absent, not its broken imports.
            if mod not in str(e):
                raise
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
