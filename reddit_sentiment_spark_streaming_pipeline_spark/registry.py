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
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.analytic",
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


# Presentation order: any prefix of the registry spans every operator
# family (reference parity rows first within each slice, then the
# training-data extensions), so a harness that samples or time-caps a
# prefix of `queries()` still exercises the full breadth of the engine.
# Names not listed keep registration order after these.
_SHOWCASE_ORDER = [
    # flagship + scalar/filter/agg core (SURVEY §2.3/2.5/2.8)
    "event_stats", "event_parse_filter_derive", "scalar_function_matrix",
    "salted_event_stats", "value_percentiles",
    # wire parse + sentiment (P1-P3, U1)
    "wire_posts_pipeline", "wire_quality_report", "doc_sentiment",
    "doc_sentiment_udf", "avg_sentiment_by_lang",
    # refs (F3-F6, A7/A8) and TF-IDF (§2.11)
    "refs_extract", "refs_rollup",
    "tfidf_word_stats", "tfidf_topk", "tfidf_topk_mlpipe",
    # dashboard analytics (P7/P8, W1-W4, O3-O5) + window/grouping breadth
    "rolling_sentiment_band", "dedup_keep_last", "timeframe_filter",
    "union_dedup_activity", "latest_event", "window_function_matrix",
    "grouping_sets_order_stats",
    # event-time windows (T2)
    "windowed_event_counts", "sliding_window_avg", "session_windows",
    "windowed_subreddit_sentiment",
    # relational / join matrix
    "q1_pricing_summary", "supplier_running_revenue",
    "regional_customer_value", "customers_with_orders_semi",
    "customers_without_orders_anti", "nation_customer_supplier_full_outer",
    "priority_status_pivot",
    # temporal joins + SQL surface
    "asof_purchase_click", "range_join_error_context",
    "sql_surface_order_priorities",
    # dedup suite
    "exact_dup_groups", "minhash_near_dups", "simhash_near_dups",
    "dedup_clusters",
    # similarity search
    "cosine_topk", "embedding_near_dups", "ivf_ann_topk", "ann_lsh_topk",
    "ann_recall_eval", "kmeans_refined_clusters",
    # text analysis
    "token_stats", "lang_id_scores", "quality_scores", "repetition_stats",
    "stratified_sample_counts",
    # PII / contamination / multimodal
    "pii_prevalence_by_lang", "benchmark_contamination",
    "media_metadata_stats", "media_features",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    ordered so any prefix covers every operator family."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — only swallow the
            # *target* module being absent, not its broken imports.
            if mod not in str(e):
                raise
    out = {n: _REGISTRY[n] for n in _SHOWCASE_ORDER if n in _REGISTRY}
    out.update((n, s) for n, s in _REGISTRY.items() if n not in out)
    return out


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
