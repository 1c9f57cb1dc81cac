"""COVERAGE.md doc-rot guards: the parity matrix must reference real
queries, and every registered query must appear in the matrix."""

from __future__ import annotations

import os
import re

from reddit_sentiment_spark_streaming_pipeline_spark import registry

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "COVERAGE.md")

# non-query identifiers that legitimately appear in backticks: modules,
# functions, files, config options
_NOT_QUERIES = re.compile(
    r"[./()]|::|^tests?$|^[A-Z_]+$|\s"
)


def _backticked_names() -> set[str]:
    with open(_DOC) as f:
        text = f.read()
    return {m.group(1) for m in re.finditer(r"`([^`]+)`", text)}


def test_every_backticked_query_name_is_registered():
    reg = registry.load_all()
    names = _backticked_names()
    # names that LOOK like query keys (lower_snake identifiers) but are
    # not registered are doc rot — catch renames and deletions
    lookalike = {
        n for n in names
        if re.fullmatch(r"[a-z][a-z0-9_]{3,}", n)
        and not _NOT_QUERIES.search(n)
        and ("_" in n)
    }
    # whitelist: non-query snake_case terms the doc legitimately uses
    whitelist = {
        "queries", "oracle_sql", "doc_id", "event_id", "user_id",
        "created_utc", "created_time", "ingest_time", "text_length",
        "subreddit_stats", "approx_count_distinct", "from_json",
        "regexp_extract_all", "foreachBatch", "processed_", "vec_id",
        "read_wire_kafka", "read_wire_stream", "read_wire_socket",
        "write_wire_chunks", "synthetic_wire", "load_table",
        "register_views", "max_files_per_trigger", "maxFilesPerTrigger",
        "time_bucket_gapfill", "locf", "to_sql", "date_trunc",
        "vector_to_array", "posexplode", "pandas_udf", "session_window",
        "spark_sql", "show_console", "enforce_retention", "jdbc_writer",
        "write_partitioned_parquet", "purchase_click_join_stream",
        "windowed_counts_stream", "process_batch", "timestampFormat",
        "dropDuplicatesWithinWatermark", "applyInPandasWithState",
        "withWatermark", "row_number", "date_format",
        # bench.py timing rows that are not registry queries
        "streaming_replay", "streaming_socket_replay",
    }
    unknown = {n for n in lookalike - set(reg) if n not in whitelist}
    assert not unknown, f"COVERAGE.md references unregistered names: {sorted(unknown)}"


def test_every_registered_query_is_documented():
    reg = registry.load_all()
    names = _backticked_names()
    missing = [n for n in reg if n not in names]
    assert not missing, f"registered queries absent from COVERAGE.md: {missing}"
