"""Custom stateful streaming: cross-batch running totals per key.

The reference is stateless across batches (SURVEY §2.9 T5) — "history" is
append-only parquet that the dashboard re-reads and re-aggregates. That
design re-scans the whole store every refresh; state that the stream can
carry (cumulative counts/sums per group) belongs in the engine.

`applyInPandasWithState` is Spark's Arrow-batched stateful operator: rows
shuffle once on the group key, each group's state lives in the state store
(checkpointed, recoverable), and the python function sees Arrow batches —
the idiomatic replacement for hand-rolled foreachBatch accumulators at
scale. State size here is O(distinct keys), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import valid_events

OUTPUT_SCHEMA = "event_type string, batch_rows bigint, cum_rows bigint, cum_value double"
STATE_SCHEMA = "cum_rows bigint, cum_value double"


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cum_rows, cum_value = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        cum_rows += len(pdf)
        cum_value += float(pdf["value"].sum())
    state.update((cum_rows, cum_value))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "batch_rows": [batch_rows],
            "cum_rows": [cum_rows],
            "cum_value": [round(cum_value, 6)],
        }
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """One updated (event_type, cum_rows, cum_value) row per key per batch."""
    return (
        valid_events(events)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_running_totals(events: DataFrame, query_name: str = "running_totals") -> StreamingQuery:
    return (
        running_totals_stream(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
