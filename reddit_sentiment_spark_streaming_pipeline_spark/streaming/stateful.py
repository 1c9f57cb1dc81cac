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


# ---------------------------------------------------- streaming anomalies

# Streaming twin of the batch `value_zscore_outliers` operator: per-key
# running mean/variance maintained across batches with Welford's online
# algorithm (numerically stable, single pass — the only correct way to
# keep streaming variance), each batch's rows scored against the state
# AS OF the previous batch (no lookahead: a true online detector).
ANOMALY_OUTPUT_SCHEMA = (
    "event_type string, event_id bigint, value double, zscore double"
)
ANOMALY_STATE_SCHEMA = "n bigint, mean double, m2 double"
ANOMALY_Z = 2.5
_ANOMALY_MIN_N = 30  # no flags until the state has seen enough rows


def _update_anomalies(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out = []
    for pdf in pdfs:
        # score against the PRIOR state, then fold the batch in
        if n >= _ANOMALY_MIN_N and m2 > 0:
            sigma = math.sqrt(m2 / (n - 1))
            z = (pdf["value"] - mean) / sigma
            hits = pdf.loc[z.abs() > ANOMALY_Z, ["event_id", "value"]].copy()
            if len(hits):
                hits["zscore"] = z[z.abs() > ANOMALY_Z].round(4)
                out.append(hits)
        # fold the batch via the pairwise (Chan et al.) merge — the
        # vectorized form of Welford: one mean/sq-sum over the Arrow
        # batch, O(1) state math, same numerical stability class
        n_b = len(pdf)
        if n_b:
            mean_b = float(pdf["value"].mean())
            m2_b = float(((pdf["value"] - mean_b) ** 2).sum())
            tot = n + n_b
            delta = mean_b - mean
            m2 += m2_b + delta * delta * n * n_b / tot
            mean += delta * n_b / tot
            n = tot
    state.update((n, mean, m2))
    if out:
        res = pd.concat(out, ignore_index=True)
        res.insert(0, "event_type", key[0])
        yield res


def anomaly_stream(events: DataFrame) -> DataFrame:
    """Per-batch anomaly rows scored against cross-batch Welford state."""
    return (
        valid_events(events)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_anomalies,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_anomaly_stream(events: DataFrame, query_name: str = "anomalies") -> StreamingQuery:
    return (
        anomaly_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
