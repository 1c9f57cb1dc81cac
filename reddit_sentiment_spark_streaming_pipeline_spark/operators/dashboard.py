"""Dashboard-side analytics — the reference's second (pandas) query engine,
re-expressed as Spark window/agg queries over the same store.

Parity (reference streamlit_app.py):
- rolling mean/std ± 2σ band (W1/W2): :271-299
- keep-last dedup on timestamp (W3):  :160-187
- latest-value lookup (W4):           :439, :478
- time-window filter with max-ts anchor (P7): :216-244
- top-3 by activity (O3):             :468
- multi-file union (O5):              :119-185 (directory scan + concat)

Scale notes:
- The rolling queries window over the *pre-aggregated* per-minute series
  (cardinality = time range / 1 min), not raw events — the unpartitioned
  ORDER BY window is safe because it runs on the small aggregate. The raw
  scan → minute agg is the usual one-shuffle partial/final pattern.
- keep-last dedup is a per-key window (partitioned shuffle, no global sort).
- the max-ts anchor arrives via broadcast join of a 1-row aggregate —
  no driver collect, so the same plan works in a 1000-executor job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import valid_events
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

ROLLING_N = 5  # the reference's rolling(window=min(5, len)) (streamlit_app.py:271)


def minute_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return ev.groupBy(F.date_trunc("minute", "ts").alias("minute_ts")).agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


_MINUTE_SQL = """
        SELECT date_trunc('minute', ts)  AS minute_ts,
               round(avg(value), 6)      AS avg_value,
               count(*)                  AS n_events
        FROM events
        WHERE event_type <> 'error' AND value IS NOT NULL
        GROUP BY 1
"""


@register(
    "rolling_sentiment_band",
    oracle=f"""
    WITH m AS ({_MINUTE_SQL})
    SELECT minute_ts, avg_value, n_events,
           round(avg(avg_value) OVER w, 6)                              AS ma,
           round(stddev_samp(avg_value) OVER w, 6)                      AS sd,
           round(avg(avg_value) OVER w + 2 * stddev_samp(avg_value) OVER w, 6) AS band_hi,
           round(avg(avg_value) OVER w - 2 * stddev_samp(avg_value) OVER w, 6) AS band_lo
    FROM m
    WINDOW w AS (ORDER BY minute_ts ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW)
    """,
    doc="W1/W2: moving average + stddev ± 2σ band over the per-minute series",
)
def rolling_sentiment_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = minute_series(spark, sf_dir)
    w = W.orderBy("minute_ts").rowsBetween(-(ROLLING_N - 1), 0)
    ma, sd = F.avg("avg_value").over(w), F.stddev("avg_value").over(w)
    return m.select(
        "minute_ts",
        "avg_value",
        "n_events",
        F.round(ma, 6).alias("ma"),
        F.round(sd, 6).alias("sd"),
        F.round(ma + 2 * sd, 6).alias("band_hi"),
        F.round(ma - 2 * sd, 6).alias("band_lo"),
    )


@register(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_id, ts, round(value, 6) AS value_r
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="W3: keep-last dedup per key (the dashboard's "
    "sort_values+drop_duplicates keep='last', streamlit_app.py:160-161)",
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", F.round("value", 6).alias("value_r"))
    )


@register(
    "timeframe_filter",
    oracle="""
    SELECT event_type,
           count(*)             AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="P7: recency filter anchored at max event time (broadcast scalar "
    "join, not a driver collect)",
)
def timeframe_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("event_type")
    )


@register(
    "membership_filter",
    oracle="""
    SELECT lang,
           source,
           count(*)                 AS n_docs,
           round(avg(n_chars), 6)   AS avg_chars
    FROM documents
    WHERE lang IN ('en', 'de', 'fr')
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="P8: membership filter (df[df.subreddit.isin(subs)], "
    "streamlit_app.py:337) — isin folds to an IN predicate pushed to the "
    "parquet scan",
)
def membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang").isin("en", "de", "fr"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "top3_event_types",
    oracle="""
    SELECT event_type, count(*) AS post_count
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    ORDER BY post_count DESC, event_type
    LIMIT 3
    """,
    doc="O3: top-3 most active groups (nlargest, streamlit_app.py:468)",
)
def top3_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("post_count"))
        .orderBy(F.desc("post_count"), "event_type")
        .limit(3)
    )


@register(
    "latest_event",
    oracle="""
    SELECT event_id, ts, event_type, round(value, 6) AS value_r
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
    doc="W4: latest-value lookup (iloc[-1] after time sort → "
    "TakeOrderedAndProject, no full sort)",
)
def latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("event_id", "ts", "event_type", F.round("value", 6).alias("value_r"))
    )


@register(
    "union_dedup_activity",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM (
        SELECT DISTINCT event_id, event_type FROM (
            SELECT event_id, event_type FROM events WHERE event_id % 2 = 0
            UNION ALL
            SELECT event_id, event_type FROM events WHERE event_id % 3 = 0
        )
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="O5+W3: overlapping multi-source union + dedup + re-aggregation "
    "(the dashboard's per-file concat/groupby, streamlit_app.py:119-124)",
)
def union_dedup_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    u = ev.filter(F.col("event_id") % 2 == 0).unionByName(ev.filter(F.col("event_id") % 3 == 0))
    return (
        u.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )
