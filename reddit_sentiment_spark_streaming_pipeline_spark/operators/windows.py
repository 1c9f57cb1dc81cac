"""Event-time windowed aggregations — batch-expressible forms.

The reference reads WINDOW_SEC but never uses it (reddit_consumer.py:33,
SURVEY §2.9 T2): every aggregate is an implicit processing-time tumbling
window of trigger length. The new engine makes windows real: these builders
run identically over a batch frame (for the oracle/bench) and a streaming
frame with `withWatermark` (reddit_sentiment_spark_streaming_pipeline_spark.streaming.pipeline wires that).

Oracle mapping: Spark's F.window aligns tumbling windows to the epoch;
DuckDB's time_bucket aligns hour-divisible widths the same way. Sliding
windows (1 h / 30 min) are the union of two offset tumbling passes in SQL.

Scale: windowed groupBy keys are (window, event_type) — bounded cardinality
per partition; map-side partial aggregation absorbs the raw event volume
before the shuffle, and in streaming mode the watermark bounds state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import lexicon_values_sql, with_sentiment
from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import valid_events
from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import _EPOCH_2024, parse_posts, synthetic_wire
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

SESSION_GAP = "17 minutes"  # odd gap → no exact-boundary ambiguity in data


def tumbling_counts_frame(valid: DataFrame) -> DataFrame:
    """1-hour tumbling windows; shared by batch query and streaming mode."""
    return (
        valid.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "windowed_event_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           count(*)                         AS n,
           round(sum(value), 6)             AS sum_value
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="T2 made real: event-time tumbling window (1 h) counts/sums",
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return tumbling_counts_frame(ev).orderBy("window_start", "event_type")


@register(
    "sliding_window_avg",
    oracle="""
    WITH valid AS (
        SELECT * FROM events WHERE event_type <> 'error' AND value IS NOT NULL
    ),
    both_offsets AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, value FROM valid
        UNION ALL
        SELECT time_bucket(INTERVAL 1 HOUR, ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE
               AS window_start, value
        FROM valid
    )
    SELECT window_start,
           count(*)             AS n,
           round(avg(value), 6) AS avg_value
    FROM both_offsets
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="Sliding event-time window (1 h width, 30 min slide) — each event "
    "contributes to two windows; SQL oracle = union of two offset tumblings",
)
def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
        .orderBy("window_start")
    )


def windowed_sentiment_frame(posts: DataFrame) -> DataFrame:
    """10-min tumbling event-time windows of per-subreddit sentiment over an
    enriched posts frame — the WINDOW_SEC the reference configured but never
    applied (reddit_consumer.py:33), shared by batch query and stream."""
    return (
        posts.groupBy(F.window("created_time", "10 minutes").alias("w"), "subreddit")
        .agg(
            F.count(F.lit(1)).alias("n_posts"),
            F.round(F.avg("sentiment"), 6).alias("avg_sentiment"),
        )
        .select(F.col("w.start").alias("window_start"), "subreddit", "n_posts", "avg_sentiment")
    )


@register(
    "windowed_subreddit_sentiment",
    oracle=f"""
    WITH lex(word, score) AS (VALUES {lexicon_values_sql()}),
    posts AS (
        SELECT doc_id, source AS subreddit, text,
               make_timestamp(({_EPOCH_2024} + doc_id) * 1000000) AS created_time
        FROM documents
        WHERE doc_id % 97 <> 0
          AND text IS NOT NULL AND text <> '' AND length(text) > 10
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM posts
    ),
    valence AS (
        SELECT t.doc_id, sum(coalesce(CAST(l.score AS DOUBLE), 0.0)) AS s
        FROM tok t LEFT JOIN lex l ON t.word = l.word
        GROUP BY t.doc_id
    )
    SELECT time_bucket(INTERVAL 10 MINUTE, p.created_time) AS window_start,
           p.subreddit,
           count(*)                                        AS n_posts,
           round(avg(round(v.s / sqrt(v.s * v.s + 15.0), 6)), 6) AS avg_sentiment
    FROM posts p JOIN valence v USING (doc_id)
    GROUP BY 1, 2
    ORDER BY window_start, subreddit
    """,
    doc="Event-time windowed sentiment per subreddit over the parsed wire "
    "stream — the full reference pipeline with real windows (batch form; "
    "streaming/posts.py runs the same frame with a watermark)",
)
def windowed_subreddit_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    posts = with_sentiment(parse_posts(synthetic_wire(spark, sf_dir)))
    return windowed_sentiment_frame(posts).orderBy("window_start", "subreddit")


def _windowed_vader_oracle() -> str:
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import vader_doc_sql

    survivors = (
        "SELECT doc_id, text FROM documents "
        "WHERE doc_id % 97 <> 0 AND text IS NOT NULL AND text <> '' "
        "AND length(text) > 10"
    )
    return (
        vader_doc_sql(source_sql=survivors)
        + f"""
    SELECT time_bucket(INTERVAL 10 MINUTE,
                       make_timestamp(({_EPOCH_2024} + d.doc_id) * 1000000))
               AS window_start,
           d.source                   AS subreddit,
           count(*)                   AS n_posts,
           round(avg(v.sentiment), 6) AS avg_sentiment
    FROM vader_doc v JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    ORDER BY window_start, subreddit
    """
    )


@register(
    "windowed_vader_sentiment",
    oracle=_windowed_vader_oracle(),
    doc="T2 × U1 composed: the wire pipeline scored with FULL VADER "
    "semantics under real event-time tumbling windows — what the "
    "reference's per-batch VADER average (reddit_consumer.py:356-366) "
    "becomes with its unused WINDOW_SEC made real. Same plan shape as "
    "windowed_subreddit_sentiment: narrow scoring fused into the scan, "
    "one (window, subreddit) aggregate shuffle",
)
def windowed_vader_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import with_vader_sentiment

    posts = parse_posts(synthetic_wire(spark, sf_dir))
    posts = posts.repartition(posts.sparkSession.sparkContext.defaultParallelism)
    return windowed_sentiment_frame(with_vader_sentiment(posts)).orderBy(
        "window_start", "subreddit"
    )


@register(
    "session_windows",
    oracle="""
    WITH valid AS (
        SELECT * FROM events WHERE event_type <> 'error' AND value IS NOT NULL
    ),
    flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 17 MINUTE OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM valid
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 17 MINUTE     AS session_end,
           count(*)                         AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Sessionization: F.session_window(gap=17 min) per user; oracle is "
    "the classic lag/gap/cumsum formulation (session end = last event + gap)",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
