"""Time-series operators: resampling with gap-fill, outlier detection,
SCD2 validity intervals.

The reference's dashboard consumes *irregular* event streams binned into
fixed windows (streamlit_app.py refresh loop over result tables); a
production analytics engine additionally needs a regular time grid —
resampling, forward-fill, per-series anomaly flags, and slowly-changing-
dimension history — the classic time-series surface (cf. TimescaleDB's
``time_bucket_gapfill``/``locf``, Flink's temporal tables).

Scale shape: every operator here is one shuffle on the series key
(event_type / user_id); the time grid is generated per-key with
``sequence`` (bounded by the key's own min/max — never a cross join
against a global calendar), and forward-fill is a running ``last(...,
ignorenulls)`` window over the key partition — no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# 15-minute buckets: 30-day fixture span -> 2 880 grid points per series.
_BUCKET_S = 900


def _bucket_col(ts: str = "ts") -> F.Column:
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts)) / _BUCKET_S) * _BUCKET_S
    )


def _bucket_sql(ts: str = "ts") -> str:
    # make_timestamp(BIGINT) takes epoch-microseconds; floor(epoch()/900)
    # matches Spark's unix_timestamp // 900 (both truncate toward -inf for
    # the positive epochs in play).
    return (
        f"make_timestamp(CAST(floor(epoch({ts}) / {_BUCKET_S}) AS BIGINT)"
        f" * {_BUCKET_S} * 1000000)"
    )


@register(
    "resample_gapfill",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               {_bucket_sql()} AS bucket_ts,
               round(avg(value), 6) AS avg_value,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(bucket_ts) AS mn, max(bucket_ts) AS mx
        FROM binned GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 15 MINUTE)) AS bucket_ts
        FROM bounds
    )
    SELECT g.event_type,
           g.bucket_ts,
           last_value(b.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ffill,
           coalesce(b.n_events, 0) AS n_events,
           b.avg_value IS NULL AS gap_filled
    FROM grid g LEFT JOIN binned b USING (event_type, bucket_ts)
    """,
    doc="Regular-grid resampling (15-min buckets) with per-series gap "
    "fill and forward-fill (TimescaleDB time_bucket_gapfill + locf "
    "semantics). The grid is generated per series from its own bounds "
    "(sequence + explode), so grid size tracks each key's span, and the "
    "forward-fill is a running last(ignorenulls) over the series "
    "partition — one shuffle on event_type, no global calendar join.",
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.groupBy(
        "event_type", _bucket_col().alias("bucket_ts")
    ).agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    grid = (
        binned.groupBy("event_type")
        .agg(F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 15 MINUTES"))
            ).alias("bucket_ts"),
        )
    )
    joined = grid.join(binned, ["event_type", "bucket_ts"], "left")
    ffill = W.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(
        W.unboundedPreceding, 0
    )
    return joined.select(
        "event_type",
        "bucket_ts",
        F.last("avg_value", ignorenulls=True).over(ffill).alias("avg_value_ffill"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("avg_value").isNull().alias("gap_filled"),
    )


# z-score threshold: flag only clear outliers so the boundary sits far
# from any rounding ambiguity (values are synthetic lognormal-ish).
_Z_THRESH = 2.5


@register(
    "value_zscore_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY 1
    )
    SELECT e.event_id,
           e.event_type,
           round(e.value, 6) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE abs(round((e.value - s.mu) / s.sigma, 4)) > {_Z_THRESH}
    """,
    doc="Per-series z-score anomaly flagging: one partial-aggregable "
    "pass for per-type mean/stddev (5 rows), broadcast back onto the "
    "fact scan — the stats side is always broadcastable regardless of "
    "corpus size, so the detector is a single scan + map at 100 TB. "
    "Threshold compares the 4-dp-rounded z in both engines so the "
    "cut is on identical values (stddev is order-sensitive in the "
    "last ulp).",
)
def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > _Z_THRESH)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            "zscore",
        )
    )


@register(
    "user_purchase_scd2",
    oracle="""
    SELECT user_id,
           round(value, 6) AS price,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
    doc="SCD-type-2 history build: each user's purchase-price changes "
    "become [valid_from, valid_to) validity intervals via lead() over "
    "the user partition (NULL valid_to = current row). The canonical "
    "change-data-capture -> dimension-history transform: one shuffle "
    "on the entity key, interval construction is per-partition window "
    "work, no self-join.",
)
def user_purchase_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.round("value", 6).alias("price"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
