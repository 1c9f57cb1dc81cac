"""Core event-stream analytics — the reference consumer's per-batch queries,
re-expressed as declarative batch/stream-agnostic DataFrame builders.

Reference parity (file:line cites into /root/reference):
- parse+filter+derive: reddit_consumer.py:296-309 (P1/P2/P3)
- grouped stats:       reddit_consumer.py:375-389 (A4/A5/O2)
- scalar aggs:         reddit_consumer.py:315-316, 344-348, 356-359 (A1-A3)

The `events` fixture plays the wire-stream role (FIXTURES.md §B):
`event_type` ↔ `type`/`subreddit`, `'error'` rows ↔ keepalives to be
dropped, `props` JSON ↔ the wire JSON payload, `value` ↔ the numeric
feature (sentiment/text_length), `ts` ↔ event time.

Scale notes (100 TB posture):
- Every query here is a single scan → partial agg → final agg: one shuffle,
  map-side combine, no driver round-trips. At cluster scale the scan prunes
  date partitions and pushes the `event_type`/null filters into parquet.
- `countDistinct` shuffles (event_type, user_id) pairs pre-aggregated on the
  map side; the approx variant (HLL++) needs no second shuffle at all and is
  the one to use on unbounded cardinalities — both are exposed, mirroring
  the reference's approx_count_distinct choice (reddit_consumer.py:378).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType(), True)])


def valid_events(df: DataFrame) -> DataFrame:
    """The engine's keepalive/malformed-row filter (reference P2,
    reddit_consumer.py:300-305): drop heartbeat-like rows and null payloads.
    """
    return df.filter((F.col("event_type") != "error") & F.col("value").isNotNull())


def parsed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3: JSON-parse `props`, filter, derive typed columns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        valid_events(ev)
        .withColumn("props_k", F.from_json(F.col("props"), PROPS_SCHEMA).getField("k"))
        .withColumn("event_date", F.to_date("ts"))
        .withColumn("value_bucket", F.floor(F.col("value") / F.lit(10.0)).cast("int"))
    )


@register(
    "event_parse_filter_derive",
    oracle="""
    SELECT event_id,
           event_type,
           user_id,
           CAST(props->>'k' AS INTEGER)            AS props_k,
           CAST(ts AS DATE)                         AS event_date,
           CAST(floor(value / 10.0) AS INTEGER)     AS value_bucket,
           round(value, 6)                          AS value_r
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    """,
    doc="P1/P2/P3: from_json parse + conjunctive filter + derived columns",
)
def event_parse_filter_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parsed_events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "user_id",
        "props_k",
        "event_date",
        "value_bucket",
        F.round("value", 6).alias("value_r"),
    )


def event_stats_frame(valid: DataFrame) -> DataFrame:
    """A4/A5/O2 grouped stats over an already-filtered events frame —
    shared between the batch query and the streaming foreachBatch path."""
    return (
        valid.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("post_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .filter(F.col("post_count") > 0)
        .orderBy(F.desc("post_count"), "event_type")
    )


@register(
    "event_stats",
    oracle="""
    SELECT event_type,
           count(*)                 AS post_count,
           count(DISTINCT user_id)  AS unique_users,
           round(avg(value), 6)     AS avg_value
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    HAVING count(*) > 0
    ORDER BY post_count DESC, event_type
    """,
    doc="Flagship: A4/A5/O2 grouped stats (exact-distinct variant)",
)
def event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_stats_frame(valid_events(load_table(spark, sf_dir, "events")))


@register(
    "event_stats_approx",
    oracle="""
    SELECT event_type,
           count(*)                 AS post_count,
           count(DISTINCT user_id)  AS exact_users,
           TRUE                     AS approx_within_tol,
           round(avg(value), 6)     AS avg_length
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    HAVING count(*) > 0
    ORDER BY post_count DESC, event_type
    """,
    doc="A4 faithful variant: approx_count_distinct (HLL++), as the "
    "reference uses at reddit_consumer.py:378. The raw sketch estimate is "
    "not SQL-reproducible bit-for-bit, so the frame emits a Spark-"
    "evaluated tolerance boolean instead: |approx - exact| <= 3*rsd*exact "
    "(rsd = 0.05, HLL++ error ~Gaussian, so 3*rsd bounds any "
    "non-adversarial input). The oracle hard-codes TRUE — a sketch "
    "estimate drifting out of tolerance hash-mismatches the driver row. "
    "The exact distinct exists only to judge the sketch; the sketch "
    "(mergeable, fixed-size) is what a 100 TB dashboard would ship.",
)
def event_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    exact = F.count_distinct(F.col("user_id"))
    approx = F.approx_count_distinct("user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("post_count"),
            exact.alias("exact_users"),
            (F.abs(approx - exact) <= 3 * 0.05 * exact).alias("approx_within_tol"),
            F.round(F.avg("value"), 6).alias("avg_length"),
        )
        .filter(F.col("post_count") > 0)
        .orderBy(F.desc("post_count"), "event_type")
    )


@register(
    "event_time_range",
    oracle="""
    SELECT min(ts) AS min_ts, max(ts) AS max_ts, count(*) AS n_rows
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    """,
    doc="A1/A2: global scalar aggregates (batch time-range diagnostic)",
)
def event_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return ev.agg(
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "event_avg_value",
    oracle="""
    SELECT round(avg(value), 6) AS average_value
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    """,
    doc="A3: the headline global average (reference avg sentiment, "
    "reddit_consumer.py:356-359)",
)
def event_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return ev.agg(F.round(F.avg("value"), 6).alias("average_value"))


@register(
    "scalar_function_matrix",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d')                                          AS day,
           string_split(event_type || ':' || CAST(event_id AS VARCHAR), ':')[1] AS kind,
           CAST(string_split(event_type || ':' || CAST(event_id AS VARCHAR), ':')[2]
                AS BIGINT)                                                   AS parsed_id,
           CAST(floor(epoch(ts)) AS BIGINT)                                  AS epoch_s,
           round(CAST(CAST(round(value, 3) AS VARCHAR) AS DOUBLE), 3)        AS value_roundtrip
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    """,
    doc="SURVEY §2.8 scalar coverage in one query: date_format (F14), "
    "split+getItem on 'k:v' strings (F7), string↔numeric casts (F8), "
    "epoch↔timestamp conversion (F9) — all narrow row expressions",
)
def scalar_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    packed = F.split(
        F.concat_ws(":", "event_type", F.col("event_id").cast("string")), ":"
    )
    step = ev.select("event_id", "ts", "value", packed.alias("packed"))
    return step.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("packed").getItem(0).alias("kind"),
        F.col("packed").getItem(1).cast("bigint").alias("parsed_id"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.round(F.round("value", 3).cast("string").cast("double"), 3).alias("value_roundtrip"),
    )


N_SALTS = 8


@register(
    "salted_event_stats",
    oracle="""
    SELECT event_type,
           count(*)              AS post_count,
           round(sum(value), 6)  AS sum_value
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    ORDER BY post_count DESC, event_type
    """,
    doc="Skew-mitigation pattern: two-phase salted aggregation. event_type "
    "has ~6 distinct values — at 100 TB a plain groupBy sends each key's "
    "entire volume to one reducer; salting fans each key over N_SALTS "
    "partial aggregates, then a second tiny aggregate merges them. Results "
    "must equal the direct groupBy (same oracle shape as event_stats).",
)
def salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    # deterministic salt (id-derived, not rand()) so the plan is replayable
    salted = ev.withColumn("salt", (F.col("event_id") % N_SALTS).cast("int"))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum("value").alias("sv"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pc").alias("post_count"),
            F.round(F.sum("sv"), 6).alias("sum_value"),
        )
        .orderBy(F.desc("post_count"), "event_type")
    )


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark percentile ≡ "
    "DuckDB quantile_cont). At 100 TB swap for approx_percentile "
    "(t-digest) — kept exact here so the oracle is byte-checkable",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "value_percentiles_approx",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50_exact,
           round(quantile_cont(value, 0.9), 6)  AS p90_exact,
           TRUE                                 AS p50_within_tol,
           TRUE                                 AS p90_within_tol
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="The 100 TB percentile path value_percentiles points at: "
    "approx_percentile (KLL-style mergeable sketch, fixed size, "
    "partial-aggregable — what a cluster dashboard actually ships), made "
    "hash-checkable the same way as event_stats_approx. The sketch at "
    "accuracy 10000 guarantees rank error <= 1e-4, so its value must lie "
    "inside the exact [p-0.01, p+0.01] rank band; the frame emits that "
    "verdict as a boolean and the oracle hard-codes TRUE — a sketch "
    "drifting out of rank tolerance fails the driver's value hash.",
)
def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))

    def exact(p: float):
        return F.percentile("value", F.lit(p))

    def approx(p: float):
        return F.percentile_approx("value", F.lit(p), F.lit(10000))

    return (
        ev.groupBy("event_type")
        .agg(
            F.round(exact(0.5), 6).alias("p50_exact"),
            F.round(exact(0.9), 6).alias("p90_exact"),
            ((approx(0.5) >= exact(0.49)) & (approx(0.5) <= exact(0.51))).alias(
                "p50_within_tol"
            ),
            ((approx(0.9) >= exact(0.89)) & (approx(0.9) <= exact(0.91))).alias(
                "p90_within_tol"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "value_time_correlation",
    oracle="""
    SELECT event_type,
           round(corr(value, epoch(ts)), 6)        AS value_time_corr,
           round(covar_samp(value, epoch(ts)), 6)  AS value_time_covar,
           round(stddev_samp(value), 6)            AS value_stddev
    FROM events
    WHERE event_type <> 'error' AND value IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Bivariate statistics per group: sample correlation / covariance "
    "of value against event time, plus stddev — single-pass partial-"
    "aggregable moments, no second scan",
)
def value_time_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    # cast-to-double keeps fractional seconds (unix_timestamp truncates,
    # which would skew covariance against DuckDB's epoch())
    epoch = F.col("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.corr("value", epoch), 6).alias("value_time_corr"),
            F.round(F.covar_samp("value", epoch), 6).alias("value_time_covar"),
            F.round(F.stddev_samp("value"), 6).alias("value_stddev"),
        )
        .orderBy("event_type")
    )


@register(
    "value_mad_by_type",
    oracle="""
    WITH valid AS (
        SELECT event_type, value FROM events
        WHERE event_type <> 'error' AND value IS NOT NULL
    ),
    med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM valid GROUP BY event_type
    )
    SELECT v.event_type,
           round(quantile_cont(abs(v.value - med.m), 0.5), 6) AS mad,
           count(*)                                           AS n
    FROM valid v JOIN med USING (event_type)
    GROUP BY v.event_type
    ORDER BY v.event_type
    """,
    doc="Median absolute deviation per group via applyInPandas: the "
    "grouped-custom-aggregate API shape (Arrow batch per group, state "
    "fits in memory because groups are bounded); the oracle is the "
    "two-pass median-of-residuals SQL formulation",
)
def value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = valid_events(load_table(spark, sf_dir, "events")).select("event_type", "value")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf.value.median()
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "mad": [round(float((pdf.value - m).abs().median()), 6)],
                "n": [len(pdf)],
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInPandas(mad, schema="event_type string, mad double, n bigint")
        .orderBy("event_type")
    )


@register(
    "conversion_funnel",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type <> 'error' AND value IS NOT NULL
    ),
    s_view AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        FROM ev GROUP BY user_id
    ),
    s_click AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM ev e JOIN s_view s USING (user_id)
        WHERE e.event_type = 'click' AND s.t0 IS NOT NULL AND e.ts >= s.t0
        GROUP BY e.user_id
    ),
    s_buy AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN s_click s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.t1
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT 1 AS stage_order, 'view' AS stage,
               (SELECT count(*) FROM s_view WHERE t0 IS NOT NULL)::BIGINT AS n_users
        UNION ALL
        SELECT 2, 'click', (SELECT count(*) FROM s_click)::BIGINT
        UNION ALL
        SELECT 3, 'purchase', (SELECT count(*) FROM s_buy)::BIGINT
    )
    SELECT stage_order, stage, n_users,
           round(n_users * 1.0
                 / (SELECT n_users FROM counts WHERE stage_order = 1), 6) AS reach_rate
    FROM counts
    ORDER BY stage_order
    """,
    doc="Ordered conversion funnel (view → click-after-view → "
    "purchase-after-click): per-user first-touch timestamps with "
    "event-order enforcement, then stage reach counts and rates — the "
    "product-analytics shape sessionization feeds. All three stages are "
    "user-keyed aggregates; after the first shuffle the stage joins are "
    "co-partitioned on user_id, so no further full exchanges at scale.",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts"
    )
    s_view = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"))
        .filter(F.col("t0").isNotNull())
    )
    s_click = (
        ev.filter(F.col("event_type") == "click")
        .join(s_view, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s_click, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    counts = (
        stage(1, "view", s_view)
        .unionByName(stage(2, "click", s_click))
        .unionByName(stage(3, "purchase", s_buy))
    )
    base = counts.filter(F.col("stage_order") == 1).select(
        F.col("n_users").alias("n_base")
    )
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "stage_order",
            "stage",
            "n_users",
            F.round(F.col("n_users") / F.col("n_base"), 6).alias("reach_rate"),
        )
        .orderBy("stage_order")
    )


# -------------------------------- incremental aggregate maintenance

INCR_SPLIT = "2024-01-20 00:00:00"


@register(
    "incremental_agg_merge",
    oracle="""
    WITH valid AS (
        SELECT * FROM events WHERE event_type <> 'error' AND value IS NOT NULL
    )
    SELECT event_type,
           count(*)             AS n_events,
           round(sum(value), 4) AS sum_value,
           round(avg(value), 6) AS avg_value,
           min(ts)              AS first_ts,
           max(ts)              AS last_ts
    FROM valid GROUP BY event_type ORDER BY event_type
    """,
    doc="Incremental view maintenance: the table is split into a 'base' "
    "snapshot and a 'delta' batch at a cutoff, each aggregated to "
    "PARTIAL states (count, sum, min, max), and the partials merged by "
    "algebra (sum of counts/sums, min of mins, max of maxes; avg "
    "derived from merged sums — avgs themselves do not merge, which is "
    "why partials carry sum+count). The oracle recomputes from scratch, "
    "so a green row PROVES merge algebra == full recompute — the "
    "contract that lets a 100 TB nightly pipeline aggregate only the "
    "new partition and fold it into yesterday's state instead of "
    "rescanning history.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    split = F.lit(INCR_SPLIT).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )

    base = partials(ev.filter(F.col("ts") < split))
    delta = partials(ev.filter(F.col("ts") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("s"),
            F.min("mn").alias("first_ts"),
            F.max("mx").alias("last_ts"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("s"), 4).alias("sum_value"),
        F.round(F.col("s") / F.col("n_events"), 6).alias("avg_value"),
        "first_ts",
        "last_ts",
    ).orderBy("event_type")
