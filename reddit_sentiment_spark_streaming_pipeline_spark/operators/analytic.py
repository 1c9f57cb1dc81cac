"""Ordered-analytics breadth: the full window-function matrix and
generalized grouping sets.

The reference's ordered analytics are four pandas idioms (SURVEY §2.6
W1-W4: rolling mean/std, keep-last dedup, latest-value); the engine
re-expressed those and adds the rest of the standard window-function
vocabulary here — ranking (row_number/rank/dense_rank/ntile), relative
position (percent_rank/cume_dist), navigation (lag/lead/first/last/
nth_value) — plus GROUPING SETS with grouping() flags, the general form
of the cube/rollup family (SURVEY §2.5 A8 note).

Scale: every window partitions by a key (customer) — a partitioned
shuffle + per-partition sort, never a global sort; grouping sets compute
all four groupings in one shuffle (Catalyst Expand), not one job per
grouping. Determinism: window orderings are made total with the unique
order key as tie-breaker, so rank == deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table
from reddit_sentiment_spark_streaming_pipeline_spark.sql import register_views


@register(
    "window_function_matrix",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           row_number()   OVER w                             AS rn,
           ntile(4)       OVER w                             AS quartile,
           round(percent_rank() OVER w, 6)                   AS pct_rank,
           round(cume_dist()    OVER w, 6)                   AS cdist,
           round(lag(o_totalprice)  OVER w, 2)               AS prev_price,
           round(lead(o_totalprice) OVER w, 2)               AS next_price,
           round(first_value(o_totalprice) OVER w, 2)        AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING), 2)     AS last_price,
           round(nth_value(o_totalprice, 2)
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING), 2)     AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, rn
    """,
    doc="The standard window-function vocabulary in one pass — ranking, "
    "relative position, navigation — partitioned by customer (partitioned "
    "shuffle + local sort, no global sort); ordering made total with the "
    "order key so every rank is deterministic",
)
def window_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
            F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias("second_price"),
        )
        .orderBy("o_custkey", "rn")
    )


# One SQL text, two engines (the sql.py pattern): GROUPING SETS and
# grouping() parse identically in Spark SQL and DuckDB.
_GROUPING_SETS_QUERY = """
    SELECT coalesce(o_orderpriority, 'ALL')   AS priority,
           coalesce(o_orderstatus, 'ALL')     AS status,
           grouping(o_orderpriority)          AS g_priority,
           grouping(o_orderstatus)            AS g_status,
           count(*)                           AS n_orders,
           round(sum(o_totalprice), 2)        AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    ORDER BY g_priority, g_status, priority, status
"""


@register(
    "grouping_sets_order_stats",
    oracle=_GROUPING_SETS_QUERY,
    doc="Generalized GROUPING SETS (the cube/rollup superset) with "
    "grouping() flags — all four groupings in ONE shuffle via Catalyst's "
    "Expand, not a job per grouping; shared SQL text with the oracle",
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_QUERY)


@register(
    "retention_cohort_matrix",
    oracle="""
    WITH firstw AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST((epoch(a.act_week) - epoch(f.cohort_week)) / 604800 AS BIGINT)
               AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN firstw f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen week, "
    "counted per (cohort, weeks-since-first-seen) cell — the standard "
    "product-analytics triangle view. Offsets are computed as integer "
    "epoch-second deltas over week-truncated stamps, so both engines "
    "cut identical cells. Plan shape: first-seen is a partial-aggregable "
    "min per user; the activity set re-shuffles on user_id once and the "
    "matrix itself is a tiny two-key aggregate — cells scale with "
    "weeks^2, not events, so the result stays dashboard-sized at 100 TB.",
)
def retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    )
    firstw = ev.groupBy("user_id").agg(F.min("act_week").alias("cohort_week"))
    act = ev.distinct()
    offset = (
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    return (
        act.join(firstw, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
