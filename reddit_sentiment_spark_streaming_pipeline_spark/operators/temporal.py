"""Temporal join operators Spark lacks as primitives: as-of and range joins.

Neither exists in the reference (it has one equi-join) nor as a built-in
DataFrame operator, so both are expressed as compositions that keep the
scale properties right:

- **As-of join** (each purchase ↔ the user's most recent prior click):
  union the two tagged event sets, one window pass per user ordered by
  time carrying the last click forward (`F.last(ignorenulls=True)`), then
  keep the purchases. One shuffle on user_id, no pair enumeration —
  the classic stream-ordered formulation. DuckDB validates with its native
  ASOF JOIN.

- **Range join** (events of the same user within ±10 minutes): equi-join
  on (user_id, coarse time bin) with each left row probing its own and
  adjacent bins, then the exact |Δt| filter. Candidates ∝ local density ×
  3 bins instead of |user events|² — the band-join pattern that survives
  100 TB. DuckDB validates with the plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import valid_events
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

RANGE_SECONDS = 600  # ±10 minutes


@register(
    "asof_purchase_click",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    clicks AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type = 'click' AND value IS NOT NULL
    )
    SELECT p.user_id,
           p.event_id                                   AS purchase_id,
           c.ts                                         AS click_ts,
           round(c.value, 6)                            AS click_value,
           CAST(floor(epoch(p.ts) - epoch(c.ts)) AS BIGINT) AS lag_seconds
    FROM purchases p
    ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY purchase_id
    """,
    doc="As-of join: each purchase matched to the user's most recent "
    "click at-or-before it — one window pass over the unioned stream, "
    "no pair enumeration; oracle is DuckDB's native ASOF JOIN",
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = valid_events(load_table(spark, sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")

    tagged = purchases.select(
        "user_id", "ts", F.lit(1).alias("is_p"), "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_value"),
    ).unionByName(
        clicks.select(
            "user_id", "ts", F.lit(0).alias("is_p"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("c_ts"), F.col("value").alias("c_value"),
        )
    )
    # within a user, order by time with clicks before purchases at equal ts
    # (ASOF's >= semantics); carry the latest click forward
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.select(
        "user_id", "ts", "is_p", "event_id",
        F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"),
        F.last("c_value", ignorenulls=True).over(w).alias("click_value"),
    )
    return (
        carried.filter((F.col("is_p") == 1) & F.col("click_ts").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "click_ts",
            F.round("click_value", 6).alias("click_value"),
            # floor of the fractional-second difference (truncating each
            # timestamp first disagrees with the oracle by ±1)
            F.floor(
                F.col("ts").cast("double") - F.col("click_ts").cast("double")
            ).alias("lag_seconds"),
        )
        # no orderBy: one row per purchase (fact-scale) — don't global-sort it
    )


@register(
    "range_join_error_context",
    oracle=f"""
    WITH errors AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
    ),
    valid AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type <> 'error' AND value IS NOT NULL
    )
    SELECT e.user_id,
           e.event_id                  AS error_id,
           count(*)                    AS n_nearby,
           round(avg(v.value), 6)      AS avg_nearby_value
    FROM errors e JOIN valid v
      ON e.user_id = v.user_id
     AND v.ts >= e.ts - INTERVAL {RANGE_SECONDS} SECOND
     AND v.ts <= e.ts + INTERVAL {RANGE_SECONDS} SECOND
    GROUP BY e.user_id, e.event_id
    ORDER BY error_id
    """,
    doc=f"Range join (±{RANGE_SECONDS}s context around each error) via the "
    "band-join pattern: equi-join on (user, coarse bin) probing adjacent "
    "bins, exact interval filter after — candidates stay linear in local "
    "density; oracle is the plain inequality join",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.col("ts").alias("e_ts")
    )
    valid = valid_events(ev).select("user_id", F.col("ts").alias("v_ts"), "value")

    bin_of = lambda c: F.floor(F.col(c).cast("double") / RANGE_SECONDS)  # noqa: E731
    # each error probes its own and both adjacent bins; a valid event lives
    # in exactly one bin, so every in-range pair meets in exactly one probe
    probes = errors.select(
        "user_id", "event_id", "e_ts",
        F.explode(
            F.array(bin_of("e_ts") - 1, bin_of("e_ts"), bin_of("e_ts") + 1)
        ).alias("bin"),
    )
    binned = valid.withColumn("bin", bin_of("v_ts"))
    dt = F.col("v_ts").cast("double") - F.col("e_ts").cast("double")
    return (
        probes.join(binned, ["user_id", "bin"])
        .filter((dt >= -RANGE_SECONDS) & (dt <= RANGE_SECONDS))
        .groupBy("user_id", F.col("event_id").alias("error_id"))
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            F.round(F.avg("value"), 6).alias("avg_nearby_value"),
        )
        # no orderBy: one row per error event (fact-scale) — don't global-sort it
    )


@register(
    "asof_nearest_signup_view",
    oracle="""
    WITH signups AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'signup' AND value IS NOT NULL
    ),
    views AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'view' AND value IS NOT NULL
    ),
    cand AS (
        SELECT s.user_id,
               s.event_id AS signup_id,
               v.event_id AS view_id,
               v.ts       AS view_ts,
               abs(epoch(s.ts) - epoch(v.ts)) AS gap_s
        FROM signups s JOIN views v ON s.user_id = v.user_id
        WHERE abs(epoch(s.ts) - epoch(v.ts)) <= 3600
    )
    SELECT user_id, signup_id, view_id,
           CAST(floor(gap_s) AS BIGINT) AS gap_seconds
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY signup_id ORDER BY gap_s, view_ts, view_id
        ) AS rn
        FROM cand
    )
    WHERE rn = 1
    ORDER BY signup_id
    """,
    doc="Nearest-as-of join (pandas merge_asof direction='nearest' with "
    "tolerance): each signup matched to the user's closest view within "
    "±1 h, either direction, deterministic (gap, ts, id) tie-break. "
    "Completes the as-of family next to the backward join. Scale shape: "
    "candidates come from an equi-join on (user_id, hour bin) with each "
    "signup probing its own and both adjacent bins — candidates scale "
    "with local event density x3 bins, never |user events|^2; the "
    "argmin is a signup-partitioned window. The oracle uses the plain "
    "quadratic inequality join, which is exactly what this formulation "
    "refuses to be.",
)
def asof_nearest_signup_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    NEAREST_TOL_SECONDS = 3600  # match window: +-1 hour (mirrors the oracle literal)
    ev = valid_events(load_table(spark, sf_dir, "events"))
    epoch = F.col("ts").cast("double")
    tbin = F.floor(epoch / NEAREST_TOL_SECONDS)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        epoch.alias("s_epoch"),
        tbin.alias("bin"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        epoch.alias("v_epoch"),
        tbin.alias("bin"),
    )
    probes = signups.select(
        "user_id", "signup_id", "s_epoch",
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("bin"),
    )
    gap = F.abs(F.col("s_epoch") - F.col("v_epoch"))
    cand = (
        probes.join(views, ["user_id", "bin"])
        .withColumn("gap_s", gap)
        .filter(F.col("gap_s") <= NEAREST_TOL_SECONDS)
    )
    w = W.partitionBy("signup_id").orderBy("gap_s", "view_ts", "view_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "signup_id", "view_id",
            F.floor("gap_s").cast("long").alias("gap_seconds"),
        )
    )
