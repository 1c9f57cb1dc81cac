"""Join matrix + TPC-H-shaped aggregates (SURVEY §2.4 note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import relational as r_ops
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table


def test_star_join_goes_broadcast(spark, sf_dir):
    plan = r_ops.regional_customer_value(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact side


def test_semi_anti_partition_customers(spark, sf_dir):
    total = load_table(spark, sf_dir, "customer").count()
    semi = r_ops.customers_with_orders_semi(spark, sf_dir).agg(F.sum("n_customers")).first()[0] or 0
    anti = r_ops.customers_without_orders_anti(spark, sf_dir).agg(F.sum("n_customers")).first()[0] or 0
    assert semi + anti == total


def test_full_outer_covers_all_nationkeys(spark, sf_dir):
    df = r_ops.nation_customer_supplier_full_outer(spark, sf_dir).toPandas()
    assert (df.n_customers + df.n_suppliers > 0).all()
    # suppliers exist in fewer nations than customers at tiny sf
    assert (df.n_suppliers == 0).any()


def test_cube_planes(spark, sf_dir):
    df = r_ops.status_priority_cube(spark, sf_dir).toPandas()
    grand = df[(df.g_status == 1) & (df.g_priority == 1)]
    assert len(grand) == 1
    n_orders_total = load_table(spark, sf_dir, "orders").count()
    assert grand.n_orders.iloc[0] == n_orders_total
    per_status = df[(df.g_status == 0) & (df.g_priority == 1)]
    assert per_status.n_orders.sum() == n_orders_total


def test_running_revenue_monotone_per_supplier(spark, sf_dir):
    df = r_ops.supplier_running_revenue(spark, sf_dir).toPandas()
    g = df.sort_values(["l_suppkey", "rn"]).groupby("l_suppkey").running_revenue_cents
    assert (g.diff().dropna() >= 0).all()


def test_q1_aggregate_sanity(spark, sf_dir):
    df = r_ops.q1_pricing_summary(spark, sf_dir).toPandas()
    assert df.count_order.sum() > 0
    assert (df.sum_disc_price <= df.sum_base_price).all()
    assert (df.sum_charge >= df.sum_disc_price).all()


def test_nearest_asof_is_symmetric_nearest(spark, sf_dir):
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import valid_events
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.temporal import asof_nearest_signup_view

    NEAREST_TOL_SECONDS = 3600
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    got = asof_nearest_signup_view(spark, sf_dir).toPandas()
    assert (got.gap_seconds <= NEAREST_TOL_SECONDS).all()
    assert got.signup_id.is_unique  # one nearest view per signup
    # brute-force nearest on the raw table agrees on the gap
    ev = valid_events(load_table(spark, sf_dir, "events")).toPandas()
    views = ev[ev.event_type == "view"]
    for row in got.head(20).itertuples():
        s_ts = ev.loc[ev.event_id == row.signup_id, "ts"].iloc[0]
        uv = views[views.user_id == row.user_id]
        best = (uv.ts - s_ts).abs().dt.total_seconds().min()
        assert int(best) == row.gap_seconds


def test_q3_top10_sorted_and_bounded(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.relational import q3_shipping_priority

    rows = q3_shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_orders_above_customer_avg_invariants(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.relational import orders_above_customer_avg

    rows = orders_above_customer_avg(spark, sf_dir).collect()
    assert rows, "fixture has multi-order customers"
    for r in rows:
        # strictly-above count can never reach the group size (the max
        # order is above the mean only if another order is below it)
        assert 1 <= r.n_above < r.n_orders or (r.n_orders == 1 and r.n_above == 0)
        assert r.max_above_avg_cents > 0
