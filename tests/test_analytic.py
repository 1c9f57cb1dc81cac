"""Window-function matrix + grouping sets (SURVEY §2.5/2.6 breadth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import analytic as a_ops
from reddit_sentiment_spark_streaming_pipeline_spark.operators import refs as r_ops
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table


def test_window_matrix_invariants(spark, sf_dir):
    df = a_ops.window_function_matrix(spark, sf_dir).toPandas()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert len(df) == n_orders  # windows never change cardinality
    g = df.groupby("o_custkey")
    # rn is a 1..n sequence per customer
    assert (g.rn.max() == g.rn.count()).all()
    assert (g.rn.min() == 1).all()
    # cume_dist of the last row is exactly 1; percent_rank of the first is 0
    last = df.loc[g.rn.idxmax()]
    assert (last.cdist == 1.0).all()
    first = df.loc[g.rn.idxmin()]
    assert (first.pct_rank == 0.0).all()
    assert first.prev_price.isna().all()  # lag off the partition edge
    # first/last_value constant within each customer
    assert (g.first_price.nunique() == 1).all()
    assert (g.last_price.nunique() == 1).all()
    # quartiles only ever differ by design of ntile: 1..4
    assert set(df.quartile.unique()) <= {1, 2, 3, 4}


def test_window_matrix_no_global_sort_before_windowing(spark, sf_dir):
    # The window must sort within customer partitions; the only global sort
    # allowed is the final presentation ORDER BY (above the window).
    plan = (
        a_ops.window_function_matrix(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Sort [") <= 2  # window-local sort + presentation sort


def test_grouping_sets_planes(spark, sf_dir):
    df = a_ops.grouping_sets_order_stats(spark, sf_dir).toPandas()
    n_orders = load_table(spark, sf_dir, "orders").count()
    grand = df[(df.g_priority == 1) & (df.g_status == 1)]
    assert len(grand) == 1 and grand.n_orders.iloc[0] == n_orders
    per_p = df[(df.g_priority == 0) & (df.g_status == 1)]
    per_s = df[(df.g_priority == 1) & (df.g_status == 0)]
    fine = df[(df.g_priority == 0) & (df.g_status == 0)]
    assert per_p.n_orders.sum() == n_orders
    assert per_s.n_orders.sum() == n_orders
    assert fine.n_orders.sum() == n_orders
    # one Expand, one shuffle: all four groupings in a single pass
    plan = (
        a_ops.grouping_sets_order_stats(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Expand") == 1


def test_url_domain_stats_partitions_urls(spark, sf_dir):
    df = r_ops.url_domain_stats(spark, sf_dir).toPandas()
    total_urls = (
        r_ops.refs_extract(spark, sf_dir).agg(F.sum("urls")).first()[0] or 0
    )
    assert df.n_urls.sum() == total_urls
    assert (df.n_docs <= df.n_urls).all()
    assert df.domain.str.match(r"^site\d\.example\.com$").all()
