"""Core event analytics: parse/filter/derive + grouped stats (SURVEY §2.3/2.5)."""

from __future__ import annotations

from reddit_sentiment_spark_streaming_pipeline_spark.operators import events as ev_ops
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table


def test_valid_events_drops_error_rows(spark, sf_dir):
    raw = load_table(spark, sf_dir, "events")
    filtered = ev_ops.valid_events(raw)
    assert filtered.filter(filtered.event_type == "error").count() == 0
    assert 0 < filtered.count() < raw.count()


def test_parse_filter_derive_types(spark, sf_dir):
    df = ev_ops.event_parse_filter_derive(spark, sf_dir)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["props_k"] == "int"
    assert schema["event_date"] == "date"
    assert schema["value_bucket"] == "int"
    row = df.filter(df.props_k.isNotNull()).first()
    assert row is not None and row.props_k >= 0


def test_event_stats_matches_manual(spark, sf_dir):
    df = ev_ops.event_stats(spark, sf_dir).toPandas()
    assert set(df.columns) == {"event_type", "post_count", "unique_users", "avg_value"}
    assert "error" not in set(df.event_type)
    # ordered by post_count desc
    assert list(df.post_count) == sorted(df.post_count, reverse=True)
    # exact distinct never exceeds count
    assert (df.unique_users <= df.post_count).all()


def test_event_stats_plan_is_single_shuffle(spark, sf_dir):
    df = ev_ops.event_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one aggregate pipeline, no join, partial agg present (map-side combine)
    assert "Exchange" in plan
    assert "Join" not in plan


def test_event_stats_approx_within_hll_tolerance(spark, sf_dir):
    # approx_count_distinct defaults to rsd=0.05; HLL++ error is
    # approximately Gaussian with that relative std-dev, so 3×rsd bounds
    # the estimate for any non-adversarial input. The query emits the
    # tolerance verdict itself (approx_within_tol — what the driver's
    # oracle hashes against a hard-coded TRUE); this test checks that
    # verdict AND cross-checks the emitted exact counts independently.
    from pyspark.sql import functions as F

    rows = {
        r.event_type: r for r in ev_ops.event_stats_approx(spark, sf_dir).collect()
    }
    assert rows and all(r.approx_within_tol for r in rows.values())
    ev = ev_ops.valid_events(load_table(spark, sf_dir, "events"))
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, n_exact in exact.items():
        assert rows[et].exact_users == n_exact


def test_value_percentiles_approx_sketch_within_rank_band(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import (
        value_percentiles,
        value_percentiles_approx,
    )

    ap = value_percentiles_approx(spark, sf_dir).toPandas().set_index("event_type")
    assert len(ap) > 0
    assert ap.p50_within_tol.all() and ap.p90_within_tol.all()
    ex = value_percentiles(spark, sf_dir).toPandas().set_index("event_type")
    assert (ap.p50_exact == ex.loc[ap.index].p50).all()
    assert (ap.p90_exact == ex.loc[ap.index].p90).all()


def test_conversion_funnel_is_monotone(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.events import conversion_funnel

    rows = conversion_funnel(spark, sf_dir).toPandas().sort_values("stage_order")
    assert list(rows.stage) == ["view", "click", "purchase"]
    # each stage requires the previous one first: reach can only shrink
    assert (rows.n_users.diff().dropna() <= 0).all()
    assert rows.reach_rate.iloc[0] == 1.0
    assert (rows.reach_rate.between(0, 1)).all()
