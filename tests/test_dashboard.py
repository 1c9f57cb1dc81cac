"""Dashboard analytics: rolling band, keep-last dedup, recency filter, top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import dashboard as d_ops
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table


def test_rolling_band_brackets_ma(spark, sf_dir):
    df = d_ops.rolling_sentiment_band(spark, sf_dir).toPandas()
    has_sd = df.sd.notna()
    assert has_sd.sum() > 0
    assert (df.loc[has_sd, "band_hi"] >= df.loc[has_sd, "ma"]).all()
    assert (df.loc[has_sd, "band_lo"] <= df.loc[has_sd, "ma"]).all()
    # first row of the series has no sample stddev (window of 1)
    first = df.sort_values("minute_ts").iloc[0]
    assert first.ma == first.avg_value


def test_dedup_keep_last_picks_max_ts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = d_ops.dedup_keep_last(spark, sf_dir)
    assert out.count() == ev.select("user_id").distinct().count()
    maxes = {r.user_id: r.mx for r in ev.groupBy("user_id").agg(F.max("ts").alias("mx")).collect()}
    for r in out.collect():
        assert r.ts == maxes[r.user_id]


def test_timeframe_filter_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    total = d_ops.timeframe_filter(spark, sf_dir).agg(F.sum("n")).first()[0]
    expected = ev.filter(F.col("ts") >= F.lit(max_ts) - F.expr("INTERVAL 24 HOURS")).count()
    assert total == expected


def test_latest_event_plan_is_topk(spark, sf_dir):
    df = d_ops.latest_event(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert df.count() == 1


def test_partitioned_parquet_sink(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import write_partitioned_parquet
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "part")
    write_partitioned_parquet(ev, out)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert "event_date" in back.columns
    # partition pruning: a single-date filter must scan one partition dir
    one_day = back.select(F.min("event_date")).first()[0]
    pruned = back.filter(F.col("event_date") == F.lit(one_day))
    n_files = pruned.select(F.input_file_name()).distinct().count()
    import os
    n_dirs = len([d for d in os.listdir(out) if d.startswith("event_date=")])
    assert n_dirs > 1  # data really spans multiple dates
    assert pruned.count() > 0


def test_jdbc_writer_is_config_only(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import jdbc_writer
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").limit(5)
    w = jdbc_writer(ev, "jdbc:postgresql://db/x", "reddit_data",
                    num_partitions=4, user="u")
    assert w is not None  # constructing the native writer needs no driver jar
