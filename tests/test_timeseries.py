"""Time-series operators: resample/gap-fill, outliers, SCD2 intervals."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import timeseries as tso


def test_resample_grid_is_contiguous_per_series(spark, sf_dir):
    df = tso.resample_gapfill(spark, sf_dir)
    # each series' grid step is exactly one bucket: max gap == min gap == 900s
    steps = (
        df.withColumn(
            "prev",
            F.lag("bucket_ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("event_type").orderBy("bucket_ts")
            ),
        )
        .filter(F.col("prev").isNotNull())
        .select(
            (F.unix_timestamp("bucket_ts") - F.unix_timestamp("prev")).alias("d")
        )
        .distinct()
        .collect()
    )
    assert {r.d for r in steps} == {tso._BUCKET_S}


def test_resample_ffill_never_null_after_first_obs(spark, sf_dir):
    pdf = tso.resample_gapfill(spark, sf_dir).toPandas()
    # forward fill: within each series, once a value appears nulls are gone
    for _, g in pdf.sort_values("bucket_ts").groupby("event_type"):
        seen = g.avg_value_ffill.notna()
        assert seen.iloc[0] or not seen.any() or seen[seen.idxmax():].all()
        # first and last grid points are real observations (bounds come
        # from the binned data itself)
        assert not g.iloc[0].gap_filled and not g.iloc[-1].gap_filled


def test_zscore_outliers_are_extreme(spark, sf_dir):
    pdf = tso.value_zscore_outliers(spark, sf_dir).toPandas()
    assert (pdf.zscore.abs() > tso._Z_THRESH).all()
    # outliers should be rare (< 5% of events)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(pdf) < 0.05 * n_events


def test_scd2_intervals_partition_time(spark, sf_dir):
    pdf = tso.user_purchase_scd2(spark, sf_dir).toPandas()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("valid_from")
        # exactly one open (current) interval per user, and it is the last
        assert g.is_current.sum() == 1 and bool(g.iloc[-1].is_current)
        # intervals chain: valid_to of row i == valid_from of row i+1
        closed = g.valid_to.dropna().tolist()
        assert closed == g.valid_from.iloc[1:].tolist()
