"""Source rows S3-S5 (SURVEY §2.1): literal/range smoke, local-collection
dim source, pandas-frame source."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.session import smoke_test
from reddit_sentiment_spark_streaming_pipeline_spark.sources import from_pandas, from_rows


def test_smoke_test_range_lit_source(spark):
    assert smoke_test(spark)


def test_from_rows_dim_source_broadcast_joins(spark):
    # S4: driver-built vocabulary dim, joined broadcast like tfidf's J1
    vocab = from_rows(spark, [(0, "alpha"), (1, "beta")], ["idx", "word"])
    facts = spark.createDataFrame([(0, 1.5), (1, 2.5), (0, 3.0)], ["idx", "score"])
    out = facts.join(F.broadcast(vocab), "idx").groupBy("word").agg(
        F.sum("score").alias("total")
    )
    got = {r.word: r.total for r in out.collect()}
    assert got == {"alpha": 4.5, "beta": 2.5}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_from_pandas_source_round_trip(spark):
    pdf = pd.DataFrame({"timestamp": pd.to_datetime(["2024-01-01"]),
                        "average_value": [0.25]})
    df = from_pandas(spark, pdf)
    row = df.first()
    assert row.average_value == 0.25
    assert df.columns == ["timestamp", "average_value"]
