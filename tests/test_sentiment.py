"""Lexicon sentiment: built-in expression path ≡ pandas-UDF path ≡ scalar."""

from __future__ import annotations

import math

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import ALPHA, LEXICON, score_text, sentiment_expr
from reddit_sentiment_spark_streaming_pipeline_spark.operators import sentiment as s_ops


def test_scalar_scorer_formula():
    s = LEXICON["fast"] + LEXICON["slow"]
    assert score_text("fast slow") == round(s / math.sqrt(s * s + ALPHA), 6)
    assert score_text("") == 0.0
    assert score_text(None) == 0.0
    assert score_text("unknown words only") == 0.0
    assert score_text("FAST") == score_text("fast")  # lowercased


def test_expr_matches_scalar(spark):
    texts = ["fast fast great", "slow terrible crash", "the unrelated words", "", "spark join merge"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r.s for r in df.select(sentiment_expr("text").alias("s")).collect()]
    assert got == [score_text(t) for t in texts]


def test_udf_and_expr_paths_agree(spark, sf_dir):
    a = s_ops.doc_sentiment(spark, sf_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = s_ops.doc_sentiment_udf(spark, sf_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert (a.sentiment == b.sentiment).all()
    # scores are bounded like a VADER compound
    assert a.sentiment.between(-1, 1).all()
    assert a.sentiment.abs().sum() > 0  # lexicon actually fires on the corpus


def test_expr_path_has_no_python_worker(spark, sf_dir):
    plan = s_ops.doc_sentiment(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    udf_plan = s_ops.doc_sentiment_udf(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in udf_plan  # the UDF variant really is the Arrow path
