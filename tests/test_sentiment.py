"""Lexicon sentiment: built-in expression path ≡ pandas-UDF path ≡ scalar."""

from __future__ import annotations

import math

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import (
    ALPHA,
    LEXICON,
    score_text,
    score_text_vader,
    sentiment_expr,
    with_vader_sentiment,
)
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


def test_vader_negation_flips_sign():
    assert score_text_vader("the query is good") > 0
    assert score_text_vader("the query is not good") < 0
    assert score_text_vader("don't love this plan") < 0 < score_text_vader("love this plan")


def test_vader_heuristics_ordering():
    base = score_text_vader("a good stream")
    assert score_text_vader("a very good stream") > base          # booster
    assert 0 < score_text_vader("a slightly good stream") < base  # dampener
    assert score_text_vader("a GOOD stream") > base               # caps emphasis
    assert score_text_vader("a good stream!!!") > base            # punctuation
    # all-caps text has no cap differential: no emphasis applied
    assert score_text_vader("A GOOD STREAM") == score_text_vader("a good stream".lower())
    # but-clause: sentiment after "but" dominates
    assert score_text_vader("slow but good") > 0 > score_text_vader("good but slow")


def test_vader_spark_matches_scalar(spark):
    texts = [t for _, t in s_ops._VADER_CASES] + [
        "NOT good", "hardly a crash", "so so bad ? ?", "very very great!!",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {
        r.doc_id: r.sentiment
        for r in with_vader_sentiment(df).select("doc_id", "sentiment").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == score_text_vader(t), (i, t)


def test_vader_spark_path_is_jvm_only(spark):
    df = spark.createDataFrame([("good not bad",)], ["text"])
    plan = with_vader_sentiment(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_expr_path_has_no_python_worker(spark, sf_dir):
    plan = s_ops.doc_sentiment(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    udf_plan = s_ops.doc_sentiment_udf(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in udf_plan  # the UDF variant really is the Arrow path
