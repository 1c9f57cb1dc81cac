"""TF-IDF keyword query (§2.11): explicit algebra vs ml-pipeline parity."""

from __future__ import annotations

import math

from reddit_sentiment_spark_streaming_pipeline_spark.operators import tfidf as t_ops


def test_word_stats_formula_on_tiny_corpus(spark, tmp_path):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["apple apple banana", "banana cherry", "the apple"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    out = {r.word: r for r in t_ops.tfidf_word_stats(spark, str(tmp_path)).collect()}
    # apple: tf total 3 over df=2 (stopword 'the' removed keeps doc 3)
    assert out["apple"].df == 2 and out["apple"].total_tf == 3
    idf = math.log((3 + 1) / (2 + 1))
    assert out["apple"].avg_score == round(idf * 3 / 2, 6)
    assert "the" not in out  # stopword removed


def test_topk_is_take_ordered(spark, sf_dir):
    plan = t_ops.tfidf_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


def test_mlpipe_agrees_with_explicit(spark, sf_dir):
    a = t_ops.tfidf_topk(spark, sf_dir).toPandas()[["word", "avg_score"]]
    b = t_ops.tfidf_topk_mlpipe(spark, sf_dir).toPandas()[["word", "avg_score"]]
    assert list(a.word) == list(b.word)
    assert (a.avg_score == b.avg_score).all()


def test_bm25_topk_ranking_semantics(spark, sf_dir):
    """BM25 invariants on the real corpus: scores positive and sorted;
    every scored doc actually contains a query term; term-frequency
    saturation keeps any single doc below the theoretical ceiling
    sum(idf) * (k1 + 1)."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.tfidf import bm25_topk
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import content_tokens
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    rows = bm25_topk(spark, sf_dir).toPandas()
    assert 0 < len(rows) <= 20
    assert (rows.score > 0).all()
    assert (rows.score.values == sorted(rows.score.values, reverse=True)).all()
    terms = {"data", "query", "stream", "vector", "hash"}
    docs = load_table(spark, sf_dir, "documents")
    hit_docs = {
        r.doc_id
        for r in docs.select(
            "doc_id", F.explode(content_tokens("text")).alias("w")
        )
        .filter(F.col("w").isin(list(terms)))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert set(rows.doc_id).issubset(hit_docs)
