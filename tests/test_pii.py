"""PII redaction and benchmark-contamination: constructed-positive checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import pii


def test_pii_counts_match_injection(spark, sf_dir):
    df = pii.pii_redaction(spark, sf_dir).toPandas().set_index("doc_id")
    # every injected doc is detected; non-injected docs are clean
    assert (df[df.index % 5 == 0].n_emails == 1).all()
    assert (df[df.index % 5 != 0].n_emails == 0).all()
    assert (df[df.index % 11 == 0].n_phones == 1).all()
    assert (df[df.index % 11 != 0].n_phones == 0).all()
    assert (df[df.index % 13 == 0].n_ips == 1).all()
    assert (df[df.index % 13 != 0].n_ips == 0).all()


def test_redaction_shortens_or_keeps_length(spark, sf_dir):
    corpus = pii.pii_corpus(spark, sf_dir).select(
        "doc_id", F.length("text").alias("raw_chars")
    )
    joined = (
        pii.pii_redaction(spark, sf_dir)
        .join(corpus, "doc_id")
        .select("doc_id", "n_emails", "n_phones", "n_ips", "raw_chars", "redacted_chars")
        .toPandas()
    )
    pii_docs = joined[(joined.n_emails + joined.n_phones + joined.n_ips) > 0]
    clean = joined[(joined.n_emails + joined.n_phones + joined.n_ips) == 0]
    # redaction only ever touches docs with PII
    assert (clean.redacted_chars == clean.raw_chars).all()
    assert len(pii_docs) > 0
    assert (pii_docs.redacted_chars != pii_docs.raw_chars).all()


def test_contamination_flags_benchmark_sources(spark, sf_dir):
    got = pii.benchmark_contamination(spark, sf_dir).toPandas()
    flagged = set(got.doc_id)
    n_docs = (
        pii.pii_corpus(spark, sf_dir).agg(F.max("doc_id")).collect()[0][0]
    )
    expected_sources = set(range(0, n_docs + 1, 13))
    # every benchmark source doc shares its own prefix n-grams
    assert expected_sources <= flagged
    src = got[got.doc_id % 13 == 0]
    # a 40-token prefix yields 36 distinct 5-grams (minus internal repeats)
    assert (src.n_shared_ngrams >= 1).all()
    assert (src.n_shared_ngrams <= 36).all()


def test_broadcast_in_contamination_plan(spark, sf_dir):
    plan = pii.benchmark_contamination(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_funnel_partitions_the_corpus(spark, sf_dir):
    got = pii.filter_funnel(spark, sf_dir).toPandas()
    n_docs = pii.pii_corpus(spark, sf_dir).count()
    # stages partition the corpus: disjoint by construction, counts sum up
    assert got.n_docs.sum() == n_docs
    assert abs(got.pct.sum() - 1.0) < 1e-4
    assert list(got.stage) == sorted(got.stage)  # funnel order
    assert "4_kept" in set(got.stage)
    kept = got[got.stage == "4_kept"].n_docs.iloc[0]
    assert 0 < kept < n_docs  # some docs rejected, most kept
