"""CMS heavy hitters, bigram PMI, skew profile, edit-distance dedup."""

from __future__ import annotations

from reddit_sentiment_spark_streaming_pipeline_spark.operators import dedup as dd
from reddit_sentiment_spark_streaming_pipeline_spark.operators import relational as rel
from reddit_sentiment_spark_streaming_pipeline_spark.operators import sketches as sk
from reddit_sentiment_spark_streaming_pipeline_spark.operators import textstats as ts


def test_cms_never_underestimates(spark, sf_dir):
    pdf = sk.cms_heavy_hitters(spark, sf_dir).toPandas()
    assert len(pdf) == sk.TOP_K
    # CMS is one-sided: estimate >= exact, always
    assert (pdf.overestimate >= 0).all()
    assert (pdf.cms_estimate == pdf.exact_count + pdf.overestimate).all()


def test_cms_error_bound(spark, sf_dir):
    pdf = sk.cms_heavy_hitters(spark, sf_dir).toPandas()
    # standard CMS guarantee: err <= 2N/W with prob 1-2^-D; at depth 4 a
    # 4x margin over the expectation is a loose but non-vacuous bound
    n_total = pdf.exact_count.sum()  # lower bound on stream size N
    assert (pdf.overestimate <= 8 * n_total / sk.CMS_WIDTH + 1).all()


def test_bigram_pmi_support_and_order(spark, sf_dir):
    pdf = ts.bigram_pmi_topk(spark, sf_dir).toPandas()
    assert (pdf.pair_count >= 5).all()
    assert list(pdf.pmi) == sorted(pdf.pmi, reverse=True)


def test_key_skew_profile_invariants(spark, sf_dir):
    pdf = rel.key_skew_profile(spark, sf_dir).toPandas().set_index("keyspace")
    assert len(pdf) == 4
    assert (pdf.max_rows <= pdf.total_rows).all()
    assert (pdf.top_share <= 1.0).all() and (pdf.skew_ratio >= 1.0).all()
    # avg is exactly total/n_keys (internal consistency of the rollup)
    assert (
        (pdf.avg_rows - pdf.total_rows / pdf.n_keys).abs() < 1e-5
    ).all()


def test_editdist_finds_planted_dups(spark, sf_dir):
    pdf = dd.prefix_editdist_dups(spark, sf_dir).toPandas()
    # planted exact dups (doc_id + 1_000_000) share the full head: sim 1.0
    exact = pdf[(pdf.doc_a < 1_000_000) & (pdf.doc_b == pdf.doc_a + 1_000_000)]
    assert len(exact) > 0
    assert (exact.edit_distance == 0).all()
    assert (pdf.head_similarity >= 0.8).all()


def test_int8_quant_preserves_ranking_mostly(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity import int8_quant_cosine_error

    pdf = int8_quant_cosine_error(spark, sf_dir).toPandas()
    # int8 symmetric quantization at these dims: cosine error stays tiny
    assert (pdf.abs_err <= 0.01).all()
    assert (pdf.quant_cosine <= 1.0 + 1e-9).all()


def test_bpe_merge_pairs_are_two_chars(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import bpe_merge_pair_counts

    pdf = bpe_merge_pair_counts(spark, sf_dir).toPandas()
    assert (pdf["pair"].str.len() == 2).all()
    assert list(pdf.pair_count) == sorted(pdf.pair_count, reverse=True)
