"""Link-graph analytics: PageRank domain authority."""

from __future__ import annotations

import pytest

from reddit_sentiment_spark_streaming_pipeline_spark.operators.graph import DAMPING, PR_ITERS, domain_pagerank


def test_domain_pagerank_fixed_point_structure(spark, sf_dir):
    rows = domain_pagerank(spark, sf_dir).toPandas()
    n = len(rows)
    assert n > 0
    assert (rows["rank"] > 0).all()
    # dangling mass is dropped, so total rank can't exceed 1
    assert rows["rank"].sum() <= 1.0 + 1e-6
    # corpus sources have no in-links: their rank is exactly the base term
    base = round((1 - DAMPING) / n, 9)
    sources = rows[rows.node.isin(["web", "wiki", "news", "books", "code", "forum"])]
    if len(sources):
        assert (sources["rank"] == base).all()
        # every domain (has in-links) outranks every source (has none)
        domains = rows[~rows.node.isin(sources.node)]
        assert domains["rank"].min() > sources["rank"].max()
    assert PR_ITERS >= 2  # more than one propagation step actually ran
