"""Wire JSON → posts pipeline (P1/P2/P3, F1) + refs extraction (F3-F6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import posts as posts_ops
from reddit_sentiment_spark_streaming_pipeline_spark.operators import refs as refs_ops


def test_parse_posts_drops_keepalive_and_malformed(spark):
    wire = spark.createDataFrame(
        [
            ('{"type":"submission","subreddit":"s1","id":"a","text":"hello world this is long","created_utc":1704067200.0,"author":"u1"}',),
            ('{"type":"keepalive","created_utc":1704067201.0}',),
            ("{not json at all",),
            ('{"type":"submission","subreddit":"s1","id":"b","text":"short","created_utc":1704067202.0,"author":"u2"}',),
            ('{"type":"submission","subreddit":"s2","id":"c","text":null,"created_utc":1704067203.0,"author":"u3"}',),
        ],
        ["value"],
    )
    out = posts_ops.parse_posts(wire).collect()
    assert [r.id for r in out] == ["a"]
    row = out[0]
    assert row.text_length == len("hello world this is long")
    assert str(row.created_time).startswith("2024-01-01 00:00:00")


def test_synthetic_wire_roundtrip_counts(spark, sf_dir):
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    parsed = posts_ops.wire_posts_pipeline(spark, sf_dir)
    n = parsed.count()
    # all docs survive except the corrupted ~1/97 subset (fixture text >10 chars)
    assert n < docs_n
    assert n >= docs_n - (docs_n // 97) - 2
    assert parsed.filter(F.col("type") == "keepalive").count() == 0


def test_refs_counts_match_augmentation_rule(spark, sf_dir):
    df = refs_ops.refs_extract(spark, sf_dir)
    rows = {r.doc_id: r for r in df.collect()}
    for doc_id, r in rows.items():
        assert r.user_refs == (1 if doc_id % 3 == 0 else 0)
        assert r.sub_refs == (1 if doc_id % 4 == 0 else 0)
        assert r.urls == (1 if doc_id % 5 == 0 else 0)


def test_refs_rollup_has_grand_total(spark, sf_dir):
    df = refs_ops.refs_rollup(spark, sf_dir).toPandas().set_index("source_grp")
    per_source = df.drop(index="ALL")
    assert df.loc["ALL", "total_user_refs"] == per_source.total_user_refs.sum()
    assert df.loc["ALL", "total_urls"] == per_source.total_urls.sum()
