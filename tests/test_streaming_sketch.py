"""Streaming CMS partials merge EXACTLY to the batch sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.posts import parse_posts, synthetic_wire
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.replay import read_wire_stream, write_wire_chunks
from reddit_sentiment_spark_streaming_pipeline_spark.streaming.sketches import (
    cms_cells,
    merged_cells,
    start_cms_stream,
)


def test_streaming_cms_merges_to_batch_sketch(spark, sf_dir, tmp_path):
    wire_dir = str(tmp_path / "wire")
    out_dir = str(tmp_path / "out")
    write_wire_chunks(synthetic_wire(spark, sf_dir), wire_dir, n_chunks=4)

    # stream: one chunk file per trigger -> 4 partial-cell batches
    q = start_cms_stream(read_wire_stream(spark, wire_dir), out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch: the same lines in one pass
    batch_posts = parse_posts(
        spark.read.text(wire_dir)
    ).filter(F.col("type") == "submission")
    batch = {
        (r.depth, r.bucket): r.cnt
        for r in cms_cells(batch_posts).collect()
    }
    merged = {
        (r.depth, r.bucket): r.cnt
        for r in merged_cells(spark, out_dir).collect()
    }
    assert merged == batch  # cell-for-cell, not approximately

    # at least two distinct batches actually contributed partials
    n_batches = (
        spark.read.parquet(f"{out_dir}/cms_cells")
        .select("batch_id").distinct().count()
    )
    assert n_batches >= 2
