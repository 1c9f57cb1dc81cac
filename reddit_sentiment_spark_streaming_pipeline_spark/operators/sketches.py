"""Mergeable-sketch operators: count-min heavy hitters.

Companion to the HLL++ cardinality sketch already in the events suite
(operators/events.py, `event_stats_approx`): a count-min sketch is THE
streaming/distributed frequency summary (Cormode & Muthukrishnan 2005),
and — unlike HLL — a *deterministic* one given fixed hash functions, so
the DuckDB oracle can replicate it bit-for-bit and the driver hash-checks
the whole sketch path, estimates included.

Scale shape: the sketch is a fixed DEPTH×WIDTH counter grid (1 KB-ish)
regardless of corpus size — per-partition partial sketches merge by cell
addition (a plain groupBy sum), exactly how you'd maintain it across
1000 executors or inside a streaming state store. Estimation for a
candidate set is a broadcast join against the tiny sketch frame. The
exact counts computed alongside exist to *audit* the sketch (CMS error
bound: overestimate only, ≤ 2N/WIDTH with prob 1-2^-DEPTH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean, tokens, TOKENS_SQL
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

CMS_DEPTH = 4
CMS_WIDTH = 256
TOP_K = 20

_HEX = "0123456789abcdef"


def _bucket_sql(depth: int, word: str = "word") -> str:
    """Row hash for CMS row `depth`: first two md5 nibbles of the salted
    token -> 0..255. Pure string/arith SQL shared verbatim by Spark and
    DuckDB (the functions/hashing.py idiom)."""
    salted = f"md5(concat('{depth}:', {word}))"
    return (
        f"((instr('{_HEX}', substr({salted}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr({salted}, 2, 1)) - 1))"
    )


_STACK = ", ".join(f"{d}, {_bucket_sql(d)}" for d in range(CMS_DEPTH))
_BUCKET_UNION = " UNION ALL ".join(
    f"SELECT word, cnt, {d} AS depth, {_bucket_sql(d)} AS bucket FROM exact"
    for d in range(CMS_DEPTH)
)


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({TOKENS_SQL}) WHERE word <> ''),
    exact AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word),
    cells AS ({_BUCKET_UNION}),
    sketch AS (
        SELECT depth, bucket, sum(cnt) AS cell FROM cells GROUP BY depth, bucket
    ),
    topk AS (
        SELECT word, cnt FROM exact
        ORDER BY cnt DESC, word LIMIT {TOP_K}
    ),
    est AS (
        SELECT c.word, min(s.cell) AS cms_estimate
        FROM cells c
        JOIN topk t USING (word)
        JOIN sketch s USING (depth, bucket)
        GROUP BY c.word
    )
    SELECT t.word,
           t.cnt AS exact_count,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(e.cms_estimate - t.cnt AS BIGINT) AS overestimate
    FROM topk t JOIN est e USING (word)
    """,
    doc=f"Count-min sketch ({CMS_DEPTH}x{CMS_WIDTH}, md5-salted row "
    "hashes) over corpus tokens, audited against exact counts for the "
    f"top-{TOP_K} heavy hitters. The sketch is built from per-word "
    "counts (one token shuffle, already needed for the audit), merged "
    "by cell addition — the partial-aggregable fixed-size summary you "
    "would maintain per-executor at 100 TB — and estimates are "
    "min-over-rows via a broadcast join on the 1024-cell sketch. "
    "Deterministic hashes make the estimates themselves hash-checkable.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wgen, wkeep = explode_clean(tokens("text"), "word")
    exact = (
        docs.select(wgen).filter(wkeep)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # referenced three times below (sketch cells, top-k, estimate
        # join); one lineage cut materializes the token shuffle once —
        # the frame is |vocab| rows, tiny at any corpus size
        .localCheckpoint()
    )
    # one row per (word, depth, bucket): the word's CMS cell addresses
    cells = exact.select(
        "word",
        "cnt",
        F.expr(f"stack({CMS_DEPTH}, {_STACK}) AS (depth, bucket)"),
    )
    sketch = cells.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cell"))
    topk = exact.orderBy(F.desc("cnt"), "word").limit(TOP_K)
    est = (
        cells.join(F.broadcast(topk.select("word")), "word")
        .join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("word")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return (
        topk.join(est, "word")
        .select(
            "word",
            F.col("cnt").alias("exact_count"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("cnt")).cast("long").alias("overestimate"),
        )
    )
