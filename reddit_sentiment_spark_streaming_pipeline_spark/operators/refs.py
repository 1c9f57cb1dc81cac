"""Reference-mention extraction (the reference's user/subreddit/URL refs).

Parity (reference file:line):
- regexp_extract_all of /u/\\w+, /r/\\w+, https?://[^\\s]+ → arrays:
  reddit_consumer.py:398-402 (F3-F5)
- size() counts per post: reddit_consumer.py:405-407 (F6)
- per-subreddit sums: reddit_consumer.py:410-414 (A7)
- grand totals: reddit_consumer.py:416-420 (A8) — re-expressed as a single
  ROLLUP pass instead of the reference's second aggregation over the first.

The documents fixture has no organic /u/ mentions, so the query first
augments the text deterministically (same expression in the oracle) —
keeping the regexes byte-identical to the reference's.

Scale: extraction is per-row (narrow, codegen'd); the per-source aggregate
is one shuffle with map-side partial aggregation; ROLLUP computes subgroup
and grand totals in the same shuffle rather than a second job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

USER_REF_PATTERN = r"/u/\w+"
SUB_REF_PATTERN = r"/r/\w+"
URL_PATTERN = r"https?://[^\s]+"


def augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically append wire-style mentions to a subset of docs."""
    docs = load_table(spark, sf_dir, "documents")
    user_part = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" /u/user"), (F.col("doc_id") % 10).cast("string")),
    ).otherwise(F.lit(""))
    sub_part = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.lit(" /r/"), F.col("source"))
    ).otherwise(F.lit(""))
    url_part = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" https://site"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.com/p"), (F.col("doc_id") % 7).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn("text_aug", F.concat(F.col("text"), user_part, sub_part, url_part))


_AUG_SQL = """
        SELECT *,
               text
               || CASE WHEN doc_id % 3 = 0 THEN ' /u/user' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END
               || CASE WHEN doc_id % 4 = 0 THEN ' /r/' || source ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN ' https://site' || CAST(doc_id % 4 AS VARCHAR) || '.example.com/p' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
               AS text_aug
        FROM documents
"""


@register(
    "refs_extract",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT doc_id,
           len(regexp_extract_all(text_aug, '/u/\\w+'))          AS user_refs,
           len(regexp_extract_all(text_aug, '/r/\\w+'))          AS sub_refs,
           len(regexp_extract_all(text_aug, 'https?://[^\\s]+')) AS urls
    FROM aug
    """,
    doc="F3-F6: regexp_extract_all + size per document",
)
def refs_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = augmented_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text_aug", F.lit(USER_REF_PATTERN), F.lit(0))).alias("user_refs"),
        F.size(F.regexp_extract_all("text_aug", F.lit(SUB_REF_PATTERN), F.lit(0))).alias("sub_refs"),
        F.size(F.regexp_extract_all("text_aug", F.lit(URL_PATTERN), F.lit(0))).alias("urls"),
    )


@register(
    "refs_rollup",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT coalesce(source, 'ALL')                                    AS source_grp,
           CAST(sum(len(regexp_extract_all(text_aug, '/u/\\w+'))) AS BIGINT)          AS total_user_refs,
           CAST(sum(len(regexp_extract_all(text_aug, '/r/\\w+'))) AS BIGINT)          AS total_sub_refs,
           CAST(sum(len(regexp_extract_all(text_aug, 'https?://[^\\s]+'))) AS BIGINT) AS total_urls
    FROM aug
    GROUP BY ROLLUP (source)
    ORDER BY source_grp
    """,
    doc="A7+A8 in one pass: per-source ref sums plus grand totals via ROLLUP "
    "(the reference runs two separate aggregations, reddit_consumer.py:410-420)",
)
def refs_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = (
        augmented_docs(spark, sf_dir)
        .select(
            "source",
            F.size(F.regexp_extract_all("text_aug", F.lit(USER_REF_PATTERN), F.lit(0))).alias("u"),
            F.size(F.regexp_extract_all("text_aug", F.lit(SUB_REF_PATTERN), F.lit(0))).alias("s"),
            F.size(F.regexp_extract_all("text_aug", F.lit(URL_PATTERN), F.lit(0))).alias("l"),
        )
    )
    return (
        per_doc.rollup("source")
        .agg(
            F.sum("u").alias("total_user_refs"),
            F.sum("s").alias("total_sub_refs"),
            F.sum("l").alias("total_urls"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_grp"),
            "total_user_refs",
            "total_sub_refs",
            "total_urls",
        )
        .orderBy("source_grp")
    )


@register(
    "url_domain_stats",
    oracle=f"""
    WITH aug AS ({_AUG_SQL}),
    urls AS (
        SELECT doc_id, unnest(regexp_extract_all(text_aug, 'https?://[^\\s]+')) AS url
        FROM aug
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1)  AS domain,
           count(*)                                     AS n_urls,
           count(DISTINCT doc_id)                       AS n_docs
    FROM urls
    GROUP BY 1
    ORDER BY domain
    """,
    doc="URL extraction -> explode -> domain parse -> per-domain rollup: "
    "the domain-level stats a corpus filter ranks sources by (extraction "
    "codegen'd per row; one shuffle on the low-cardinality domain key)",
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ugen, ukeep = explode_clean(
        F.regexp_extract_all("text_aug", F.lit(URL_PATTERN), F.lit(0)), "url"
    )
    urls = augmented_docs(spark, sf_dir).select("doc_id", ugen).filter(ukeep)
    return (
        urls.select("doc_id", F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("domain")
    )
