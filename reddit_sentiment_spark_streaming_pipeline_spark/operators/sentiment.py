"""Sentiment queries over the document corpus.

Parity (reference file:line):
- per-post sentiment derive: reddit_consumer.py:308 (P3/U1)
- global average sentiment (the headline metric): reddit_consumer.py:356-366 (A3)

The oracle SQL reproduces the exact scoring formula with the lexicon
inlined as VALUES — so the UDF path is hash-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import (
    lexicon_values_sql,
    sentiment_pandas_udf,
    vader_doc_sql,
    with_sentiment,
    with_vader_sentiment,
)
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# Per-document compound score as a DuckDB CTE: token left-join lexicon,
# valence sum s, compound s/sqrt(s²+15), rounded like the engine.
_DOC_SENTIMENT_SQL = f"""
        WITH lex(word, score) AS (VALUES {lexicon_values_sql()}),
        tok AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        valence AS (
            SELECT t.doc_id,
                   sum(coalesce(CAST(l.score AS DOUBLE), 0.0)) AS s
            FROM tok t LEFT JOIN lex l ON t.word = l.word
            GROUP BY t.doc_id
        ),
        doc_sentiment AS (
            SELECT v.doc_id,
                   round(v.s / sqrt(v.s * v.s + 15.0), 6) AS sentiment
            FROM valence v
        )
"""


@register(
    "doc_sentiment",
    oracle=_DOC_SENTIMENT_SQL
    + """
    SELECT d.doc_id, d.sentiment
    FROM doc_sentiment d
    """,
    doc="P3/U1: per-document compound sentiment — built-in expression path "
    "(JVM-side map+fold; no Python worker in the plan)",
)
def doc_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_sentiment(docs).select("doc_id", "sentiment")


@register(
    "doc_sentiment_udf",
    oracle=_DOC_SENTIMENT_SQL
    + """
    SELECT d.doc_id, d.sentiment
    FROM doc_sentiment d
    """,
    doc="U1 UDF-parity path: same scores via Arrow-vectorized pandas UDF",
)
def doc_sentiment_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", sentiment_pandas_udf("text").alias("sentiment"))


@register(
    "avg_sentiment_global",
    oracle=_DOC_SENTIMENT_SQL
    + """
    SELECT round(avg(sentiment), 6) AS average_sentiment,
           count(*)                 AS n_docs
    FROM doc_sentiment
    """,
    doc="A3: the headline global average sentiment "
    "(reference writes one such row per micro-batch, reddit_consumer.py:361-366)",
)
def avg_sentiment_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_sentiment(docs).agg(
        F.round(F.avg("sentiment"), 6).alias("average_sentiment"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# Fixed case matrix proving each VADER heuristic fires: one row per rule.
# (case_id, text); NULL and empty exercise the guards.
_VADER_CASES: list[tuple[int, str | None]] = [
    (1, "the query is good"),
    (2, "the query is not good"),        # negation flips sign
    (3, "very good stream"),             # booster amplifies
    (4, "slightly good stream"),         # dampener attenuates
    (5, "a GOOD stream today"),          # mixed-case caps emphasis
    (6, "good stream!!!"),               # exclamation amplification
    (7, "slow but good"),                # but-clause reweighting
    (8, "don't love this plan"),         # n't contraction negation
    (9, "is the stream good ? ? ?"),     # question-mark amplification
    (10, "EVERYTHING IS GOOD"),          # all-caps text: no cap differential
    (11, "not very good"),               # negation over boosted valence
    (12, ""),                            # empty text
    (13, None),                          # null text
]


@register(
    "doc_sentiment_vader",
    oracle=vader_doc_sql()
    + """
    SELECT v.doc_id, v.sentiment
    FROM vader_doc v
    """,
    doc="U1 full-parity path: VADER heuristics (negation windows, "
    "booster/dampener coefficients, ALL-CAPS and punctuation emphasis, "
    "but-clause reweighting) as pure column algebra over the frozen "
    "lexicon. Parity: reddit_consumer.py:90-99 / Hutto & Gilbert 2014.",
)
def doc_sentiment_vader(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The VADER valence expression is CPU-dominant (CodegenFallback
    # higher-order fns); the 1-file scan would pin it to ~2 cores — one
    # cheap shuffle of the raw docs spreads it across the cluster (same
    # rule as dedup_corpus).
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return with_vader_sentiment(docs).select("doc_id", "sentiment")


@register(
    "vader_sentiment_cases",
    oracle=vader_doc_sql(
        source_sql="SELECT * FROM (VALUES "
        + ", ".join(
            "({}, {})".format(
                i, "CAST(NULL AS VARCHAR)" if t is None
                else "'" + t.replace("'", "''") + "'"
            )
            for i, t in _VADER_CASES
        )
        + ") AS t(doc_id, text)"
    )
    + """
    SELECT v.doc_id AS case_id, v.sentiment
    FROM vader_doc v
    """,
    doc="Constructed per-heuristic VADER fixture: each row isolates one "
    "rule (negation flip, booster, caps, punctuation, but-clause) so the "
    "hash check proves the rule fires, not just that totals agree.",
)
def vader_sentiment_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = spark.createDataFrame(_VADER_CASES, "doc_id int, text string")
    return (
        with_vader_sentiment(rows)
        .select(F.col("doc_id").alias("case_id"), "sentiment")
    )


@register(
    "avg_sentiment_by_lang",
    oracle=_DOC_SENTIMENT_SQL
    + """
    SELECT d2.lang,
           round(avg(d.sentiment), 6) AS avg_sentiment,
           count(*)                   AS post_count
    FROM doc_sentiment d JOIN documents d2 USING (doc_id)
    GROUP BY d2.lang
    ORDER BY d2.lang
    """,
    doc="A4-style grouped sentiment (group key ↔ reference subreddit)",
)
def avg_sentiment_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        with_sentiment(docs)
        .groupBy("lang")
        .agg(
            F.round(F.avg("sentiment"), 6).alias("avg_sentiment"),
            F.count(F.lit(1)).alias("post_count"),
        )
        .orderBy("lang")
    )
