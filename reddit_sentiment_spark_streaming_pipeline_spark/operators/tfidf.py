"""TF-IDF keyword extraction — the reference's most complex query (§2.11).

Parity (reference file:line, reddit_consumer.py):
- Tokenizer → StopWordsRemover → CountVectorizer(vocabSize=10000) →
  IDF(minDocFreq=0): :183-207
- stringify-UDF + explode + split/cast (U2/F7/F8/F10): :210-227
- vocab dim join (J1): :230-231
- group-by word sum/count + avg_score (A6): :234-237
- top-10 by avg_score desc (O1): :240-243

Semantics preserved: tf = per-doc term count; smoothed idf =
ln((N+1)/(df+1)) (MLlib's formula); per-word avg over documents containing
the word; vocab capped at the 10,000 most frequent terms; top-10 with a
deterministic word-asc tie-break (the reference's top-k is tie-unstable).

Two implementations:
- ``tfidf_topk`` — explicit DataFrame algebra. This is the 100 TB path:
  tf is a (doc_id, word) partial-aggregated shuffle; everything after is
  word-cardinality (tiny); N arrives by broadcast, not driver collect.
- ``tfidf_topk_mlpipe`` — the reference-shaped pyspark.ml pipeline, with
  the dead stringify round-trip replaced by vector_to_array + posexplode
  (what the reference's dead code U3 intended). Same oracle — the two
  implementations must agree bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import (
    CONTENT_TOKENS_SQL,
    STOPWORDS,
    content_tokens,
    explode_clean,
)
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

VOCAB_SIZE = 10_000
TOP_K = 10

# Word-level TF-IDF stats as a DuckDB CTE chain mirroring the engine.
_WORD_SCORES_SQL = f"""
        WITH tok AS ({CONTENT_TOKENS_SQL}),
        tf AS (
            SELECT doc_id, word, count(*)::BIGINT AS tf
            FROM tok GROUP BY doc_id, word
        ),
        n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        wordstats AS (
            SELECT word,
                   count(*)::BIGINT AS df,
                   sum(tf)::BIGINT  AS total_tf
            FROM tf GROUP BY word
        ),
        vocab AS (
            SELECT word, df, total_tf
            FROM (
                SELECT *, row_number() OVER (ORDER BY total_tf DESC, word) AS rk
                FROM wordstats
            ) WHERE rk <= {VOCAB_SIZE}
        ),
        scored AS (
            SELECT v.word,
                   v.df,
                   v.total_tf,
                   round(ln((n.n_docs + 1.0) / (v.df + 1.0)) * v.total_tf / v.df, 6) AS avg_score
            FROM vocab v CROSS JOIN n
        )
"""


def word_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, df, total_tf, avg_score) for the capped vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    tgen, tkeep = explode_clean(content_tokens("text"), "word")
    tok = docs.select("doc_id", tgen).filter(tkeep)
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    wordstats = tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    # CountVectorizer's vocabSize cap: keep the most frequent terms
    # (deterministic word-asc tie-break). orderBy+limit compiles to
    # TakeOrderedAndProject — per-partition top-k merged at the driver — so
    # unlike a global row_number() window it never funnels the whole word
    # relation through one partition (word cardinality at corpus scale is
    # itself huge).
    vocab = wordstats.orderBy(F.desc("total_tf"), "word").limit(VOCAB_SIZE)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return vocab.crossJoin(F.broadcast(n)).select(
        "word",
        "df",
        "total_tf",
        F.round(
            F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            * F.col("total_tf")
            / F.col("df"),
            6,
        ).alias("avg_score"),
    )


@register(
    "tfidf_word_stats",
    oracle=_WORD_SCORES_SQL + "SELECT word, df, total_tf, avg_score FROM scored",
    doc="§2.11 steps 1-7: full word-level tf/df/avg-tfidf relation",
)
def tfidf_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_scores(spark, sf_dir)


@register(
    "tfidf_topk",
    oracle=_WORD_SCORES_SQL
    + f"""
    SELECT word, df, total_tf, avg_score
    FROM scored
    ORDER BY avg_score DESC, word
    LIMIT {TOP_K}
    """,
    doc="§2.11 the full keyword query: top-10 by avg TF-IDF "
    "(O1 TakeOrderedAndProject, deterministic tie-break)",
)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_scores(spark, sf_dir).orderBy(F.desc("avg_score"), "word").limit(TOP_K)


@register(
    "tfidf_topk_mlpipe",
    oracle=_WORD_SCORES_SQL
    + f"""
    SELECT word, round(avg_score, 6) AS avg_score
    FROM scored
    ORDER BY avg_score DESC, word
    LIMIT {TOP_K}
    """,
    doc="Reference-shaped pyspark.ml pipeline (Tokenizer→StopWordsRemover→"
    "CountVectorizer→IDF), vector_to_array+posexplode instead of the "
    "stringify round-trip; must agree with the explicit-algebra version",
)
def tfidf_topk_mlpipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import IDF, CountVectorizer, StopWordsRemover, Tokenizer
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    filtered = StopWordsRemover(
        inputCol="words", outputCol="filtered", stopWords=STOPWORDS
    ).transform(words)
    cv_model = CountVectorizer(
        inputCol="filtered", outputCol="cv_features", vocabSize=VOCAB_SIZE
    ).fit(filtered)
    cv = cv_model.transform(filtered)
    idf = IDF(inputCol="cv_features", outputCol="features", minDocFreq=0).fit(cv).transform(cv)
    vocab_df = F.broadcast(
        idf.sparkSession.createDataFrame(
            list(enumerate(cv_model.vocabulary)), ["idx", "word"]
        )
    )
    # (idx, tf, score) rows; keep tf>0 entries (the sparse entries the
    # reference's U2 emitted) — NOT score!=0, which would drop idf==0 words.
    zipped = idf.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                vector_to_array("cv_features").alias("tf"),
                vector_to_array("features").alias("score"),
            )
        ).alias("idx", "entry"),
    ).select(
        "doc_id",
        "idx",
        F.col("entry.tf").alias("tf"),
        F.col("entry.score").alias("score"),
    ).filter(F.col("tf") > 0)
    return (
        zipped.join(vocab_df, "idx")
        .groupBy("word")
        .agg((F.sum("score") / F.count(F.lit(1))).alias("raw_avg"))
        .select("word", F.round("raw_avg", 6).alias("avg_score"))
        .orderBy(F.desc("avg_score"), "word")
        .limit(TOP_K)
    )


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS ({CONTENT_TOKENS_SQL}),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT round(avg(dl), 9) AS avgdl,
               (SELECT count(*)::BIGINT FROM documents) AS n_docs
        FROM dl
    ),
    qtf AS (
        SELECT doc_id, word, count(*)::BIGINT AS tf
        FROM tok
        WHERE word IN ('data', 'query', 'stream', 'vector', 'hash')
        GROUP BY doc_id, word
    ),
    idf AS (
        SELECT word,
               round(ln((s.n_docs - df + 0.5) / (df + 0.5) + 1), 9) AS idf
        FROM (SELECT word, count(*)::BIGINT AS df FROM qtf GROUP BY word)
        CROSS JOIN stats s
    ),
    contrib AS (
        SELECT q.doc_id,
               round(i.idf * q.tf * (1.2 + 1)
                     / (q.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)), 9) AS c
        FROM qtf q
        JOIN idf i USING (word)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT c.doc_id, d.dl, round(sum(c.c), 6) AS score
    FROM contrib c JOIN dl d USING (doc_id)
    GROUP BY c.doc_id, d.dl
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 (Okapi, k1=1.2 b=0.75, Lucene's always-positive +1 idf) "
    "top-20 documents for a fixed content-word query — the lexical "
    "retrieval baseline next to the ANN suite (a production pipeline "
    "hybrid-ranks BM25 with embedding cosine). Scale shape mirrors "
    "tfidf_topk: tf is a (doc_id, word) partial-aggregated shuffle "
    "pre-filtered to the query terms (predicate pushes into the scan), "
    "idf/avgdl are word- and scalar-cardinality broadcast sides, and "
    "the final ranking is TakeOrderedAndProject, never a full sort. "
    "Per-term contributions round to 9 decimals before the sum (FP "
    "parity with the oracle), the summed score to 6.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    K1, B = 1.2, 0.75
    query_terms = ["data", "query", "stream", "vector", "hash"]
    docs = load_table(spark, sf_dir, "documents")
    tgen, tkeep = explode_clean(content_tokens("text"), "word")
    tok = docs.select("doc_id", tgen).filter(tkeep)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = dl.agg(F.round(F.avg("dl"), 9).alias("avgdl")).crossJoin(
        F.broadcast(n_docs)
    )
    qtf = (
        tok.filter(F.col("word").isin(query_terms))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        qtf.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "word",
            F.round(
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1), 9
            ).alias("idf"),
        )
    )
    contrib = (
        qtf.join(F.broadcast(idf), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            F.round(
                F.col("idf") * F.col("tf") * (K1 + 1)
                / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
                9,
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id", "dl")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )
