"""PII detection/redaction and benchmark-contamination screening.

Not in the reference (its text analytics stop at sentiment/refs,
reddit_consumer.py:396-408), but mandatory stages of a training-data
pipeline: strip personally identifiable information before training, and
screen the corpus for evaluation-benchmark contamination before it poisons
the measurements.

The synthetic `documents` fixture contains no organic PII, so — exactly
like the dedup suite's duplicate injection (operators/dedup.py) — each
query augments the corpus deterministically with known PII, using the SAME
construction in the Spark query and the DuckDB oracle. True positives are
known by construction; everything else must stay negative.

Scale notes:
- PII scan/redact is a narrow per-row regex pipeline — no shuffle, fully
  pipelined inside whole-stage codegen, embarrassingly parallel at 100 TB.
- Contamination is an equi-join between the corpus' n-grams and the
  benchmark's n-gram set. The benchmark side is small by nature (eval sets
  are KBs-MBs, the corpus is the 100 TB side) → broadcast it and the scan
  side never shuffles. Patterns use the Java-regex ∩ RE2 subset so Spark
  and DuckDB agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# --------------------------------------------------------------- PII scan

# Portable (Java regex ∩ RE2) patterns — no lookaround, no backrefs.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# Deterministic injection: every 5th doc gains an email, every 11th a
# phone number, every 13th an IPv4 host — the values derive from doc_id so
# the oracle reconstructs them exactly.
_PII_CORPUS_SQL = """
        SELECT doc_id, lang,
               lower(text)
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-123-4567 today' ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN ' from host 10.0.' || (doc_id % 256) || '.7'
                       ELSE '' END AS text
        FROM documents
"""


def pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.when(
        did % 5 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
    ).otherwise("")
    phone = F.when(did % 11 == 0, F.lit(" call 555-123-4567 today")).otherwise("")
    ip = F.when(
        did % 13 == 0,
        F.concat(F.lit(" from host 10.0."), (did % 256).cast("string"), F.lit(".7")),
    ).otherwise("")
    return docs.select(
        "doc_id", "lang", F.concat(F.lower("text"), email, phone, ip).alias("text")
    )


def _count(col: str, pattern: str) -> F.Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


@register(
    "pii_redaction",
    oracle=f"""
    WITH corpus AS ({_PII_CORPUS_SQL})
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}'))  AS n_emails,
           len(regexp_extract_all(text, '{PHONE_RE}'))  AS n_phones,
           len(regexp_extract_all(text, '{IPV4_RE}'))   AS n_ips,
           length(regexp_replace(regexp_replace(regexp_replace(text,
                  '{EMAIL_RE}', '[EMAIL]', 'g'),
                  '{PHONE_RE}', '[PHONE]', 'g'),
                  '{IPV4_RE}',  '[IP]',    'g'))         AS redacted_chars
    FROM corpus
    ORDER BY doc_id
    """,
    doc="PII detect + redact: email/phone/IPv4 regex counts and the length "
    "of the redacted text — narrow per-row expressions, zero shuffle; the "
    "redaction placeholder lengths are value-checked end-to-end",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = pii_corpus(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ),
        IPV4_RE,
        "[IP]",
    )
    return corpus.select(
        "doc_id",
        _count("text", EMAIL_RE).alias("n_emails"),
        _count("text", PHONE_RE).alias("n_phones"),
        _count("text", IPV4_RE).alias("n_ips"),
        F.length(redacted).alias("redacted_chars"),
    )  # no orderBy: a global sort on a corpus-sized output is pure shuffle


@register(
    "pii_prevalence_by_lang",
    oracle=f"""
    WITH corpus AS ({_PII_CORPUS_SQL}),
    per_doc AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '{EMAIL_RE}'))
             + len(regexp_extract_all(text, '{PHONE_RE}'))
             + len(regexp_extract_all(text, '{IPV4_RE}')) AS n_pii
        FROM corpus
    )
    SELECT lang,
           count(*)                                    AS n_docs,
           CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)  AS n_docs_with_pii,
           CAST(sum(n_pii) AS BIGINT)                                  AS n_pii_total
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="PII prevalence rollup per language: docs affected and total "
    "hits — the go/no-go report before a training run",
)
def pii_prevalence_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = pii_corpus(spark, sf_dir)
    per_doc = corpus.select(
        "lang",
        (
            _count("text", EMAIL_RE) + _count("text", PHONE_RE) + _count("text", IPV4_RE)
        ).alias("n_pii"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_pii") > 0, 1).otherwise(0)).alias("n_docs_with_pii"),
            F.sum("n_pii").alias("n_pii_total"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------- benchmark contamination

NGRAM = 5  # contamination n-gram length
BENCH_PREFIX = 40  # benchmark docs = first 40 tokens of every 13th doc

_GRAMS_SQL = rf"""
        tok AS (
            SELECT doc_id, word,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '\s+'))                 AS word,
                       generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
                FROM documents
            ) WHERE word <> ''
        ),
        gram AS (
            SELECT doc_id, rn,
                   word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
                        || ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w AS g
            FROM tok
            WINDOW w AS (PARTITION BY doc_id ORDER BY rn)
            QUALIFY lead(word, {NGRAM - 1}) OVER w IS NOT NULL
        ),
        bench AS (
            SELECT DISTINCT g FROM gram
            WHERE doc_id % 13 = 0 AND rn <= {BENCH_PREFIX - NGRAM + 1}
        )
"""


def _doc_grams(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, rn, g) — 5-gram at token position rn (1-based).

    Pass a pre-filtered ``docs`` frame to bound the expansion: the 5-gram
    transform+explode is the expensive part, so callers that only need a
    subset (e.g. the benchmark side below) filter BEFORE expanding rather
    than expanding the whole corpus twice.
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    # Materialize toks in its own projection: referencing the split inside
    # the transform lambda re-runs the regex per element (see dedup.shingle_rows).
    tokdf = docs.select("doc_id", toks.alias("toks"))
    gram = F.when(
        F.size("toks") >= NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (NGRAM - 1)),
            lambda i: F.struct(
                i.alias("rn"),
                F.concat_ws(
                    " ", *[F.element_at("toks", i + k) for k in range(NGRAM)]
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<rn:int,g:string>>"))
    ggen, gkeep = explode_clean(gram, "e")
    return tokdf.select("doc_id", ggen).filter(gkeep).select(
        "doc_id", F.col("e.rn").alias("rn"), F.col("e.g").alias("g")
    )


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH {_GRAMS_SQL}
    SELECT t.doc_id, count(DISTINCT t.g) AS n_shared_ngrams
    FROM gram t
    JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    ORDER BY doc_id
    """,
    doc="Benchmark-contamination screen: corpus docs sharing any 5-gram "
    "with the benchmark set (here: the first 40 tokens of every 13th doc, "
    "so those docs are contaminated by construction). The benchmark n-gram "
    "set is broadcast — the 100 TB corpus side never shuffles for the join",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gram = _doc_grams(spark, sf_dir, docs)
    # Benchmark side expands only every 13th doc (filter BEFORE the 5-gram
    # explode): the corpus-wide expansion runs exactly once, instead of the
    # full gram frame being computed for both join inputs.
    bench = (
        _doc_grams(spark, sf_dir, docs.filter(F.col("doc_id") % 13 == 0))
        .filter(F.col("rn") <= BENCH_PREFIX - NGRAM + 1)
        .select("g")
        .distinct()
    )
    return (
        gram.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_ngrams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------- filter funnel

MIN_TOKENS = 20            # too-short cut
MAX_PII_MATCHES = 1        # reject when email+phone+ip matches exceed this
MIN_DISTINCT_RATIO = 0.45  # Gopher-style degenerate-repetition cut


@register(
    "filter_funnel",
    oracle=rf"""
    WITH corpus AS ({_PII_CORPUS_SQL}),
    tok AS (
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
            FROM corpus
        ) WHERE word <> ''
    ),
    t AS (
        SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
        FROM tok GROUP BY doc_id
    ),
    p AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}'))
             + len(regexp_extract_all(text, '{PHONE_RE}'))
             + len(regexp_extract_all(text, '{IPV4_RE}')) AS n_pii
        FROM corpus
    ),
    staged AS (
        SELECT CASE
            WHEN t.n_tokens < {MIN_TOKENS}                              THEN '1_too_short'
            WHEN p.n_pii > {MAX_PII_MATCHES}                            THEN '2_pii_heavy'
            WHEN t.n_distinct * 1.0 / t.n_tokens < {MIN_DISTINCT_RATIO} THEN '3_repetitive'
            ELSE '4_kept' END AS stage
        FROM t JOIN p USING (doc_id)
    ),
    tot AS (SELECT count(*) AS total FROM staged)
    SELECT stage, count(*) AS n_docs,
           round(count(*) * 1.0 / max(total), 6) AS pct
    FROM staged CROSS JOIN tot
    GROUP BY stage
    ORDER BY stage
    """,
    doc="Corpus-cleaning funnel report: every document is attributed to the "
    "FIRST rule that rejects it (too short → PII-heavy → repetitive) or to "
    "the kept bucket, with per-stage counts and corpus fraction — the "
    "acceptance report a training-data pipeline publishes per snapshot. "
    "One pass over the corpus: per-doc stats are array expressions (token "
    "array materialized once in its own projection), the only shuffle is "
    "the 4-row stage aggregate; the grand total joins back via broadcast",
)
def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import tokens

    corpus = pii_corpus(spark, sf_dir)
    n_pii = (
        _count("text", EMAIL_RE) + _count("text", PHONE_RE) + _count("text", IPV4_RE)
    )
    tokdf = corpus.select("doc_id", n_pii.alias("n_pii"), tokens("text").alias("toks"))
    stats = tokdf.select(
        "doc_id",
        "n_pii",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    stage = (
        F.when(F.col("n_tokens") < MIN_TOKENS, "1_too_short")
        .when(F.col("n_pii") > MAX_PII_MATCHES, "2_pii_heavy")
        .when(
            F.col("n_distinct") / F.col("n_tokens").cast("double") < MIN_DISTINCT_RATIO,
            "3_repetitive",
        )
        .otherwise("4_kept")
    )
    staged = stats.select(stage.alias("stage"))
    counts = staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))
    total = staged.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "stage",
            "n_docs",
            F.round(F.col("n_docs") / F.col("total").cast("double"), 6).alias("pct"),
        )
        .orderBy("stage")
    )
