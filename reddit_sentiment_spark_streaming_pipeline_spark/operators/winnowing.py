"""Winnowing (MOSS) contamination index and unigram-LM quality.

Extracted from operators/textstats.py as its own family: the winnowing
fingerprint/overlap pipeline and the CCNet-style unigram-LM scorer share
these constants and nothing else in the text-analysis suite does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import _TOK_POS_SQL
from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean, tokens
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# ------------------------------------------- winnowing fingerprints (MOSS)

# Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash every
# k-gram, slide a window of W consecutive hashes, keep each window's
# minimum — guarantees any shared run of >= W + K - 1 tokens between two
# docs shares at least one selected fingerprint, at ~1/W the storage of
# all k-gram hashes. Substring-granular contamination detection where
# doc-level MinHash is too coarse.
WINNOW_K = 3   # tokens per k-gram
WINNOW_W = 4   # k-gram hashes per winnowing window
_WINNOW_MOD = 1_000_000_007


@register(
    "winnowing_fingerprints",
    oracle=rf"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    kg AS (
        SELECT doc_id,
               word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS kgram,
               row_number() OVER w AS rn
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(word, {WINNOW_K - 1}) OVER w IS NOT NULL
    ),
    hv AS (
        SELECT doc_id, rn,
               CAST('0x' || substr(md5(kgram), 1, 7) AS BIGINT) AS hv
        FROM kg
    ),
    wm AS (
        SELECT doc_id, rn, hv,
               min(hv) OVER (PARTITION BY doc_id ORDER BY rn
                             ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
        FROM hv
    )
    SELECT doc_id,
           count(*) AS n_kgrams,
           count(DISTINCT CASE WHEN rn >= {WINNOW_W} THEN wmin END) AS n_fingerprints,
           CAST(coalesce(sum(DISTINCT CASE WHEN rn >= {WINNOW_W} THEN wmin END), 0)
                % {_WINNOW_MOD} AS BIGINT) AS fp_checksum
    FROM wm GROUP BY doc_id
    """,
    doc="Winnowing document fingerprints (Schleimer et al. 2003, the MOSS "
    "algorithm): 28-bit hash per 3-token k-gram, min over each window of "
    "4 consecutive hashes, distinct mins = the fingerprint set (emitted "
    "as count + mod-p checksum — integer-exact in both engines). "
    "Per-doc narrow pipeline: the window min partitions by doc_id, so "
    "the only shuffle is the doc_id-keyed aggregate; fingerprint storage "
    "is ~1/W of all k-gram hashes, the property that makes "
    "substring-granular contamination indexes feasible at corpus scale.",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from reddit_sentiment_spark_streaming_pipeline_spark.functions.hashing import hex28_expr

    # One cheap shuffle of the raw docs spreads the CPU-dominant kgram
    # hashing across the cluster (the parquet scan is one file -> one or
    # two partitions; same rationale as dedup_corpus).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = tokens("text")
    kgrams = F.when(
        F.size(toks) >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (WINNOW_K - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    kg = docs.select(
        "doc_id", F.posexplode(kgrams).alias("pos0", "kgram")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("rn"),
        F.expr(hex28_expr("kgram", "spark")).alias("hv"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("rn")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    wm = kg.select("doc_id", "rn", F.min("hv").over(w).alias("wmin"))
    sel = F.when(F.col("rn") >= WINNOW_W, F.col("wmin"))
    return wm.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kgrams"),
        F.count_distinct(sel).alias("n_fingerprints"),
        (F.coalesce(F.sum_distinct(sel), F.lit(0)) % _WINNOW_MOD)
        .cast("bigint")
        .alias("fp_checksum"),
    )


# --------------------------------------- unigram LM quality (CCNet-style)

# Corpus-frequency language-model proxy: score each document by the mean
# log-probability of its tokens under the corpus unigram distribution
# (CCNet/Gopher-style quality signal — boilerplate scores high, gibberish
# and OCR noise score low), plus the fraction of rare tokens.
LOGPROB_TOP_K = 4096   # broadcast vocabulary size (head of the frequency table)
LOGPROB_OOV_COUNT = 0.5  # pseudo-count for tokens outside the top-K
RARE_MAX_COUNT = 2     # corpus count <= this => token counts as rare


@register(
    "unigram_logprob_scores",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    vocab AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word),
    topk AS (SELECT word, cnt FROM vocab ORDER BY cnt DESC, word LIMIT {LOGPROB_TOP_K}),
    tot AS (SELECT count(*) AS n_total FROM tok),
    scored AS (
        SELECT t.doc_id,
               round(ln(coalesce(k.cnt, {LOGPROB_OOV_COUNT}) / tot.n_total), 9) AS lp,
               CASE WHEN coalesce(k.cnt, 0) <= {RARE_MAX_COUNT} THEN 1 ELSE 0 END AS is_rare
        FROM tok t LEFT JOIN topk k USING (word) CROSS JOIN tot
    )
    SELECT doc_id,
           count(*)                                 AS n_tokens,
           round(avg(lp), 6)                        AS mean_logprob,
           round(sum(is_rare) * 1.0 / count(*), 6)  AS rare_ratio
    FROM scored GROUP BY doc_id
    """,
    doc="Unigram language-model quality scores (CCNet-style): per-doc "
    "mean token log-probability under the corpus unigram distribution, "
    "plus rare-token ratio. Scale shape: the vocabulary is ONE "
    "word-keyed aggregate; only its top-K head (fixed KB-size) is kept "
    "and broadcast, so scoring is a broadcast-hash join over the token "
    "stream — no token shuffle — with out-of-vocabulary tokens floored "
    "at a pseudo-count, then one doc_id-keyed aggregate. Per-token "
    "log-probs are rounded to 9 decimals in BOTH engines before "
    "averaging (the kmeans centroid trick) so FP parity holds.",
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tgen, tkeep = explode_clean(tokens("text"), "word")
    tok = docs.select("doc_id", tgen).filter(tkeep)
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    topk = vocab.orderBy(F.desc("cnt"), "word").limit(LOGPROB_TOP_K)
    tot = tok.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tok.join(F.broadcast(topk), "word", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log(F.coalesce(F.col("cnt"), F.lit(LOGPROB_OOV_COUNT)) / F.col("n_total")), 9
            ).alias("lp"),
            (F.coalesce(F.col("cnt"), F.lit(0)) <= RARE_MAX_COUNT)
            .cast("int")
            .alias("is_rare"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
        F.round(F.sum("is_rare") / F.count(F.lit(1)), 6).alias("rare_ratio"),
    )


# Docs sharing >= this many selected fingerprints are overlap candidates.
WINNOW_MIN_SHARED = 2
# Cap on docs per fingerprint bucket before pair expansion (skew guard —
# a boilerplate phrase everyone shares must not expand |docs|² pairs).
WINNOW_BUCKET_CAP = 64


@register(
    "winnowing_overlap_pairs",
    oracle=rf"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    kg AS (
        SELECT doc_id,
               word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS kgram,
               row_number() OVER w AS rn
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(word, {WINNOW_K - 1}) OVER w IS NOT NULL
    ),
    hv AS (
        SELECT doc_id, rn,
               CAST('0x' || substr(md5(kgram), 1, 7) AS BIGINT) AS hv
        FROM kg
    ),
    fp AS (
        SELECT doc_id,
               min(hv) OVER (PARTITION BY doc_id ORDER BY rn
                             ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS fp
        FROM hv
        QUALIFY rn >= {WINNOW_W}
    ),
    buck AS (
        SELECT fp,
               unnest(list_slice(list_sort(list(DISTINCT doc_id)), 1, {WINNOW_BUCKET_CAP}))
                   AS doc_id
        FROM fp GROUP BY fp
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM buck a JOIN buck b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_MIN_SHARED}
    ORDER BY doc_a, doc_b
    """,
    doc="The winnowing contamination INDEX in action: docs are paired by "
    "equi-join on selected fingerprints (same shape as the LSH band "
    "join — pairs ∝ genuinely shared substrings, never |docs|²), with a "
    "shared-fingerprint count per pair. The MOSS guarantee makes this "
    "recall-complete for shared token runs of >= W + K - 1; at corpus "
    "scale the fingerprint table is ~1/W of all k-gram hashes and the "
    "join key is a 28-bit int, not text. Ubiquitous-boilerplate "
    "fingerprints are the skew hazard (one hot key → quadratic bucket), "
    "so buckets are capped at the smallest WINNOW_BUCKET_CAP doc_ids "
    "before expansion — the same deterministic cap as MAX_LSH_BUCKET, "
    "identical in the oracle.",
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fingerprint extraction is ARRAY-NATIVE: k-gram hashes, the sliding
    # window-min, and the distinct-fingerprint set all evaluate per
    # document inside whole-stage codegen — no 260k-row posexplode and no
    # doc_id window shuffle (winnowing_fingerprints keeps the row-wise
    # window formulation; both produce the identical per-doc fp set, and
    # this one reaches the bucket join one shuffle earlier). Per-doc cost
    # is O(n_kgrams * W) with W = 4.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def hex28(c):
        return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")

    t = F.col("t")
    hvs = F.when(
        F.size(t) >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (WINNOW_K - 1)),
            lambda i: hex28(
                F.concat_ws(
                    " ",
                    F.element_at(t, i),
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    h = F.col("hvs")
    mins = F.when(
        F.size(h) >= WINNOW_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(WINNOW_W), F.size(h)),
                lambda i: F.array_min(F.slice(h, i - (WINNOW_W - 1), WINNOW_W)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    _FP_GEN, _FP_KEEP = explode_clean(mins, "fp")
    fp = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", hvs.alias("hvs"))
        .select("doc_id", _FP_GEN)
        .filter(_FP_KEEP)
    )
    # Bucket-group + capped expansion (the minhash_candidates shape): ONE
    # shuffle of the fingerprint table, deterministic smallest-doc_id cap
    # against boilerplate-fingerprint skew. (doc_id, fp) dedup — adjacent
    # windows usually share their min, that's the compression — happens
    # INSIDE the bucket aggregate (collect_set), not as its own shuffle.
    buck = (
        fp.groupBy("fp")
        .agg(F.slice(F.sort_array(F.collect_set("doc_id")), 1, WINNOW_BUCKET_CAP).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = buck.select(
        "fp",
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p"),
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )

