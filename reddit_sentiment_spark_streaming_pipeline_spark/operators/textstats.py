"""Text-analysis operators for a training-data pipeline: token stats,
quality scoring, language-ID heuristic, rolling-hash fingerprinting.

All are per-document narrow pipelines (expression-only or one doc_id-keyed
aggregation) — embarrassingly parallel at 100 TB — and every one is
value-checked against a DuckDB oracle built from the same closed forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import (
    STOPWORDS,
    explode_clean,
    stopwords_sql_list,
    tokens,
)
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# ------------------------------------------------------------ token stats

_TOK_POS_SQL = r"""
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+'))                 AS word,
               generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
        FROM documents
"""


@register(
    "token_stats",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> '')
    SELECT doc_id,
           count(*)                          AS n_tokens,
           count(DISTINCT word)              AS n_distinct,
           round(avg(length(word)), 6)       AS avg_token_len
    FROM tok GROUP BY doc_id
    """,
    doc="Token counting: total / distinct / mean length per document",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The group key (doc_id) is row-local: every token of a doc lives in
    # the doc's own row, so the per-doc stats are computable array-side
    # with ZERO shuffle. The earlier explode + groupBy(doc_id) shape was
    # correct but paid two exchanges — and the count-distinct plan's
    # second exchange emits one row per (doc × occupied partition), a
    # partition-width constant factor the 10×/30× rehearsal measured at
    # 14.8×/50× shuffle records (base runs AQE-coalesce to one partition,
    # wide runs don't). Pure map stage now; sums accumulate as long so a
    # 2 GB single-doc text can't overflow the length accumulator.
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.round(
            F.aggregate("toks", F.lit(0).cast("long"), lambda a, w: a + F.length(w))
            / F.size("toks"),
            6,
        ).alias("avg_token_len"),
    )
    return t.filter(F.col("n_tokens") > 0)


# GPT-2-style pre-tokenizer regex (simplified to the portable subset of
# Java regex ∩ RE2): contractions, space-prefixed letter/digit runs,
# punctuation runs. The "BPE-ish" token count — the unit LLM training
# budgets are measured in, vs whitespace words.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+"
_BPE_SQL = BPE_PATTERN.replace("'", "''")  # quote-doubled for the SQL literal


@register(
    "bpe_token_counts",
    oracle=rf"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_BPE_SQL}'))      AS n_bpe_tokens,
           len(list_filter(string_split_regex(lower(text), '\s+'),
                           w -> w <> ''))                          AS n_ws_tokens,
           round(len(regexp_extract_all(lower(text), '{_BPE_SQL}')) * 1.0
                 / greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
                                            w -> w <> '')), 1), 6) AS fertility
    FROM documents
    """,
    doc="BPE-ish token counting: GPT-2-style pre-tokenizer regex vs "
    "whitespace words, with tokens-per-word fertility — narrow per-row "
    "expressions, no shuffle",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = docs.select("doc_id", F.lower("text").alias("lt"))
    counted = lowered.select(
        "doc_id",
        F.size(F.regexp_extract_all("lt", F.lit(BPE_PATTERN), F.lit(0))).alias("n_bpe_tokens"),
        F.size(F.filter(F.split("lt", r"\s+"), lambda w: w != "")).alias("n_ws_tokens"),
    )
    return counted.select(
        "doc_id",
        "n_bpe_tokens",
        "n_ws_tokens",
        F.round(
            F.col("n_bpe_tokens") / F.greatest(F.col("n_ws_tokens"), F.lit(1)), 6
        ).alias("fertility"),
    )


# --------------------------------------------------------- quality scores


@register(
    "quality_scores",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    t AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN word IN ({stopwords_sql_list()}) THEN 1 ELSE 0 END) AS n_stop
        FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           length(d.text)                                                  AS n_chars,
           t.n_tokens,
           round(t.n_stop * 1.0 / t.n_tokens, 6)                           AS stopword_ratio,
           round(length(regexp_replace(lower(d.text), '[a-z0-9 ]', '', 'g')) * 1.0
                 / length(d.text), 6)                                      AS punct_ratio,
           round(least(t.n_tokens, 100) / 100.0 * (1 - t.n_stop * 1.0 / t.n_tokens), 6) AS quality_score
    FROM documents d JOIN t USING (doc_id)
    """,
    doc="Quality scoring: length / stopword ratio / punctuation ratio / "
    "composite score — the cheap pre-filter of a training-data pipeline",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    stop_ratio = n_stop / n_tokens.cast("double")
    punct = F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct / F.length("text").cast("double"), 6).alias("punct_ratio"),
        F.round(F.least(n_tokens, F.lit(100)) / F.lit(100.0) * (1 - stop_ratio), 6).alias(
            "quality_score"
        ),
    )


# ------------------------------------------------------- language ID

# Deterministic per-language marker tokens (heuristic n-gram-style lang-ID;
# the corpus vocabulary is shared across langs, so discrimination is weak —
# the operator contract is determinism, ties break alphabetically).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "das", "data", "group"],
    "en": ["the", "a", "and", "fast", "query"],
    "es": ["el", "la", "los", "part", "row"],
    "fr": ["le", "la", "les", "table", "merge"],
    "zh": ["zh", "hash", "vector", "stream"],
}
_LANGS = sorted(LANG_MARKERS)


def _score_col(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda w: F.array_contains(markers, w)))


def _score_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"sum(CASE WHEN word IN ({lst}) THEN 1 ELSE 0 END)"


@register(
    "lang_id_scores",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    s AS (
        SELECT doc_id,
               {", ".join(f"{_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
        FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           d.lang,
           CASE {" ".join(f"WHEN s_{lang} = greatest({', '.join('s_' + x for x in _LANGS)}) THEN '{lang}'" for lang in _LANGS)} END AS predicted_lang,
           CAST(greatest({", ".join("s_" + x for x in _LANGS)}) AS BIGINT) AS marker_hits
    FROM documents d JOIN s USING (doc_id)
    """,
    doc="Language-ID heuristic: marker-token scoring per language, argmax "
    "with alphabetical tie-break",
)
def lang_id_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        "doc_id", "lang", *[_score_col(toks, lang).alias(f"s_{lang}") for lang in _LANGS]
    )
    g = F.greatest(*[F.col(f"s_{lang}") for lang in _LANGS])
    expr = None
    for lang in _LANGS:
        cond = F.col(f"s_{lang}") == g
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return scored.select(
        "doc_id",
        "lang",
        expr.alias("predicted_lang"),
        g.cast("long").alias("marker_hits"),
    )


# ------------------------------------------------- rolling-hash fingerprint

_FP_MOD = 1_000_000_007
_FP_BASE = 31
_FP_WINDOW = 16
# 31^k mod p weights, k = 0..15 (precomputed so no pow() dialect drift)
_WEIGHTS = []
_w = 1
for _ in range(_FP_WINDOW):
    _WEIGHTS.append(_w)
    _w = (_w * _FP_BASE) % _FP_MOD

_HEX = "0123456789abcdef"


def _tok_hash_sql(word: str = "word") -> str:
    """Token hash 0..255 from the first two md5 nibbles (dialect-shared)."""
    return (
        f"((instr('{_HEX}', substr(md5({word}), 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr(md5({word}), 2, 1)) - 1))"
    )


_WEIGHT_CASE = "CASE " + " ".join(
    f"WHEN (rn - 1) % {_FP_WINDOW} = {k} THEN {w}" for k, w in enumerate(_WEIGHTS)
) + " END"


@register(
    "doc_fingerprints",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    seq AS (
        SELECT doc_id, word,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM tok
    )
    SELECT doc_id,
           count(*)                                                   AS n_tokens,
           CAST(sum(CAST({_tok_hash_sql()} AS BIGINT) * {_WEIGHT_CASE}) % {_FP_MOD} AS BIGINT) AS fingerprint
    FROM seq GROUP BY doc_id
    """,
    doc="Rolling-hash document fingerprint (Rabin–Karp-style position-"
    "weighted token hash mod p) — order-sensitive, integer-exact in both "
    "engines",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seq = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("rn"), "word")
    contrib = F.expr(f"CAST({_tok_hash_sql('word')} AS BIGINT) * {_WEIGHT_CASE}")
    return seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum(contrib) % _FP_MOD).alias("fingerprint"),
    )


@register(
    "repetition_stats",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    bg AS (
        SELECT doc_id, word || ' ' || lead(word, 1) OVER w AS g
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(word, 1) OVER w IS NOT NULL
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS max_bigram_count
        FROM bgc GROUP BY doc_id
    ),
    tstats AS (
        SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
        FROM tok GROUP BY doc_id
    )
    SELECT a.doc_id,
           a.n_bigrams,
           a.max_bigram_count,
           round(a.max_bigram_count * 1.0 / a.n_bigrams, 6)  AS top_bigram_ratio,
           round(t.n_distinct * 1.0 / t.n_tokens, 6)         AS distinct_token_ratio,
           CAST(a.max_bigram_count * 1.0 / a.n_bigrams > 0.05
                OR t.n_distinct * 1.0 / t.n_tokens < 0.3 AS INT) AS is_repetitive
    FROM agg a JOIN tstats t USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Repetition-based quality filter (C4/Gopher-style): top-bigram "
    "frequency ratio and distinct-token ratio per document, flagging "
    "degenerate repetitive text. One doc_id-keyed shuffle for the bigram "
    "histogram; token stats come from the array expression, shuffle-free",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The per-doc bigram histogram COULD be computed array-side with zero
    # shuffle (the group key doc_id is row-local), but the needed
    # array_sort + run-length aggregate are CodegenFallback higher-order
    # functions — measured 9× slower in wall than the exchange shape at
    # 10× data. The exchange shape's records are linear in the corpus
    # (first exchange = distinct (doc, bigram) pairs; second ≤ first,
    # one row per doc × occupied partition — a partition-width constant
    # the 10×/30× rehearsal decomposed, not asymptotic growth), so the
    # shuffles are kept and the JVM-codegen explode path stays hot.
    # Improvement over the original shape: n_tokens / n_distinct are
    # row-local array stats carried through the grouping keys as
    # invariants, which deletes the separate tstats aggregate, its
    # exchange, and the doc_id join the old plan paid for them.
    docs = load_table(spark, sf_dir, "documents")
    tokdf = docs.select("doc_id", tokens("text").alias("toks"))
    bg = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = tokdf.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        bg.alias("bg"),
    )
    bgen, bkeep = explode_clean(F.col("bg"), "g")
    per_doc = (
        base.select("doc_id", "n_tokens", "n_distinct", bgen)
        .filter(bkeep)
        .groupBy("doc_id", "n_tokens", "n_distinct", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("max_bigram_count"))
    )
    top_ratio = F.col("max_bigram_count") / F.col("n_bigrams")
    dist_ratio = F.col("n_distinct") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "max_bigram_count",
        F.round(top_ratio, 6).alias("top_bigram_ratio"),
        F.round(dist_ratio, 6).alias("distinct_token_ratio"),
        ((top_ratio > 0.05) | (dist_ratio < 0.3)).cast("int").alias("is_repetitive"),
        # no orderBy: per-doc output scales with the corpus; don't global-sort it
    )


@register(
    "stratified_sample_counts",
    oracle="""
    WITH tagged AS (
        SELECT lang,
               CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket,
               CASE WHEN lang = 'en' THEN 10 ELSE 50 END               AS rate_pct
        FROM documents
    )
    SELECT lang,
           any_value(rate_pct)                                   AS rate_pct,
           count(*)                                              AS n_total,
           CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM tagged
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Stratified deterministic sampling: per-stratum rates (downsample "
    "dominant 'en' to 10%, keep 50% of the rest) decided by content-hash "
    "bucket, not rand() — reproducible across engines, reruns and cluster "
    "sizes, and duplicate texts sample identically by construction",
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(50))
    tagged = docs.select("lang", bucket.alias("bucket"), rate.alias("rate_pct"))
    return (
        tagged.groupBy("lang")
        .agg(
            F.first("rate_pct").alias("rate_pct"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("bucket") < F.col("rate_pct"), 1).otherwise(0)).alias(
                "n_sampled"
            ),
        )
        .orderBy("lang")
    )


@register(
    "hash_split_assignment",
    oracle="""
    WITH assigned AS (
        SELECT lang,
               CASE
                   WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                   WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="Deterministic hash-split assignment (80/10/10 train/val/test): "
    "content-hash modulo, not rand() — the only sampling that is stable "
    "across reruns, engines and cluster sizes, and that keeps exact "
    "duplicates in the same split by construction",
)
def hash_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    assigned = docs.select(
        "lang",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return (
        assigned.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# -------------------------------------------------------- sequence packing

PACK_BUDGET = 512   # tokens per packed training sequence
PACK_SHARDS = 16    # parallel packing lanes per source


@register(
    "sequence_packing",
    oracle=rf"""
    WITH counted AS (
        SELECT doc_id, source,
               doc_id % {PACK_SHARDS} AS shard,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               w -> w <> '')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, shard, n_tokens,
               CAST(floor((sum(n_tokens) OVER w - n_tokens) * 1.0
                          / {PACK_BUDGET}) AS BIGINT) AS bin
        FROM counted
        WINDOW w AS (PARTITION BY source, shard ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT source, shard, bin,
           count(*)                                      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)                 AS n_tokens,
           round(sum(n_tokens) * 1.0 / {PACK_BUDGET}, 6) AS fill
    FROM packed
    GROUP BY source, shard, bin
    ORDER BY source, shard, bin
    """,
    doc="Sequence packing for training: docs are concatenated in "
    "deterministic order and cut into fixed token-budget bins via a "
    "prefix-sum window (bin = floor(tokens_before / budget); a doc "
    "spanning a boundary counts toward its starting bin, so fill can "
    "exceed 1). Packing runs in independent (source, shard) lanes — the "
    "ordered prefix sum never becomes a global sort, and at 100 TB you "
    "raise PACK_SHARDS to match the cluster, keeping every lane's window "
    "partition-local",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = counted.select(
        "source",
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .alias("bin"),
    )
    return (
        packed.groupBy("source", "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.lit(PACK_BUDGET), 6).alias("fill"),
        )
        .orderBy("source", "shard", "bin")
    )


# ------------------------------------------------------- mixture weights


@register(
    "mixture_weights",
    oracle=r"""
    WITH tok AS (
        SELECT source,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               w -> w <> '')) AS n_tokens
        FROM documents
    ),
    agg AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS t, count(*) AS k FROM agg)
    SELECT source,
           n_tokens,
           round(n_tokens * 1.0 / t, 6)                 AS actual_share,
           round(1.0 / k, 6)                            AS target_share,
           round((1.0 / k) / (n_tokens * 1.0 / t), 6)   AS weight
    FROM agg CROSS JOIN tot
    ORDER BY source
    """,
    doc="Domain-mixture reweighting: per-source token share vs a uniform "
    "target mixture, and the sampling weight (target/actual) that achieves "
    "it — the knob a training run turns to up/down-sample domains. One "
    "narrow token count + a |sources|-row aggregate; the grand total joins "
    "back via broadcast",
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        docs.select("source", F.size(tokens("text")).alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("n_tokens"))
    )
    tot = agg.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("k")
    )
    actual = F.col("n_tokens") / F.col("t")
    target = F.lit(1.0) / F.col("k")
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(actual, 6).alias("actual_share"),
            F.round(target, 6).alias("target_share"),
            F.round(target / actual, 6).alias("weight"),
        )
        .orderBy("source")
    )


@register(
    "per_source_top_docs",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    t AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN word IN ({stopwords_sql_list()}) THEN 1 ELSE 0 END) AS n_stop
        FROM tok GROUP BY doc_id
    ),
    q AS (
        SELECT d.source, d.doc_id,
               round(least(t.n_tokens, 100) / 100.0
                     * (1 - t.n_stop * 1.0 / t.n_tokens), 6) AS quality_score
        FROM documents d JOIN t USING (doc_id)
    )
    SELECT source, doc_id, quality_score, rk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY quality_score DESC, doc_id
        ) AS rk
        FROM q
    )
    WHERE rk <= 3
    ORDER BY source, rk
    """,
    doc="Top-N-per-group curation selection: the 3 highest-quality docs "
    "per corpus source (composite quality score, deterministic doc_id "
    "tie-break). The pattern a pipeline uses to pick exemplar documents "
    "per domain. Plan shape: the rank is a source-partitioned window — "
    "one shuffle on the grouping key, rows beyond N dropped before any "
    "global ordering; never a global sort of the corpus.",
)
def per_source_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.col("doc_id")
    )
    return (
        docs.join(q, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "quality_score", "rk")
        .orderBy("source", "rk")
    )


@register(
    "bigram_pmi_topk",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    big AS (
        SELECT word AS w1,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok
    ),
    bigc AS (
        SELECT w1, w2, count(*) AS pair_count
        FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    uni AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
    tot AS (
        SELECT CAST(sum(pair_count) AS DOUBLE) AS n_big FROM bigc
    ),
    totu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_uni FROM uni)
    SELECT w1, w2, pair_count,
           round(ln((CAST(pair_count AS DOUBLE) / n_big)
                    / ((CAST(u1.c AS DOUBLE) / n_uni)
                       * (CAST(u2.c AS DOUBLE) / n_uni))), 6) AS pmi
    FROM bigc b
    JOIN uni u1 ON u1.word = b.w1
    JOIN uni u2 ON u2.word = b.w2, tot, totu
    WHERE pair_count >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    doc="Collocation mining: top-20 token bigrams by pointwise mutual "
    "information (min support 5) — the classic phrase-detection pass a "
    "tokenizer-training pipeline runs before BPE merges (cf. word2vec "
    "phrase2vec). Plan shape: bigrams form per-document via lead() over "
    "the doc partition (one shuffle on doc_id, no self-join on position); "
    "the support filter prunes the pair table BEFORE the unigram joins; "
    "corpus totals attach as broadcast scalars; the final top-k is "
    "TakeOrderedAndProject on the rounded PMI, never a global sort. "
    "The PMI expression divides in the same order in both engines so the "
    "rounded values hash-match.",
)
def bigram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.select(
        F.col("word").alias("w1"), F.lead("word").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull())
    bigc = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= 5)
    )
    uni = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    n_big = big.agg(F.sum(F.lit(1)).cast("double").alias("n_big"))
    n_uni = tok.agg(F.sum(F.lit(1)).cast("double").alias("n_uni"))
    pmi = F.round(
        F.log(
            (F.col("pair_count").cast("double") / F.col("n_big"))
            / (
                (F.col("c1").cast("double") / F.col("n_uni"))
                * (F.col("c2").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        bigc.join(uni.withColumnRenamed("word", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("word", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(n_big))
        .crossJoin(F.broadcast(n_uni))
        .select("w1", "w2", "pair_count", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@register(
    "bpe_merge_pair_counts",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_TOK_POS_SQL}) WHERE word <> ''),
    words AS (SELECT word, count(*) AS freq FROM tok GROUP BY word),
    pos AS (
        SELECT word, freq,
               unnest(generate_series(1, length(word) - 1)) AS i
        FROM words WHERE length(word) >= 2
    )
    SELECT substr(word, i, 2) AS pair,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pos
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    doc="The inner loop of BPE tokenizer training, iteration one: count "
    "adjacent character pairs across all word OCCURRENCES and rank the "
    "top-20 merge candidates. Plan shape is the one that matters at "
    "100 TB: occurrences aggregate to (word, freq) FIRST (distinct "
    "words, not raw tokens, enter the pair explode), pair positions "
    "explode per distinct word only, and counts are freq-weighted sums "
    "— partial-aggregable, so a full corpus BPE pass is two map-side-"
    "combining shuffles regardless of corpus size.",
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wgen, wkeep = explode_clean(tokens("text"), "word")
    words = (
        docs.select(wgen).filter(wkeep)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("word") >= 2)
    )
    pos = words.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    )
    return (
        pos.select(F.expr("substr(word, i, 2)").alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


@register(
    "stratified_quota_sample",
    oracle="""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    quota AS (
        SELECT lang, n, CASE WHEN lang = 'en' THEN 40 ELSE 20 END AS q
        FROM counts
    ),
    pre AS (
        SELECT d.lang, d.doc_id, md5(d.text) AS h, q.q
        FROM documents d JOIN quota q USING (lang)
        WHERE CAST(('0x' || substr(md5(d.text), 1, 8)) AS BIGINT) % 100
              < least(100, CAST(ceil(300.0 * q.q / q.n) AS BIGINT))
    ),
    ranked AS (
        SELECT lang, doc_id, q,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS sample_rank
        FROM pre
    )
    SELECT lang, doc_id, sample_rank
    FROM ranked WHERE sample_rank <= q
    ORDER BY lang, sample_rank
    """,
    doc="Stratified QUOTA sampling (q docs per stratum, en=40 / others=20) "
    "via the scalable two-phase pattern: a cheap deterministic hash-bucket "
    "prefilter keeps ~3q candidates per stratum (map-side, driven by a "
    "broadcast of per-stratum counts), and only those survivors enter the "
    "per-stratum rank window — so the window shuffle carries ~3q rows per "
    "stratum instead of the whole corpus, which is what makes quota "
    "sampling affordable at 100 TB (never rank the full stratum; eval-set "
    "construction is the typical consumer). Hash-order ranking makes the "
    "sample reproducible across engines and reruns. Caveat: the ~3q "
    "prefilter is probabilistic — md5 buckets are near-uniform, so at 3x "
    "oversampling a stratum with n >= 3q falls short of q survivors only "
    "with negligible probability, but a SKEWED hash or a stratum with "
    "n < 3q/oversample can deliver fewer than q rows; the sample is then "
    "every survivor (ranks stay dense, quota under-filled, engine and "
    "oracle agree). Raise the 300 oversample factor or pre-count survivors "
    "if hard quotas are required.",
)
def stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    quota = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "q", F.when(F.col("lang") == "en", F.lit(40)).otherwise(F.lit(20))
        )
    )
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    thresh = F.least(
        F.lit(100), F.ceil(F.lit(300.0) * F.col("q") / F.col("n"))
    )
    pre = (
        docs.join(F.broadcast(quota), "lang")
        .filter(bucket < thresh)
        .select("lang", "doc_id", F.md5("text").alias("h"), "q")
    )
    w = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        pre.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("q"))
        .select("lang", "doc_id", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@register(
    "gopher_quality_flags",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           w -> w <> '') AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_words,
               round(list_sum(list_transform(toks, w -> length(w))) * 1.0
                     / len(toks), 6)                                  AS mean_word_len,
               round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0
                     / len(toks), 6)                                  AS alpha_word_frac,
               len(list_intersect(toks,
                   ['the','be','to','of','and','that','have','with'])) AS stopword_hits
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stopword_hits,
           (n_words < 50)                                   AS too_few_words,
           (n_words > 100000)                               AS too_many_words,
           (mean_word_len < 3 OR mean_word_len > 10)        AS bad_mean_word_len,
           (alpha_word_frac < 0.8)                          AS low_alpha_frac,
           (stopword_hits < 2)                              AS low_stopword_hits,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3 AND mean_word_len <= 10
            AND alpha_word_frac >= 0.8 AND stopword_hits >= 2) AS keep
    FROM m
    """,
    doc="Gopher quality rules (Rae et al. 2021, §A1.1): word-count bounds "
    "[50, 100k], mean word length [3, 10], >=80% words containing an "
    "alphabetic character, >=2 distinct required stopwords — each rule a "
    "boolean flag plus the composite keep decision. Pure per-row "
    "expression pipeline: zero shuffle at any corpus size, the published "
    "rule set a 100 TB pre-filter actually runs before any dedup pass.",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in
                     ("the", "be", "to", "of", "and", "that", "have", "with")])
    t = docs.select("doc_id", tokens("text").alias("toks"))
    m = t.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.round(
            F.aggregate(
                F.transform("toks", lambda w: F.length(w)),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            * 1.0
            / F.size("toks"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("toks", lambda w: w.rlike("[a-z]"))) * 1.0
            / F.size("toks"),
            6,
        ).alias("alpha_word_frac"),
        F.size(F.array_intersect(F.array_distinct("toks"), stop)).alias(
            "stopword_hits"
        ),
    )
    in_bounds = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
        & (F.col("alpha_word_frac") >= 0.8) & (F.col("stopword_hits") >= 2)
    )
    return m.select(
        "doc_id", "n_words", "mean_word_len", "alpha_word_frac", "stopword_hits",
        (F.col("n_words") < 50).alias("too_few_words"),
        (F.col("n_words") > 100000).alias("too_many_words"),
        ((F.col("mean_word_len") < 3) | (F.col("mean_word_len") > 10)).alias(
            "bad_mean_word_len"
        ),
        (F.col("alpha_word_frac") < 0.8).alias("low_alpha_frac"),
        (F.col("stopword_hits") < 2).alias("low_stopword_hits"),
        in_bounds.alias("keep"),
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=rf"""
    WITH t AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '{_BPE_SQL}'))   AS n_bpe,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               w -> w <> ''))                       AS n_words,
               length(text)                                         AS n_chars
        FROM documents
    )
    SELECT lang,
           count(*)                                        AS n_docs,
           CAST(sum(n_bpe) AS BIGINT)                      AS total_bpe_tokens,
           round(sum(n_bpe) * 1.0 / sum(n_words), 6)       AS fertility,
           round(sum(n_chars) * 1.0 / sum(n_bpe), 6)       AS chars_per_token
    FROM t GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility audit by language: corpus-level BPE-ish "
    "tokens per whitespace word and chars per token — the per-language "
    "cost profile that drives tokenizer/vocab decisions for a training "
    "mix. Pure map stage + one tiny groupBy on lang; integer sums make "
    "the ratios exact across engines before the final rounding.",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = docs.select("lang", F.lower("text").alias("lt"), F.length("text").alias("n_chars"))
    per_doc = lowered.select(
        "lang",
        "n_chars",
        F.size(F.regexp_extract_all("lt", F.lit(BPE_PATTERN), F.lit(0))).alias("n_bpe"),
        F.size(F.filter(F.split("lt", r"\s+"), lambda w: w != "")).alias("n_words"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.sum("n_bpe") / F.sum("n_words"), 6).alias("fertility"),
            F.round(F.sum("n_chars") / F.sum("n_bpe"), 6).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


@register(
    "length_band_filter",
    oracle="""
    WITH b AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS p5,
               quantile_cont(n_chars, 0.95) AS p95
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN d.n_chars >= b.p5 AND d.n_chars <= b.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(any_value(b.p5), 4)  AS p5,
           round(any_value(b.p95), 4) AS p95
    FROM documents d JOIN b USING (lang)
    GROUP BY d.lang ORDER BY d.lang
    """,
    doc="Length-band outlier filter (corpus curation): per-language "
    "p5/p95 interpolated percentiles of doc length, docs outside the "
    "band dropped. The percentile side is a per-lang aggregate over "
    "integer lengths (tiny — one row per language, broadcast back); the "
    "corpus side never shuffles. Linear-interpolation percentile over "
    "integers is the same closed form in Spark (percentile) and DuckDB "
    "(quantile_cont), so the band edges match bit-for-bit.",
)
def length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    bands = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p5"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    return (
        docs.join(F.broadcast(bands), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(
                    (F.col("n_chars") >= F.col("p5")) & (F.col("n_chars") <= F.col("p95")),
                    1,
                ).otherwise(0)
            ).alias("n_kept"),
            F.round(F.first("p5"), 4).alias("p5"),
            F.round(F.first("p95"), 4).alias("p95"),
        )
        .orderBy("lang")
    )


# ------------------------------------------- vocabulary coverage curve

COVERAGE_THRESHOLDS = (0.5, 0.9, 0.99)
_COVERAGE_PARTS = 32  # range partitions for the distributed ordered cumsum


_COVERAGE_THR_VALUES = ", ".join(f"({t})" for t in COVERAGE_THRESHOLDS)


@register(
    "vocab_coverage_thresholds",
    oracle=rf"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> w <> '')) AS word
        FROM documents
    ),
    freq AS (SELECT word, count(*) AS freq FROM tok GROUP BY word),
    ord AS (
        SELECT word, freq,
               sum(freq)     OVER (ORDER BY freq DESC, word) AS cum,
               row_number()  OVER (ORDER BY freq DESC, word) AS rk
        FROM freq
    ),
    tot AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM freq),
    thr(threshold) AS (VALUES {_COVERAGE_THR_VALUES})
    SELECT thr.threshold,
           o.rk                              AS n_words,
           o.freq                            AS boundary_freq,
           round(o.cum * 1.0 / tot.t, 6)     AS coverage
    FROM thr CROSS JOIN tot
    JOIN ord o
      ON o.cum >= thr.threshold * tot.t
     AND (o.cum - o.freq) < thr.threshold * tot.t
    ORDER BY thr.threshold
    """,
    doc="Vocabulary coverage curve read at 50/90/99%: how many distinct "
    "words (ranked by frequency) cover each share of all token "
    "occurrences — the corpus statistic that sizes tokenizer "
    "vocabularies and stopword lists. The ordered cumulative sum is "
    "DISTRIBUTED: vocab is range-partitioned on the global sort key "
    "(freq DESC, word), each partition computes a local prefix sum "
    "under a per-partition window, and the P per-partition totals "
    "(P rows) are offset via a broadcast join — no single-reducer "
    "global window even at a 100M-word web vocabulary. The crossing "
    "row per threshold is found by the interval test "
    "cum_prev < t*T <= cum, so no further ordered pass is needed.",
)
def vocab_coverage_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # pass 1: range-partition by the global order and tag rows with their
    # partition id; each partition's local prefix sum is a KEYED window
    ranked = (
        freq.repartitionByRange(_COVERAGE_PARTS, F.desc("freq"), F.col("word"))
        .withColumn("pid", F.spark_partition_id())
    )
    wloc = (
        Window.partitionBy("pid")
        .orderBy(F.desc("freq"), "word")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # persist: offsets and the final join BOTH read `local`; a recompute
    # could in principle re-sample range boundaries and hand the two
    # consumers different pid assignments. One materialization (vocab-
    # sized, tiny next to the corpus) pins a single partitioning.
    from reddit_sentiment_spark_streaming_pipeline_spark.caching import track

    local = track(
        ranked.select(
            "word", "freq", "pid",
            F.sum("freq").over(wloc).alias("lcum"),
            F.row_number().over(wloc).alias("lrk"),
        ).persist()
    )
    # pass 2: P-row per-partition totals, offsets via tiny ordered window,
    # broadcast back (pid ranges are ordered by construction of the range
    # partitioner: lower pid == globally earlier sort range)
    wpid = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        local.groupBy("pid")
        .agg(F.sum("freq").alias("psum"), F.count(F.lit(1)).alias("pcnt"))
        .select(
            "pid",
            (F.sum("psum").over(wpid) - F.col("psum")).alias("cum_off"),
            (F.sum("pcnt").over(wpid) - F.col("pcnt")).alias("rk_off"),
        )
    )
    cum = local.join(F.broadcast(offsets), "pid").select(
        "word", "freq",
        (F.col("lcum") + F.col("cum_off")).alias("cum"),
        (F.col("lrk") + F.col("rk_off")).alias("rk"),
    )
    # grand total from the PERSISTED vocab frame — aggregating `freq`
    # here would re-run the corpus tokenize+explode+shuffle (the query's
    # dominant stage) a second time just for one scalar
    total = local.agg(F.sum("freq").cast("long").alias("t"))
    thr = spark.createDataFrame(
        [(t,) for t in COVERAGE_THRESHOLDS], "threshold double"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(thr))
        .filter(
            (F.col("cum") >= F.col("threshold") * F.col("t"))
            & ((F.col("cum") - F.col("freq")) < F.col("threshold") * F.col("t"))
        )
        .select(
            "threshold",
            F.col("rk").alias("n_words"),
            F.col("freq").alias("boundary_freq"),
            F.round(F.col("cum") / F.col("t"), 6).alias("coverage"),
        )
        .orderBy("threshold")
    )
