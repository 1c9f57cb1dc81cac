"""The end-to-end corpus curation pipeline as ONE composed Spark plan.

Every stage exists as a standalone audited operator (quality_scores,
exact_dup_groups, pii_redaction, hash_split_assignment); this module
chains them the way a production snapshot build actually runs them —
filter -> dedup -> redact -> split -> publish stats — in a single
DataFrame expression, proving the operators COMPOSE without
materialization barriers between stages.

Plan shape at 100 TB: stages 1-2 and 4-5 are narrow per-row expressions
(no shuffle); stage 3's exact dedup is the pipeline's one wide
dependency — a window over md5(text), i.e. a shuffle of 16-byte-keyed
rows; the final publish is a tiny (split x source) aggregate. One wide
stage for the whole snapshot build is the floor: dedup is inherently
global, everything else stays map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import (
    STOPWORDS,
    explode_clean,
    stopwords_sql_list,
    tokens,
)
from reddit_sentiment_spark_streaming_pipeline_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

QUALITY_FLOOR = 0.35


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH pii AS (
        SELECT doc_id, lang, source,
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
    ),
    corpus AS (
        SELECT * FROM pii
        UNION ALL
        SELECT doc_id + 1000000, lang, source, text FROM pii WHERE doc_id % 10 = 0
    ),
    scored AS (
        SELECT *,
               len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_tokens,
               len(list_filter(string_split_regex(text, '\\s+'),
                               w -> w IN ({stopwords_sql_list()})))             AS n_stop
        FROM corpus
    ),
    kept AS (
        SELECT * FROM scored
        WHERE n_tokens > 0
          AND round(least(n_tokens, 100) / 100.0
                    * (1 - n_stop * 1.0 / n_tokens), 6) >= {QUALITY_FLOOR}
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(text) ORDER BY doc_id
            ) AS rn
            FROM kept
        ) WHERE rn = 1
    ),
    redacted AS (
        SELECT *,
               len(regexp_extract_all(text, '{EMAIL_RE}'))
               + len(regexp_extract_all(text, '{PHONE_RE}'))
               + len(regexp_extract_all(text, '{IPV4_RE}'))      AS n_pii,
               CASE
                   WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                   WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM deduped
    )
    SELECT split, source,
           count(*)                                   AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)              AS total_tokens,
           CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
           round(avg(round(least(n_tokens, 100) / 100.0
                           * (1 - n_stop * 1.0 / n_tokens), 6)), 6)   AS avg_quality
    FROM redacted
    GROUP BY split, source
    ORDER BY split, source
    """,
    doc="The whole snapshot build in one plan: PII-bearing corpus (plus "
    "exact-duplicate replicas) -> quality gate -> content-hash exact "
    "dedup (keep-lowest-id window over md5) -> PII accounting -> "
    "deterministic 80/10/10 content-hash split -> per-(split, source) "
    "publish stats. One wide stage total (the dedup window on a 16-byte "
    "key); every other stage is a narrow expression, so the composed "
    "pipeline costs the same as its most expensive member, not the sum "
    "of materialized stages.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    pii = docs.select(
        "doc_id", "lang", "source",
        F.concat(F.lower("text"), email, phone, ip).alias("text"),
    )
    corpus = pii.unionByName(
        pii.filter(did % 10 == 0).select(
            (did + 1000000).alias("doc_id"), "lang", "source", "text"
        )
    )

    toks = tokens("text")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    scored = corpus.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop, w))).alias("n_stop"),
    )
    quality = F.round(
        F.least(F.col("n_tokens"), F.lit(100)) / F.lit(100.0)
        * (1 - F.col("n_stop") / F.col("n_tokens").cast("double")),
        6,
    )
    kept = scored.filter((F.col("n_tokens") > 0) & (quality >= QUALITY_FLOOR))

    deduped = (
        kept.withColumn(
            "rn", F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )

    n_pii = (
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0)))
        + F.size(F.regexp_extract_all("text", F.lit(IPV4_RE), F.lit(0)))
    )
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    redacted = deduped.select(
        "*", n_pii.alias("n_pii"), split.alias("split")
    )
    return (
        redacted.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum((F.col("n_pii") > 0).cast("int")).cast("bigint").alias("n_pii_docs"),
            F.round(F.avg(quality), 6).alias("avg_quality"),
        )
        .orderBy("split", "source")
    )


# Shared snapshot fixture: the SAME construction backs the batch gate, the
# novelty audit, and the streaming gate's chunk writer
# (streaming/dedup.py::write_doc_chunks) — one definition, three consumers,
# so the streaming gate can never silently desynchronize from the batch
# operators it mirrors. Exact resubmits (doc_id+1M, same text) must be
# rejected; tailed novel docs (doc_id+2M) must be admitted.


def snapshot_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text"), "source"
    )


def snapshot_incoming(existing: DataFrame) -> DataFrame:
    resubmit = existing.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    novel = existing.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz fresh snapshot tail")).alias("text"),
        "source",
    )
    return resubmit.unionByName(novel)


@register(
    "incremental_dedup_gate",
    oracle="""
    WITH existing AS (SELECT doc_id, lower(text) AS text, source FROM documents),
    incoming AS (
        SELECT doc_id + 1000000 AS doc_id, text, source
        FROM existing WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz fresh snapshot tail', source
        FROM existing WHERE doc_id % 7 = 0
    ),
    fps AS (SELECT DISTINCT md5(text) AS fingerprint FROM existing),
    flagged AS (
        SELECT i.source, f.fingerprint AS hit
        FROM incoming i LEFT JOIN fps f ON md5(i.text) = f.fingerprint
    )
    SELECT source,
           count(*)                            AS n_incoming,
           count(*) - count(hit)               AS n_admitted,
           count(hit)                          AS n_rejected
    FROM flagged GROUP BY source ORDER BY source
    """,
    doc="Incremental snapshot dedup gate: a NEW crawl batch is admitted "
    "only if its exact fingerprint is absent from the existing corpus — "
    "the anti-join every recurring 100 TB snapshot build runs instead of "
    "re-deduplicating from scratch. Shape: the existing corpus collapses "
    "to DISTINCT 16-byte md5 fingerprints (map-side combining aggregate), "
    "the incoming batch left-joins on that key — only fingerprints ever "
    "shuffle, never document bodies; when the incoming batch is small the "
    "join inverts to a broadcast (or a broadcast Bloom filter of the "
    "existing fingerprint set, the classic one-sided gate). Fixture: "
    "resubmitted docs (doc_id%10, same text) must be rejected; tailed "
    "docs (doc_id%7, novel text) must be admitted.",
)
def incremental_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = snapshot_existing(spark, sf_dir)
    incoming = snapshot_incoming(docs)
    fps = (
        docs.select(F.md5("text").alias("fingerprint"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flagged = incoming.select("source", F.md5("text").alias("fingerprint")).join(
        fps, "fingerprint", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            (F.count(F.lit(1)) - F.count("hit")).alias("n_admitted"),
            F.count("hit").alias("n_rejected"),
        )
        .orderBy("source")
    )


# Deterministic pseudo-random arrival order for the arrival-order gate
# twin: a real crawl does NOT deliver documents in id order, and the
# production admission rule is first-SEEN-wins (keyed by batch, then
# within-batch order), not smallest-id-wins. md5 over the id gives both
# engines the identical shuffled order with no stored side table.
def arrival_seq_col(doc_id_col: str = "doc_id"):
    return F.md5(F.concat(F.lit("arr"), F.col(doc_id_col).cast("string")))


_ARRIVAL_SEQ_SQL = "md5('arr' || CAST(doc_id AS VARCHAR))"


@register(
    "arrival_order_exact_gate",
    oracle=f"""
    WITH existing AS (SELECT doc_id, lower(text) AS text FROM documents),
    corpus AS (
        SELECT doc_id, text FROM existing
        UNION ALL
        SELECT doc_id + 1000000, text FROM existing WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz fresh snapshot tail'
        FROM existing WHERE doc_id % 7 = 0
    ),
    arr AS (
        SELECT doc_id, {_ARRIVAL_SEQ_SQL} AS arrival_seq,
               md5(text) AS fingerprint
        FROM corpus
    )
    SELECT doc_id, arrival_seq,
           row_number() OVER (
               PARTITION BY fingerprint ORDER BY arrival_seq, doc_id) = 1
               AS admitted
    FROM arr ORDER BY doc_id
    """,
    doc="ARRIVAL-ORDER twin of the streaming exact dedup gate: admission "
    "under first-SEEN-wins — each doc carries a deterministic "
    "pseudo-random arrival_seq (md5 of its id: the order a crawl "
    "actually delivers is unrelated to id order), and a fingerprint "
    "family's survivor is its FIRST ARRIVAL, not its smallest id. This "
    "is the honest semantics spec for unordered ingestion: the id-order "
    "twins' batching-invariance premise replays chunks sorted by id, "
    "where keep-first-by-id and first-seen-wins coincide; here they "
    "deliberately diverge (about half the planted resubmit pairs arrive "
    "copy-before-original), and the streaming gate driven over "
    "arrival-shuffled chunks must land exactly this set "
    "(tests/test_streaming.py::test_exact_gate_arrival_order...). Shape: "
    "one row_number window over (fingerprint) ordered by arrival — the "
    "same fingerprint-narrow shuffle as the id-order rule.",
)
def arrival_order_exact_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = snapshot_existing(spark, sf_dir)
    corpus = existing.unionByName(snapshot_incoming(existing)).select(
        "doc_id", "text"
    )
    arr = corpus.select(
        "doc_id",
        arrival_seq_col().alias("arrival_seq"),
        F.md5("text").alias("fingerprint"),
    )
    w = W.partitionBy("fingerprint").orderBy("arrival_seq", "doc_id")
    return (
        arr.select(
            "doc_id",
            "arrival_seq",
            (F.row_number().over(w) == 1).alias("admitted"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_chunks",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           w -> w <> '') AS toks
        FROM documents
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0, CAST(ceil(greatest(len(toks) - 32, 0) * 1.0 / 24) AS BIGINT)
               )) AS chunk_idx
        FROM t
    )
    SELECT doc_id, chunk_idx,
           len(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
               AS n_chunk_tokens,
           md5(array_to_string(
               list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '))
               AS chunk_hash
    FROM idx
    """,
    doc="Overlapping token-window chunking (window 32, stride 24): the "
    "1-to-N document splitter feeding context-length-bound training and "
    "retrieval indexes. Entirely narrow — tokenize, sequence-generate "
    "chunk indexes, explode, slice — so at 100 TB it is a pure map stage "
    "with zero shuffle; the trailing chunk is clamped to the remaining "
    "tokens and every token lands in at least one chunk (8-token overlap "
    "preserves cross-chunk context). chunk_hash doubles as the key for "
    "downstream chunk-level dedup.",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    idx = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.ceil(F.greatest(F.size("toks") - 32, F.lit(0)) * F.lit(1.0) / 24),
            )
        ).alias("chunk_idx"),
    )
    chunk = F.slice("toks", F.col("chunk_idx").cast("int") * 24 + 1, 32)
    return idx.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "snapshot_ngram_novelty",
    oracle=r"""
    WITH existing AS (SELECT doc_id, lower(text) AS text, source FROM documents),
    incoming AS (
        SELECT doc_id + 1000000 AS doc_id, text, source
        FROM existing WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz fresh snapshot tail', source
        FROM existing WHERE doc_id % 7 = 0
    ),
    etok AS (
        SELECT doc_id,
               unnest(string_split_regex(text, '\s+'))                 AS word,
               generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        FROM existing
    ),
    esh AS (
        SELECT DISTINCT md5(shingle) AS h FROM (
            SELECT word || ' ' || lead(word, 1) OVER w || ' '
                        || lead(word, 2) OVER w AS shingle
            FROM (SELECT * FROM etok WHERE word <> '')
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            QUALIFY lead(word, 2) OVER w IS NOT NULL
        )
    ),
    itok AS (
        SELECT doc_id,
               unnest(string_split_regex(text, '\s+'))                 AS word,
               generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        FROM incoming
    ),
    ish AS (
        SELECT DISTINCT doc_id, md5(shingle) AS h FROM (
            SELECT doc_id,
                   word || ' ' || lead(word, 1) OVER w || ' '
                        || lead(word, 2) OVER w AS shingle
            FROM (SELECT * FROM itok WHERE word <> '')
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            QUALIFY lead(word, 2) OVER w IS NOT NULL
        )
    ),
    per_doc AS (
        SELECT i.doc_id,
               count(*)                 AS n_sh,
               count(*) - count(e.h)    AS n_novel
        FROM ish i LEFT JOIN esh e ON i.h = e.h
        GROUP BY i.doc_id
    )
    SELECT inc.source,
           count(*)                                        AS n_docs,
           round(avg(p.n_novel * 1.0 / p.n_sh), 6)         AS avg_novelty,
           count(*) FILTER (WHERE p.n_novel = 0)           AS n_fully_seen
    FROM per_doc p JOIN incoming inc ON p.doc_id = inc.doc_id
    GROUP BY inc.source ORDER BY inc.source
    """,
    doc="Cross-snapshot n-gram novelty: per incoming document, the "
    "fraction of its DISTINCT 3-gram shingles absent from the existing "
    "corpus's shingle set — the crawl-yield metric deciding whether a "
    "new snapshot is worth ingesting. Shares the dedup pipeline's "
    "shingle construction (operators/dedup.py::shingle_rows); only "
    "16-byte shingle hashes ever shuffle, the existing side collapses "
    "to DISTINCT hashes (map-side combining) before the join, and the "
    "per-doc then per-source rollups are partial-aggregable. "
    "Resubmitted docs score 0 novelty; tailed docs score the tail.",
)
def snapshot_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import shingle_rows

    docs = snapshot_existing(spark, sf_dir)
    incoming = snapshot_incoming(docs)
    esh = (
        shingle_rows(docs.select("doc_id", "text"))
        .select(F.md5("shingle").alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ish = (
        shingle_rows(incoming.select("doc_id", "text"))
        .select("doc_id", F.md5("shingle").alias("h"))
        .distinct()
    )
    per_doc = (
        ish.join(esh, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            (F.count(F.lit(1)) - F.count("hit")).alias("n_novel"),
        )
    )
    return (
        per_doc.join(incoming.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_novel") * 1.0 / F.col("n_sh")), 6).alias(
                "avg_novelty"
            ),
            F.count(F.when(F.col("n_novel") == 0, 1)).alias("n_fully_seen"),
        )
        .orderBy("source")
    )


# ------------------------------------------- segment-level boilerplate dedup

# Non-overlapping 4-word segments: the unit of CCNet-style repeated-content
# removal. Word-aligned fixed windows keep the oracle expressible and the
# Spark side a single transform; production systems use lines/paragraphs —
# same algebra, different splitter.
SEG_LEN = 4
BOILERPLATE_MIN_DOCS = 2

_SEGS_SQL = rf"""
        t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks
            FROM corpus
        ),
        segs AS (
            SELECT doc_id,
                   array_to_string(list_slice(toks, {SEG_LEN} * i + 1,
                                              {SEG_LEN} * i + {SEG_LEN}), ' ') AS seg
            FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(0, len(toks) // {SEG_LEN} - 1)) AS i
                FROM t WHERE len(toks) >= {SEG_LEN}
            )
        ),
        prev AS (
            SELECT md5(seg) AS seg_hash,
                   count(DISTINCT doc_id) AS n_docs,
                   count(*)               AS n_occurrences
            FROM segs GROUP BY md5(seg)
        )
"""


def _segment_rows(corpus) -> DataFrame:
    """(doc_id, seg) — non-overlapping SEG_LEN-word segments."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    t = corpus.select("doc_id", toks.alias("toks"))
    seg_expr = F.expr(
        f"""
        CASE WHEN size(toks) >= {SEG_LEN}
        THEN transform(sequence(0, size(toks) div {SEG_LEN} - 1),
                       i -> concat_ws(' ', slice(toks, i * {SEG_LEN} + 1, {SEG_LEN})))
        ELSE cast(array() AS array<string>) END
        """
    )
    gen, keep = explode_clean(seg_expr, "seg")
    return t.select("doc_id", gen).filter(keep)


@register(
    "segment_dedup_prevalence",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, lower(text) AS text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, lower(text) FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, lower(text) || ' zz extra tail'
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_SEGS_SQL}
    SELECT seg_hash, n_docs, n_occurrences
    FROM prev WHERE n_docs >= {BOILERPLATE_MIN_DOCS}
    ORDER BY seg_hash
    """,
    doc="CCNet-style repeated-segment prevalence: hash each 4-word "
    "segment, count distinct docs per hash, keep segments shared by >= 2 "
    "docs (boilerplate candidates). Shuffle carries only 16-byte segment "
    "hashes with map-side combine; document text never leaves its "
    "partition. The dedup fixture corpus (operators/dedup.py) supplies "
    "the planted duplicates that make prevalence deterministic.",
)
def segment_dedup_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import dedup_corpus

    seg = _segment_rows(dedup_corpus(spark, sf_dir))
    return (
        seg.groupBy(F.md5("seg").alias("seg_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .orderBy("seg_hash")
    )


@register(
    "boilerplate_segment_stats",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, lower(text) AS text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, lower(text) FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, lower(text) || ' zz extra tail'
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_SEGS_SQL},
    freq AS (SELECT seg_hash FROM prev WHERE n_docs >= {BOILERPLATE_MIN_DOCS}),
    m AS (
        SELECT s.doc_id,
               count(*) AS n_segments,
               CAST(sum(CASE WHEN f.seg_hash IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boilerplate
        FROM (SELECT doc_id, md5(seg) AS h FROM segs) s
        LEFT JOIN freq f ON f.seg_hash = s.h
        GROUP BY s.doc_id
    )
    SELECT doc_id, n_segments, n_boilerplate,
           round(n_boilerplate * 1.0 / n_segments, 6) AS boilerplate_ratio
    FROM m WHERE n_boilerplate >= 1
    ORDER BY doc_id
    """,
    doc="Per-document boilerplate accounting: join each doc's segment "
    "hashes against the shared-segment dictionary and report how much of "
    "the doc is repeated content — the strip/keep decision input of "
    "CCNet-style cleaning. The dictionary side is ONLY the segments "
    "shared across docs (boilerplate is rare by mass), so it broadcasts; "
    "the corpus side never shuffles for the join — one doc_id-keyed "
    "aggregate finishes the plan.",
)
def boilerplate_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import dedup_corpus

    seg = _segment_rows(dedup_corpus(spark, sf_dir)).select(
        "doc_id", F.md5("seg").alias("h")
    )
    freq = (
        seg.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .select("h", F.lit(1).alias("is_bp"))
    )
    return (
        seg.join(F.broadcast(freq), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).alias("n_boilerplate"),
        )
        .filter(F.col("n_boilerplate") >= 1)
        .select(
            "doc_id",
            "n_segments",
            "n_boilerplate",
            F.round(F.col("n_boilerplate") / F.col("n_segments"), 6)
            .alias("boilerplate_ratio"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------ declarative data-quality gate

@register(
    "dq_expectations",
    oracle="""
    WITH o AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS bad_status,
               sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                          OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00'
                        THEN 1 ELSE 0 END) AS bad_date
        FROM orders
    ),
    dup AS (
        SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS n_dups,
               CAST(coalesce(sum(cnt), 0) AS BIGINT)     AS n_rows
        FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
    ),
    li AS (
        SELECT count(*) AS n,
               sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS bad_disc,
               sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS bad_qty
        FROM lineitem
    ),
    fk AS (
        SELECT (SELECT count(*) FROM orders) AS n,
               count(*) AS orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    ),
    rules AS (
        SELECT 'orders.o_custkey_not_null' AS rule, n AS n_checked,
               CAST(null_cust AS BIGINT) AS n_violations FROM o
        UNION ALL
        SELECT 'orders.o_orderkey_unique', n_rows, n_dups FROM dup
        UNION ALL
        SELECT 'orders.o_orderstatus_in_set', n, CAST(bad_status AS BIGINT) FROM o
        UNION ALL
        SELECT 'orders.o_orderdate_in_range', n, CAST(bad_date AS BIGINT) FROM o
        UNION ALL
        SELECT 'orders.o_custkey_fk_customer', n, CAST(orphans AS BIGINT) FROM fk
        UNION ALL
        SELECT 'lineitem.l_discount_in_range', n, CAST(bad_disc AS BIGINT) FROM li
        UNION ALL
        SELECT 'lineitem.l_quantity_positive', n, CAST(bad_qty AS BIGINT) FROM li
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM rules ORDER BY rule
    """,
    doc="Declarative data-quality gate (the Deequ/Great-Expectations "
    "shape a production pipeline runs before publishing a snapshot): "
    "not-null, uniqueness, accepted-values, range, and referential-"
    "integrity expectations evaluated as ONE pass per table — all "
    "same-table rules fold into a single scan's conditional aggregates, "
    "uniqueness is a key-grouped count (map-side combined, never a "
    "distinct buffer), and the FK check is a null-producing left join "
    "counted on the probe side. Output is the publishable audit row "
    "per rule; a failing rule gates the snapshot.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def flag(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        flag(F.col("o_custkey").isNull()).alias("null_cust"),
        flag(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        flag(
            (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2005-01-01 00:00:00").cast("timestamp"))
        ).alias("bad_date"),
    )
    dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("n_dups"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_rows"),
        )
    )
    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        flag((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)).alias("bad_disc"),
        flag(F.col("l_quantity") <= 0).alias("bad_qty"),
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )

    def row(name, src, checked, viol):
        return src.select(
            F.lit(name).alias("rule"),
            F.col(checked).alias("n_checked"),
            F.col(viol).alias("n_violations"),
        )

    n_orders = o_agg.select("n").withColumnRenamed("n", "n_checked")
    rules = (
        row("orders.o_custkey_not_null", o_agg, "n", "null_cust")
        .unionByName(row("orders.o_orderkey_unique", dup, "n_rows", "n_dups"))
        .unionByName(row("orders.o_orderstatus_in_set", o_agg, "n", "bad_status"))
        .unionByName(row("orders.o_orderdate_in_range", o_agg, "n", "bad_date"))
        .unionByName(
            orphans.crossJoin(F.broadcast(n_orders)).select(
                F.lit("orders.o_custkey_fk_customer").alias("rule"),
                F.col("n_checked"),
                F.col("orphans").cast("long").alias("n_violations"),
            )
        )
        .unionByName(row("lineitem.l_discount_in_range", li_agg, "n", "bad_disc"))
        .unionByName(row("lineitem.l_quantity_positive", li_agg, "n", "bad_qty"))
    )
    return rules.select(
        "rule", "n_checked", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")
