"""Training-data SELECTION stages: DSIR-style importance weighting and
semantic eval-set decontamination.

Where the dedup/curation modules decide what to REMOVE, these two decide
what to KEEP (and what must not leak from the eval side):

- ``dsir_logratio_scores`` — Data Selection via Importance Resampling
  (Xie et al. 2023, public): score every corpus document by how
  target-domain-like its hashed n-gram distribution is.
- ``semantic_decontam_flags`` — the embedding-space sibling of the
  n-gram ``benchmark_contamination`` audit (operators/pii.py):
  paraphrased eval leakage that shares no 8-gram still sits next to the
  eval item in embedding space.

Both keep their model/benchmark side bounded (8192 hashed buckets / a
fixed-size eval suite), so the corpus-sized data never rides a join
key: decontamination is map-only over one corpus scan, and DSIR's only
corpus-proportional exchange is the per-doc aggregate of
fingerprint-narrow partial rows (the feature stream itself joins
broadcast, never shuffled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean, tokens
from reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity import as_double, dot, spread
from reddit_sentiment_spark_streaming_pipeline_spark.registry import oracle_of, register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# ------------------------------- DSIR-style importance-weight data selection

# The target is the DSIR_TARGET_LANG `lang` slice — 'en' by default,
# env-tunable via SPARK_GRAFT_DSIR_TARGET_LANG (in production: whichever
# slice plays the high-quality domain sample); features are word unigrams + bigrams
# hashed into a fixed bucket space; both bag-of-ngram models are
# Laplace-smoothed. Selection takes docs >= 1 sigma above the corpus
# mean score — a scale-free cut computed from one scalar aggregate (no
# global rank / single-partition window), compared on the 4-dp-rounded z
# in both engines per the value_zscore_outliers parity rule.
DSIR_BUCKETS = 8192     # hashed feature space (fixed => feature table is
                        # always broadcastable regardless of corpus size)
DSIR_ALPHA = 1.0        # Laplace pseudo-count per bucket
DSIR_SELECT_Z = 1.0     # select docs >= mu + 1 sigma
# single source of truth for the knob default: the rehearsal artifact
# stamper and the default-knob guard test both import THIS constant, so
# a changed default can never silently mislabel committed artifacts
DSIR_TARGET_LANG_DEFAULT = "en"


def _dsir_target_from_env() -> str:
    """Target-domain slice, env-tunable: SPARK_GRAFT_DSIR_TARGET_LANG
    selects which `lang` value plays the high-quality target sample
    (the COS_BAND_BITS pattern: engine expression, embedded oracle SQL,
    and the composed selection_pipeline oracle all regrow from this one
    constant at import, so the cross-engine contract holds at ANY
    setting — proven off-default in a subprocess oracle test). Validated
    because the value is spliced into oracle SQL as a literal."""
    import os
    import re as _re

    raw = os.environ.get("SPARK_GRAFT_DSIR_TARGET_LANG", DSIR_TARGET_LANG_DEFAULT)
    if not _re.fullmatch(r"[A-Za-z][A-Za-z0-9-]{1,15}", raw):
        raise ValueError(
            f"SPARK_GRAFT_DSIR_TARGET_LANG={raw!r} is not a plausible "
            "language tag (want a letter then 1-15 of [A-Za-z0-9-], "
            "BCP-47-shaped); it is spliced into the DuckDB oracle SQL "
            "as a string literal, so arbitrary values are refused"
        )
    return raw


DSIR_TARGET_LANG = _dsir_target_from_env()

def dsir_features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) hashed uni+bigram feature stream — the
    shared front end of the batch scorer, the frozen-model builder, and
    the streaming selection gate's per-batch scoring (one definition so
    the stream can never drift from the oracle-checked twin). Gram
    arrays build per-row inside codegen; token-less docs vanish at the
    explode filter."""
    t = tokens("text")
    toked = docs.select("doc_id", "lang", t.alias("toks"))
    tc = F.col("toks")
    bigrams = F.when(
        F.size(tc) >= 2,
        F.zip_with(
            F.slice(tc, 1, F.size(tc) - 1),
            F.slice(tc, 2, F.size(tc) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    buckets = F.transform(
        F.concat(tc, bigrams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 7), 16, 10).cast("long")
        % DSIR_BUCKETS,
    )
    gen, keep = explode_clean(buckets, "bucket")
    return toked.select("doc_id", "lang", gen).filter(keep)


_DSIR_TOK_SQL = r"""
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+'))                 AS word,
               generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
        FROM documents
"""


@register(
    "dsir_logratio_scores",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_DSIR_TOK_SQL}) WHERE word <> ''),
    grams AS (
        SELECT doc_id, word AS gram FROM tok
        UNION ALL
        SELECT doc_id,
               word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
        FROM tok
        QUALIFY lead(word) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    feat AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(gram), 1, 7) AS BIGINT) % {DSIR_BUCKETS} AS bucket
        FROM grams
    ),
    dl AS (SELECT doc_id, lang FROM documents),
    ftab AS (
        SELECT bucket, count(*) AS raw_cnt,
               sum(CASE WHEN d.lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_cnt
        FROM feat f JOIN dl d USING (doc_id) GROUP BY bucket
    ),
    tot AS (SELECT sum(raw_cnt) AS n_raw, sum(tgt_cnt) AS n_tgt FROM ftab),
    lr AS (
        SELECT bucket,
               round(ln((tgt_cnt + {DSIR_ALPHA}) / (n_tgt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                   - ln((raw_cnt + {DSIR_ALPHA}) / (n_raw + {DSIR_ALPHA} * {DSIR_BUCKETS})), 9)
                   AS logratio
        FROM ftab CROSS JOIN tot
    ),
    per_doc AS (
        SELECT f.doc_id, d.lang,
               count(*)                   AS n_feats,
               round(avg(lr.logratio), 6) AS dsir_logratio
        FROM feat f JOIN dl d USING (doc_id) JOIN lr USING (bucket)
        GROUP BY f.doc_id, d.lang
    ),
    gstats AS (
        SELECT avg(dsir_logratio) AS mu, stddev_samp(dsir_logratio) AS sigma
        FROM per_doc
    )
    SELECT p.doc_id, p.lang, p.n_feats, p.dsir_logratio,
           round((p.dsir_logratio - g.mu) / g.sigma, 4) AS dsir_z,
           coalesce(round((p.dsir_logratio - g.mu) / g.sigma, 4) >= {DSIR_SELECT_Z}, false)
               AS selected
    FROM per_doc p CROSS JOIN gstats g
    """,
    doc="DSIR-style importance-weighted data selection (hashed-ngram "
    "importance resampling): per-doc mean log p_target(f)/p_raw(f) over "
    "word uni+bigram features hashed into a FIXED bucket space, both "
    "models Laplace-smoothed, target = the DSIR_TARGET_LANG slice. "
    "Scale shape: gram arrays build per-row inside codegen (zip_with on "
    "two slices — no window, no self-join); the feature table is ONE "
    "bucket-keyed aggregate bounded at DSIR_BUCKETS rows no matter the "
    "corpus size, so scoring is a broadcast-hash join over the exploded "
    "feature stream followed by a map-side-combined doc aggregate; the "
    "selection threshold is mu + z*sigma from one scalar aggregate "
    "broadcast back (never a global rank), with the cut compared on the "
    "4-dp-rounded z in both engines (stddev is order-sensitive in the "
    "last ulp). Per-feature log-ratios are rounded to 9 decimals before "
    "averaging, and token-less docs are absent from the output — both "
    "the unigram_logprob_scores conventions (lang rides the feature "
    "stream, so no doc-keyed join-back resurrects empty docs at the "
    "price of a sort-merge join).",
)
def dsir_logratio_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The feature stream feeds two different downstream exchanges (the
    # bucket-count aggregate and the per-doc scoring join), so runtime
    # exchange reuse can never share it: without a cut the corpus is
    # tokenized + md5-hashed TWICE per action — the dominant CPU of the
    # whole query (r12: 2.63 s -> 1.69 s at sf0.1 from this one cut). A
    # LAZY local checkpoint materializes the fingerprint-narrow
    # (doc_id, lang, bucket) rows once; MEMORY_AND_DISK-backed, so a
    # corpus-scale stream spills instead of OOMing, and re-reading
    # ~24 B/gram rows is far cheaper than re-hashing every gram.
    feat = dsir_features(docs).localCheckpoint(eager=False)

    # The bucket table is <= DSIR_BUCKETS rows but its build scans the
    # full gram stream; without a cut both `tot` and `lr` would re-derive
    # it (two extra corpus passes). A LAZY local checkpoint materializes
    # it once at execution and keeps plan construction action-free.
    ftab = (
        feat.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("raw_cnt"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("tgt_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = ftab.agg(
        F.sum("raw_cnt").alias("n_raw"), F.sum("tgt_cnt").alias("n_tgt")
    )
    a, b = F.lit(DSIR_ALPHA), F.lit(float(DSIR_BUCKETS))
    # A typo'd/mismatched target tag passes the shape validation but
    # matches zero rows, degenerating the whole importance model to a
    # function of raw counts — fail LOUD instead (assert_true rides the
    # existing 1-row tot broadcast: no extra job, no extra scan).
    tgt_ok = F.assert_true(
        F.col("n_tgt") > 0,
        F.lit(
            f"DSIR target slice lang={DSIR_TARGET_LANG!r} matched no "
            "feature occurrences — check SPARK_GRAFT_DSIR_TARGET_LANG "
            "against the corpus lang values"
        ),
    )
    lr = ftab.crossJoin(F.broadcast(tot)).filter(tgt_ok.isNull()).select(
        "bucket",
        F.round(
            F.log((F.col("tgt_cnt") + a) / (F.col("n_tgt") + a * b))
            - F.log((F.col("raw_cnt") + a) / (F.col("n_raw") + a * b)),
            9,
        ).alias("logratio"),
    )
    per_doc = (
        feat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.avg("logratio"), 6).alias("dsir_logratio"),
        )
    )
    gstats = per_doc.agg(
        F.avg("dsir_logratio").alias("mu"),
        F.stddev_samp("dsir_logratio").alias("sigma"),
    )
    z = F.round((F.col("dsir_logratio") - F.col("mu")) / F.col("sigma"), 4)
    return per_doc.crossJoin(F.broadcast(gstats)).select(
        "doc_id",
        "lang",
        "n_feats",
        "dsir_logratio",
        z.alias("dsir_z"),
        F.coalesce(z >= DSIR_SELECT_Z, F.lit(False)).alias("selected"),
    )


# ------------------- frozen-model DSIR admission (streaming gate's twin)

# Calibration sample for the FROZEN selection model: the doc_id % MOD
# == 0 slice plays the curated reference corpus a production deployment
# would freeze the model on before opening the ingest stream.
SELECTION_CAL_MOD = 10


def dsir_frozen_model(feat_cal: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(lr, params): the FROZEN selection model from a calibration
    feature stream (dsir_features of the calibration docs).

    lr covers the FULL bucket domain — exactly DSIR_BUCKETS rows via a
    range⋈counts left join, so it stays broadcastable at any corpus
    size AND a scored doc can never present a bucket the model lacks
    (unseen buckets carry the pure-Laplace logratio, the natural
    count-zero smoothing). params is ONE row (mu, sigma) over the
    calibration docs' 6-dp scores: the admission threshold mu + z*sigma
    is frozen with the model, never recomputed from a batch — admission
    must not depend on micro-batch composition."""
    spark = feat_cal.sparkSession
    # feat_cal feeds two different exchanges (the bucket counts below
    # and the calibration scoring join) — cut it so the calibration docs
    # are tokenized + md5-hashed once per action, not twice. Callers
    # that already pass a checkpointed stream (incremental_selection_-
    # gate) pay one cheap re-materialization of the filtered slice;
    # callers that pass a raw stream (the ingest twins, the streaming
    # freeze) save a full calibration tokenize pass.
    feat_cal = feat_cal.localCheckpoint(eager=False)
    counts = feat_cal.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tgt_cnt"),
    )
    ftab = (
        spark.range(DSIR_BUCKETS).select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
            F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
        )
        # one materialization feeds tot, lr, and the calibration scoring
        # pass (same rationale as dsir_logratio_scores' ftab checkpoint)
        .localCheckpoint(eager=False)
    )
    tot = ftab.agg(
        F.sum("raw_cnt").alias("n_raw"), F.sum("tgt_cnt").alias("n_tgt")
    )
    a, b = F.lit(DSIR_ALPHA), F.lit(float(DSIR_BUCKETS))
    tgt_ok = F.assert_true(
        F.col("n_tgt") > 0,
        F.lit(
            f"frozen DSIR model: target slice lang={DSIR_TARGET_LANG!r} "
            "matched no calibration feature occurrences — check "
            "SPARK_GRAFT_DSIR_TARGET_LANG against the calibration corpus"
        ),
    )
    lr = ftab.crossJoin(F.broadcast(tot)).filter(tgt_ok.isNull()).select(
        "bucket",
        F.round(
            F.log((F.col("tgt_cnt") + a) / (F.col("n_tgt") + a * b))
            - F.log((F.col("raw_cnt") + a) / (F.col("n_raw") + a * b)),
            9,
        ).alias("logratio"),
    )
    cal_scores = (
        feat_cal.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.avg("logratio"), 6).alias("s"))
    )
    params = cal_scores.agg(
        F.avg("s").alias("mu"), F.stddev_samp("s").alias("sigma")
    )
    return lr, params


def dsir_score_against_model(feat: DataFrame, lr: DataFrame,
                             params: DataFrame) -> DataFrame:
    """Score a feature stream against a FROZEN model: broadcast-hash join
    to the bounded lr table, map-side-combined per-doc aggregate, then
    the frozen 1-row params broadcast decides admission — per-doc and
    independent of every other doc, which is what makes the streaming
    gate's per-batch scoring equal the batch twin by construction."""
    per_doc = (
        feat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.avg("logratio"), 6).alias("dsir_logratio"),
        )
    )
    z = F.round((F.col("dsir_logratio") - F.col("mu")) / F.col("sigma"), 4)
    return per_doc.crossJoin(F.broadcast(params)).select(
        "doc_id",
        "lang",
        "n_feats",
        "dsir_logratio",
        z.alias("sel_z"),
        F.coalesce(z >= DSIR_SELECT_Z, F.lit(False)).alias("admitted"),
    )


@register(
    "incremental_selection_gate",
    oracle=f"""
    WITH tok AS (SELECT * FROM ({_DSIR_TOK_SQL}) WHERE word <> ''),
    grams AS (
        SELECT doc_id, word AS gram FROM tok
        UNION ALL
        SELECT doc_id,
               word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
        FROM tok
        QUALIFY lead(word) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    feat AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(gram), 1, 7) AS BIGINT) % {DSIR_BUCKETS} AS bucket
        FROM grams
    ),
    fl AS (
        SELECT f.doc_id, d.lang, f.bucket
        FROM feat f JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)
    ),
    cal AS (SELECT * FROM fl WHERE doc_id % {SELECTION_CAL_MOD} = 0),
    cnts AS (
        SELECT bucket, count(*) AS raw_cnt,
               sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_cnt
        FROM cal GROUP BY bucket
    ),
    ftab AS (
        SELECT b.bucket, coalesce(raw_cnt, 0) AS raw_cnt,
               coalesce(tgt_cnt, 0) AS tgt_cnt
        FROM range({DSIR_BUCKETS}) b(bucket) LEFT JOIN cnts USING (bucket)
    ),
    tot AS (SELECT sum(raw_cnt) AS n_raw, sum(tgt_cnt) AS n_tgt FROM ftab),
    lr AS (
        SELECT bucket,
               round(ln((tgt_cnt + {DSIR_ALPHA}) / (n_tgt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                   - ln((raw_cnt + {DSIR_ALPHA}) / (n_raw + {DSIR_ALPHA} * {DSIR_BUCKETS})), 9)
                   AS logratio
        FROM ftab CROSS JOIN tot
    ),
    cal_scores AS (
        SELECT doc_id, round(avg(logratio), 6) AS s
        FROM cal JOIN lr USING (bucket) GROUP BY doc_id
    ),
    params AS (SELECT avg(s) AS mu, stddev_samp(s) AS sigma FROM cal_scores),
    per_doc AS (
        SELECT fl.doc_id, fl.lang, count(*) AS n_feats,
               round(avg(lr.logratio), 6) AS dsir_logratio
        FROM fl JOIN lr USING (bucket) GROUP BY fl.doc_id, fl.lang
    )
    SELECT p.doc_id, p.lang, p.n_feats, p.dsir_logratio,
           round((p.dsir_logratio - mu) / sigma, 4) AS sel_z,
           coalesce(round((p.dsir_logratio - mu) / sigma, 4) >= {DSIR_SELECT_Z}, false)
               AS admitted
    FROM per_doc p CROSS JOIN params
    """,
    doc="The streaming DSIR selection gate's batch twin — the "
    "oracle-checked semantics spec for streaming/selection.py. Model "
    "FROZEN on the doc_id % SELECTION_CAL_MOD == 0 calibration slice "
    "(full-domain Laplace bucket table + mu/sigma threshold), then "
    "every corpus doc scored against it and admitted at sel_z >= "
    "DSIR_SELECT_Z. Because the model and threshold are frozen and "
    "scoring is per-doc, admission is independent of batch boundaries "
    "— the streaming gate over ANY chunking of the corpus drains to "
    "exactly this set (tests/test_streaming.py). Scale shape: the "
    "model is DSIR_BUCKETS+1 broadcast rows however large the corpus; "
    "scoring is a broadcast join + map-side-combined doc aggregate; "
    "no store, so per-batch cost never grows with stream lifetime.",
)
def incremental_selection_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize+md5 pass: the calibration slice's features are a
    # doc_id filter of the full feature stream (dsir_features is a
    # per-row map, so filter commutes), and the model builder reads the
    # calibration slice twice (bucket counts + calibration scores) while
    # scoring reads the full stream once — without the cut that is ~1.2
    # corpus tokenizations per action, with it exactly 1 (r12: 1.91 s ->
    # 1.68 s at sf0.1). Same MEMORY_AND_DISK spill posture as
    # dsir_logratio_scores' feature checkpoint.
    feat = dsir_features(docs).localCheckpoint(eager=False)
    cal = feat.filter(F.col("doc_id") % SELECTION_CAL_MOD == 0)
    lr, params = dsir_frozen_model(cal)
    return dsir_score_against_model(feat, lr, params)


# --------------------------- semantic benchmark decontamination (eval set)

# Embedding-space eval-set decontamination: flag every training vector
# whose cosine to ANY benchmark/eval vector reaches SEM_DECON_TAU. The
# eval set is FIXED-SIZE (a benchmark suite, not a corpus fraction), so
# the whole eval side folds into one broadcast row and the corpus scan
# is decided map-side: recall-complete exact scoring with no key
# exchange.
SEM_DECON_N_EVAL = 25   # vec_id < 25 simulate the benchmark suite
SEM_DECON_TAU = 0.42    # rounded-cosine contamination threshold


@register(
    "semantic_decontam_flags",
    oracle=f"""
    WITH e AS (
        SELECT vec_id AS eval_id, embedding::DOUBLE[] AS ee
        FROM embeddings WHERE vec_id < {SEM_DECON_N_EVAL}
    ),
    c AS (
        SELECT vec_id, embedding::DOUBLE[] AS ce
        FROM embeddings WHERE vec_id >= {SEM_DECON_N_EVAL}
    ),
    pairs AS (
        SELECT c.vec_id, e.eval_id,
               round(list_dot_product(ce, ee)
                     / sqrt(list_dot_product(ce, ce) * list_dot_product(ee, ee)), 6)
                   AS cosine
        FROM c CROSS JOIN e
    ),
    best AS (
        SELECT vec_id, eval_id, cosine,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, eval_id) AS rn
        FROM pairs
    )
    SELECT vec_id, eval_id AS nearest_eval_id, cosine AS max_cosine,
           cosine >= {SEM_DECON_TAU} AS contaminated
    FROM best WHERE rn = 1
    """,
    doc="Semantic eval-set decontamination: per training vector, the "
    "max cosine to the benchmark set, the nearest benchmark item, and a "
    "contaminated flag at SEM_DECON_TAU — the embedding-space sibling "
    "of the n-gram benchmark_contamination check (catches paraphrased "
    "leakage that shares no n-gram). Scale shape: the eval side is "
    "O(benchmark), collected into ONE broadcast row of (eval_id, vec, "
    "norm) structs with norms precomputed eval-side; the corpus is a "
    "single scan whose argmax folds per-row over the struct array "
    "(array_max on (cosine, -eval_id) = highest cosine, smallest id on "
    "ties, mirrored by the oracle's row_number order) — no join-key "
    "exchange and no per-vector window at any corpus size; the only "
    "exchange is the explicit local-mode round-robin spread() of "
    "id+vector rows (linear by construction, unnecessary on a cluster "
    "where the scan already yields enough partitions). Decontamination "
    "needs recall, so scoring is exact, not LSH-pruned.",
)
def semantic_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") < SEM_DECON_N_EVAL).select(
        F.col("vec_id").alias("eval_id"), as_double("embedding").alias("ee")
    )
    evals = ev.select(
        F.struct(
            F.col("eval_id"),
            F.col("ee"),
            dot(F.col("ee"), F.col("ee")).alias("en"),
        ).alias("s")
    ).agg(F.sort_array(F.collect_list("s")).alias("evals"))
    corpus = spread(
        emb.filter(F.col("vec_id") >= SEM_DECON_N_EVAL).select(
            "vec_id", as_double("embedding").alias("ce")
        )
    ).withColumn("cn", dot(F.col("ce"), F.col("ce")))
    best = F.array_max(
        F.transform(
            F.col("evals"),
            lambda s: F.struct(
                F.round(
                    dot(F.col("ce"), s["ee"]) / F.sqrt(F.col("cn") * s["en"]),
                    6,
                ).alias("cosine"),
                (-s["eval_id"]).alias("neg_id"),
            ),
        )
    )
    return (
        corpus.crossJoin(F.broadcast(evals))
        .withColumn("best", best)
        # degenerate-eval parity: with an EMPTY eval set the oracle's
        # CROSS JOIN yields zero rows, while collect_list still emits one
        # empty-array row whose array_max folds to NULL — drop those so
        # both engines agree (and NULL flags can never poison a
        # downstream keep-set sum)
        .filter(F.col("best").isNotNull())
        .select(
            "vec_id",
            (-F.col("best.neg_id")).alias("nearest_eval_id"),
            F.col("best.cosine").alias("max_cosine"),
            (F.col("best.cosine") >= SEM_DECON_TAU).alias("contaminated"),
        )
    )


# ----------------------------------- composed selection pipeline (keep-set)

@register(
    "selection_pipeline",
    oracle=f"""
    WITH d AS ({oracle_of("dsir_logratio_scores")}),
    c AS ({oracle_of("semantic_decontam_flags")})
    SELECT d.lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN d.selected THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
           CAST(sum(CASE WHEN c.contaminated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(sum(CASE WHEN d.selected AND NOT c.contaminated
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           round(avg(d.dsir_logratio), 6) AS avg_dsir_logratio
    FROM d JOIN c ON d.doc_id = c.vec_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    doc="The selection KEEP-SET in one composed plan: DSIR importance "
    "scores joined per-document with the semantic decontamination "
    "verdict (doc_id = vec_id, the embedded slice of the corpus), "
    "kept = selected AND NOT contaminated, published as per-lang audit "
    "rows. Proves the two selection signals COMPOSE without a "
    "materialization barrier — the corpus_curation_pipeline argument "
    "applied to the new suite — and the oracle is composed the same "
    "way, by splicing the constituents' registered oracle SQL into two "
    "CTEs (registry.oracle_of), so the composed contract can never "
    "drift from the parts. Scale shape: each side keeps its own "
    "bounded-model plan; combining per-doc signals is ONE id-keyed "
    "co-partitioned join of fingerprint-narrow score/flag rows (the "
    "honest wide stage of zipping independently-computed per-doc "
    "signals), then a lang-bounded aggregate.",
)
def selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dsir_logratio_scores(spark, sf_dir)
    c = semantic_decontam_flags(spark, sf_dir)
    joined = d.join(c, d["doc_id"] == c["vec_id"])
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("selected").cast("int")).cast("bigint").alias("n_selected"),
            F.sum(F.col("contaminated").cast("int"))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum((F.col("selected") & ~F.col("contaminated")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.round(F.avg("dsir_logratio"), 6).alias("avg_dsir_logratio"),
        )
        .orderBy("lang")
    )
