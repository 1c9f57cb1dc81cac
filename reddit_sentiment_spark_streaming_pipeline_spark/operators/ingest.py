"""Composed streaming-INGEST admission pipeline (batch twin).

The three streaming admission gates (exact dedup, SimHash near-dup,
DSIR selection — streaming/dedup.py, streaming/selection.py) each carry
their own oracle-checked batch twin. This module composes them into the
shape a production crawl-ingestion pipeline actually runs: per incoming
document, in order,

  1. EXACT gate    — keep iff no smaller-id doc has the same md5(text);
  2. NEAR-DUP gate — among exact survivors, keep iff no smaller-id
                     exact-SURVIVOR shares a SimHash 16-bit chunk within
                     Hamming <= HAMMING_THRESHOLD (stage 2 never sees an
                     exact dup: its byte-identical original carries the
                     identical fingerprint and plays the blocker);
  3. SELECTION gate — among near-dup survivors, keep iff the FROZEN DSIR
                     model (calibration = the doc_id % SELECTION_CAL_MOD
                     slice of the EXISTING base-id corpus — a production
                     freeze happens on the curated reference corpus
                     before the ingest stream opens) admits at
                     sel_z >= DSIR_SELECT_Z.

`incremental_ingest_pipeline` is the oracle-checked semantics spec: one
row per input doc with per-stage flags and the final keep decision. The
streaming production path (streaming/ingest.py::start_ingest_pipeline)
drains to exactly this set for id-ordered replay — proven by
tests/test_streaming.py::test_ingest_pipeline_matches_batch_twin.

Scale shape: stage 1 is the md5 keep-first window (fingerprint-narrow
shuffle); stage 2 is the uncapped chunk equi-join over survivors ONLY
(the gate-path shape — bounded by the store scan in streaming, by the
survivor set here, never |corpus|^2 thanks to the chunk bands); stage 3
is the bounded-model broadcast join + one map-side-combined doc
aggregate. Composition adds NO materialization barrier — the flags fold
back onto the staged frame with fingerprint-narrow left joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reddit_sentiment_spark_streaming_pipeline_spark.functions.hashing import hamming_expr
from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import (
    _CHUNKS_LONG,
    _FP_BODY_SQL,
    HAMMING_THRESHOLD,
    simhash_chunk_rows,
    simhash_fp,
)
from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
    DSIR_ALPHA,
    DSIR_BUCKETS,
    DSIR_SELECT_Z,
    DSIR_TARGET_LANG,
    SELECTION_CAL_MOD,
    dsir_features,
    dsir_frozen_model,
    dsir_score_against_model,
)
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

# The ingest corpus: the existing documents plus an incoming crawl slice
# with planted byte-identical resubmits (+1M — stage 1's food) and
# tail-edited near copies (+2M — stage 2's food), the snapshot-fixture
# convention (operators/curation.py) except lang RIDES ALONG (stage 3
# needs it) and text stays RAW (md5/simhash/tokens all see the same
# bytes in engine and oracle).
_INGEST_CORPUS_SQL = """
        SELECT doc_id, lang, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, lang, text, source
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, lang, text || ' zz fresh snapshot tail', source
        FROM documents WHERE doc_id % 7 = 0
"""


def ingest_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "source"
    )
    resub = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "lang", "text", "source"
    )
    tailed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "lang",
        F.concat("text", F.lit(" zz fresh snapshot tail")).alias("text"),
        "source",
    )
    return docs.unionByName(resub).unionByName(tailed)


def ingest_cal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen model's calibration sample: the doc_id %
    SELECTION_CAL_MOD slice of the EXISTING corpus only (base ids, not
    the incoming crawl) — a production freeze happens on the curated
    reference corpus before the ingest stream opens."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).filter(F.col("doc_id") % SELECTION_CAL_MOD == 0)


# Stage-3 model fragment (CTE names d-prefixed so they can't collide
# with the stage-2 simhash fragment's tok/fp names): the
# incremental_selection_gate oracle's frozen-model chain, verbatim
# semantics — full-domain Laplace bucket table + mu/sigma over the
# calibration docs' 6-dp scores — except features come from the ingest
# corpus and calibration is the base-id slice.
_DSIR_TOK_ICORPUS_SQL = r"""
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+'))                 AS word,
               generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
        FROM icorpus
"""

_DSIR_MODEL_SQL = f"""dtok AS (SELECT * FROM ({_DSIR_TOK_ICORPUS_SQL}) WHERE word <> ''),
    dgrams AS (
        SELECT doc_id, word AS gram FROM dtok
        UNION ALL
        SELECT doc_id,
               word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
        FROM dtok
        QUALIFY lead(word) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    dfeat AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(gram), 1, 7) AS BIGINT) % {DSIR_BUCKETS} AS bucket
        FROM dgrams
    ),
    dfl AS (
        SELECT f.doc_id, dd.lang, f.bucket
        FROM dfeat f JOIN (SELECT doc_id, lang FROM icorpus) dd USING (doc_id)
    ),
    dcal AS (
        SELECT * FROM dfl
        WHERE doc_id < 1000000 AND doc_id % {SELECTION_CAL_MOD} = 0
    ),
    dcnts AS (
        SELECT bucket, count(*) AS raw_cnt,
               sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_cnt
        FROM dcal GROUP BY bucket
    ),
    dftab AS (
        SELECT b.bucket, coalesce(raw_cnt, 0) AS raw_cnt,
               coalesce(tgt_cnt, 0) AS tgt_cnt
        FROM range({DSIR_BUCKETS}) b(bucket) LEFT JOIN dcnts USING (bucket)
    ),
    dtot AS (SELECT sum(raw_cnt) AS n_raw, sum(tgt_cnt) AS n_tgt FROM dftab),
    dlr AS (
        SELECT bucket,
               round(ln((tgt_cnt + {DSIR_ALPHA}) / (n_tgt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                   - ln((raw_cnt + {DSIR_ALPHA}) / (n_raw + {DSIR_ALPHA} * {DSIR_BUCKETS})), 9)
                   AS logratio
        FROM dftab CROSS JOIN dtot
    ),
    dcal_scores AS (
        SELECT doc_id, round(avg(logratio), 6) AS s
        FROM dcal JOIN dlr USING (bucket) GROUP BY doc_id
    ),
    dparams AS (SELECT avg(s) AS mu, stddev_samp(s) AS sigma FROM dcal_scores)"""


@register(
    "incremental_ingest_pipeline",
    oracle=f"""
    WITH icorpus AS ({_INGEST_CORPUS_SQL}),
    st1 AS (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
                   AS exact_ok
        FROM icorpus
    ),
    corpus AS (SELECT doc_id, text FROM st1 WHERE exact_ok),
    {_FP_BODY_SQL},
    cl AS ({_CHUNKS_LONG}),
    rej2 AS (
        SELECT DISTINCT a.doc_id
        FROM cl a JOIN cl b
          ON a.ci = b.ci AND a.cv = b.cv AND b.doc_id < a.doc_id
        WHERE {hamming_expr('a.h', 'b.h', 'duckdb')} <= {HAMMING_THRESHOLD}
    ),
    {_DSIR_MODEL_SQL},
    s2 AS (
        SELECT s.doc_id FROM st1 s
        WHERE s.exact_ok AND s.doc_id NOT IN (SELECT doc_id FROM rej2)
    ),
    sel AS (
        SELECT dfl.doc_id, round(avg(dlr.logratio), 6) AS score
        FROM dfl JOIN dlr USING (bucket)
        WHERE dfl.doc_id IN (SELECT doc_id FROM s2)
        GROUP BY dfl.doc_id
    )
    SELECT st1.doc_id, st1.lang, st1.exact_ok,
           (st1.exact_ok AND r.doc_id IS NULL) AS neardup_ok,
           coalesce(
               st1.exact_ok AND r.doc_id IS NULL
               AND round((sel.score - p.mu) / p.sigma, 4) >= {DSIR_SELECT_Z},
               false
           ) AS kept
    FROM st1
    LEFT JOIN rej2 r ON r.doc_id = st1.doc_id
    LEFT JOIN sel ON sel.doc_id = st1.doc_id
    CROSS JOIN dparams p
    """,
    doc="The streaming INGEST pipeline's batch twin — the oracle-checked "
    "spec for streaming/ingest.py: exact-dedup -> SimHash near-dup -> "
    "frozen-model DSIR selection, composed per document with per-stage "
    "flags (exact_ok, neardup_ok) and the final kept decision. Stage 2 "
    "runs over exact SURVIVORS only (an exact dup's byte-identical "
    "original carries the same fingerprint and plays its blocker), "
    "stage 3 over near-dup survivors against the model frozen on the "
    "full corpus's calibration slice — each stage's semantics verbatim "
    "from its standalone twin (exact_dup_groups' keep-first rule, "
    "incremental_neardup_gate's smaller-id chunk rule, "
    "incremental_selection_gate's frozen threshold). Scale shape: the "
    "md5 keep-first window, the uncapped survivor chunk join (the gate "
    "path's shape), the bounded-model broadcast scoring — composition "
    "folds flags back with fingerprint-narrow left joins, no "
    "materialization barrier.",
)
def incremental_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ingest_corpus(spark, sf_dir).select("doc_id", "lang", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    staged = docs.withColumn("exact_ok", F.row_number().over(w) == 1)
    s1 = staged.filter("exact_ok")

    cl = simhash_chunk_rows(simhash_fp(s1.select("doc_id", "text")))
    a = cl.select("ci", "cv", F.col("d").alias("a"))
    b = cl.select("ci", "cv", F.col("d").alias("b"))
    ham = F.expr(hamming_expr("a.h", "b.h", "spark"))
    rej2 = (
        a.join(b, ["ci", "cv"])
        .filter(F.col("b.doc_id") < F.col("a.doc_id"))
        .filter(ham <= HAMMING_THRESHOLD)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("r2", F.lit(1))
    )

    cal = dsir_features(ingest_cal_docs(spark, sf_dir))
    lr, params = dsir_frozen_model(cal)
    s2 = s1.join(rej2, "doc_id", "left_anti")
    scored = dsir_score_against_model(
        dsir_features(s2.select("doc_id", "lang", "text")), lr, params
    ).select("doc_id", "admitted")

    flagged = (
        staged.select("doc_id", "lang", "exact_ok")
        .join(rej2, "doc_id", "left")
        .join(scored, "doc_id", "left")
    )
    neardup_ok = F.col("exact_ok") & F.col("r2").isNull()
    return flagged.select(
        "doc_id",
        "lang",
        "exact_ok",
        neardup_ok.alias("neardup_ok"),
        F.coalesce(neardup_ok & F.col("admitted"), F.lit(False)).alias("kept"),
    )
