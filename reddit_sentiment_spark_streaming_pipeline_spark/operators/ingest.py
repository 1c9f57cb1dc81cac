"""Composed streaming-INGEST admission pipeline (batch twin).

The three streaming admission gates (exact dedup, SimHash near-dup,
DSIR selection — streaming/dedup.py, streaming/selection.py) each carry
their own oracle-checked batch twin. This module composes them into the
shape a production crawl-ingestion pipeline actually runs: per incoming
document, in order,

  1. EXACT gate    — keep iff no smaller-id doc has the same md5(text);
  2. NEAR-DUP gate — among exact survivors, keep iff no smaller-id
                     BLOCKER (one of the NEARDUP_BLOCKER_CAP smallest-id
                     survivors of a shared SimHash 16-bit chunk bucket)
                     sits within Hamming <= HAMMING_THRESHOLD (stage 2
                     never sees an exact dup: its byte-identical
                     original carries the identical fingerprint and
                     plays the blocker);
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
shuffle); stage 2 decides each survivor against the CAPPED per-bucket
blocker set (NEARDUP_BLOCKER_CAP smallest-id survivors per chunk
bucket) — O(cap) per member, never member×member: the uncapped form
this replaced went quadratic in a flooded chunk value (r12 spam-flood
measurement at NEARDUP_BLOCKER_CAP's comment); stage 3 is the
bounded-model broadcast join + one map-side-combined doc aggregate.
Composition adds NO materialization barrier — the flags fold back onto
the staged frame with fingerprint-narrow left joins.
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
    MAX_LSH_BUCKET,
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

# Planted-id offsets for the ingest fixture. The resubmit offset doubles
# as the calibration-slice bound (`doc_id < INGEST_RESUB_OFFSET` = "an
# EXISTING base doc") everywhere the twin's convention is consumed —
# here, in the frozen-model oracle fragment below, and in
# tools/streaming_rehearsal.py's calibration reads. Any base fixture
# whose doc_ids reach the offset would silently collide planted ids with
# base ids AND drift the calibration slice — and since engine and oracle
# share the convention, the oracle check could not see it — so
# ingest_corpus fails loudly instead (the guard below), the same hazard
# contract as tools/scale_rehearsal.py's replica-stride guard.
INGEST_RESUB_OFFSET = 1_000_000
INGEST_TAILED_OFFSET = 2 * INGEST_RESUB_OFFSET

# Per-bucket cap on the stage-2 BLOCKER set: a doc's near-dup rejection
# is decided against the NEARDUP_BLOCKER_CAP smallest-id exact survivors
# of each of its 4 chunk buckets, not against every bucket member. The
# uncapped member×member form goes quadratic in a flooded chunk value —
# measured r12 on the template-spam fixture: 10× docs → 111× join pairs
# (2,758 → 307,666; max bucket 31 → 282) — the regime exact dedup cannot
# fold because spam variants differ by bytes. Capping the BLOCKER side
# keeps per-member cost O(cap): a flood family's smallest-id members
# fill the cap and reject every later member (rejection recall measured
# in REHEARSAL_r12_ingest_flood*.json), while the admission rule stays
# deterministic and oracle-expressible (row_number by doc_id). The known
# trade (shared with simhash_pair_rows' MAX_LSH_BUCKET, same cap value):
# a doc whose ONLY smaller-id matches hide beyond the cap in ALL FOUR of
# its buckets — behind ≥ cap unrelated smaller-id docs per bucket — is
# wrongly admitted; the flood artifact measures that loss directly
# against the uncapped rule.
NEARDUP_BLOCKER_CAP = MAX_LSH_BUCKET

# The ingest corpus: the existing documents plus an incoming crawl slice
# with planted byte-identical resubmits (+INGEST_RESUB_OFFSET — stage
# 1's food) and tail-edited near copies (+INGEST_TAILED_OFFSET — stage
# 2's food), the snapshot-fixture convention (operators/curation.py)
# except lang RIDES ALONG (stage 3 needs it) and text stays RAW
# (md5/simhash/tokens all see the same bytes in engine and oracle).
_INGEST_CORPUS_SQL = f"""
        SELECT doc_id, lang, text, source FROM documents
        UNION ALL
        SELECT doc_id + {INGEST_RESUB_OFFSET}, lang, text, source
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + {INGEST_TAILED_OFFSET}, lang,
               text || ' zz fresh snapshot tail', source
        FROM documents WHERE doc_id % 7 = 0
"""


def ingest_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collision guard (see INGEST_RESUB_OFFSET): base ids at or past the
    # offset abort the scan row-side — raise_error lives in the projected
    # doc_id expression itself, so no plan rewrite can prune the check
    # and no extra driver-side action (count/max) is spent on it
    guarded = F.when(
        F.col("doc_id") < INGEST_RESUB_OFFSET, F.col("doc_id")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ingest_corpus: base doc_id %s >= planted-id offset "
                f"{INGEST_RESUB_OFFSET} — resubmit/tail ids would collide "
                "with base ids and the calibration slice would drift",
                F.col("doc_id").cast("string"),
            )
        )
    )
    docs = load_table(spark, sf_dir, "documents").select(
        guarded.alias("doc_id"), "lang", "text", "source"
    )
    resub = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + INGEST_RESUB_OFFSET).alias("doc_id"),
        "lang", "text", "source",
    )
    tailed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + INGEST_TAILED_OFFSET).alias("doc_id"),
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
        WHERE doc_id < {INGEST_RESUB_OFFSET} AND doc_id % {SELECTION_CAL_MOD} = 0
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
    blk2 AS (
        SELECT * FROM (
            SELECT cl.*,
                   row_number() OVER (
                       PARTITION BY ci, cv ORDER BY doc_id) AS rn
            FROM cl
        ) WHERE rn <= {NEARDUP_BLOCKER_CAP}
    ),
    rej2 AS (
        SELECT DISTINCT a.doc_id
        FROM cl a JOIN blk2 b
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
    "original carries the same fingerprint and plays its blocker) and "
    "decides each survivor against the CAPPED per-bucket blocker set — "
    "the NEARDUP_BLOCKER_CAP smallest-id survivors per shared chunk "
    "bucket, the r12 fix for the uncapped member-squared flood shape; "
    "stage 3 scores near-dup survivors against the model frozen on the "
    "base-id calibration slice — stages 1/3 verbatim from their "
    "standalone twins (exact_dup_groups' keep-first rule, "
    "incremental_selection_gate's frozen threshold). Scale shape: the "
    "md5 keep-first window, the O(cap)-per-member blocker join, the "
    "bounded-model broadcast scoring — composition folds flags back "
    "with fingerprint-narrow left joins, no materialization barrier.",
)
def incremental_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ingest_corpus(spark, sf_dir).select("doc_id", "lang", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    staged = docs.withColumn("exact_ok", F.row_number().over(w) == 1)
    s1 = staged.filter("exact_ok")

    cl = simhash_chunk_rows(simhash_fp(s1.select("doc_id", "text")))
    wb = Window.partitionBy("ci", "cv").orderBy(F.col("d.doc_id"))
    blockers = (
        cl.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= NEARDUP_BLOCKER_CAP)
        .select("ci", "cv", F.col("d").alias("b"))
    )
    a = cl.select("ci", "cv", F.col("d").alias("a"))
    ham = F.expr(hamming_expr("a.h", "b.h", "spark"))
    rej2 = (
        a.join(blockers, ["ci", "cv"])
        .filter(F.col("b.doc_id") < F.col("a.doc_id"))
        .filter(ham <= HAMMING_THRESHOLD)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("r2", F.lit(1))
        # rej2 feeds two joins (the stage-3 anti join and the flag
        # assembly) whose downstream exchanges differ, so runtime
        # exchange reuse cannot share the stage-2 subtree — without a
        # cut the whole simhash + capped-blocker join runs twice per
        # action. The rejected-id set is tiny (∝ true near-dups), so a
        # lazy local checkpoint is the right lineage cut.
        .localCheckpoint(eager=False)
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


# Arrival-order twin: the composed pipeline under FIRST-SEEN-WINS. The
# deterministic pseudo-random arrival convention is operators/
# curation.py::arrival_seq_col (md5 of the id — both engines derive the
# identical shuffled order with no stored side table).
_ARRIVAL_SEQ_SQL = "md5('arr' || CAST(doc_id AS VARCHAR))"


@register(
    "arrival_order_ingest_pipeline",
    oracle=f"""
    WITH icorpus AS ({_INGEST_CORPUS_SQL}),
    st1 AS (
        SELECT doc_id, lang, text, {_ARRIVAL_SEQ_SQL} AS arrival_seq,
               row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY {_ARRIVAL_SEQ_SQL}, doc_id) = 1 AS exact_ok
        FROM icorpus
    ),
    corpus AS (SELECT doc_id, text FROM st1 WHERE exact_ok),
    {_FP_BODY_SQL},
    cl AS ({_CHUNKS_LONG}),
    cla AS (
        SELECT cl.*, s.arrival_seq
        FROM cl JOIN (SELECT doc_id, arrival_seq FROM st1) s USING (doc_id)
    ),
    blk2 AS (
        SELECT * FROM (
            SELECT cla.*,
                   row_number() OVER (
                       PARTITION BY ci, cv
                       ORDER BY arrival_seq, doc_id) AS rn
            FROM cla
        ) WHERE rn <= {NEARDUP_BLOCKER_CAP}
    ),
    rej2 AS (
        SELECT DISTINCT a.doc_id
        FROM cla a JOIN blk2 b
          ON a.ci = b.ci AND a.cv = b.cv
         AND (b.arrival_seq < a.arrival_seq
              OR (b.arrival_seq = a.arrival_seq AND b.doc_id < a.doc_id))
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
    SELECT st1.doc_id, st1.lang, st1.arrival_seq, st1.exact_ok,
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
    doc="ARRIVAL-ORDER twin of the composed INGEST pipeline: the full "
    "exact -> near-dup -> selection admission funnel under "
    "first-SEEN-wins — the honest semantics for a crawl that does not "
    "deliver in id order. Each doc carries the deterministic "
    "pseudo-random arrival_seq (arrival_order_exact_gate convention); "
    "stage 1 keeps a fingerprint family's FIRST ARRIVAL, stage 2's "
    "capped per-bucket blocker set is the NEARDUP_BLOCKER_CAP "
    "FIRST-ARRIVED survivors per chunk bucket and only "
    "strictly-earlier-arrived blockers reject (lexicographic "
    "(arrival_seq, doc_id) precedence), stage 3 is order-independent "
    "by construction (the FROZEN model scores each doc in isolation). "
    "The id-order twin (incremental_ingest_pipeline) and this rule "
    "genuinely diverge — planted resubmits often arrive before their "
    "originals — and the streaming pipeline driven over "
    "arrival-shuffled chunks must land exactly this flag set "
    "(tests/test_streaming.py::test_ingest_pipeline_arrival_order...). "
    "Physical shape identical to the id-order twin: the md5 keep-first "
    "window and per-bucket blocker ranks just order by (arrival_seq, "
    "doc_id) — the 32-char seq rides the existing exchanges, no new "
    "join or shuffle.",
)
def arrival_order_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import arrival_seq_col

    docs = ingest_corpus(spark, sf_dir).select(
        "doc_id", "lang", "text", arrival_seq_col().alias("arrival_seq")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("arrival_seq", "doc_id")
    staged = docs.withColumn("exact_ok", F.row_number().over(w) == 1)
    s1 = staged.filter("exact_ok")

    fpa = simhash_fp(s1.select("doc_id", "text")).join(
        s1.select("doc_id", "arrival_seq"), "doc_id"
    )
    cl = simhash_chunk_rows(fpa, extra=("arrival_seq",))
    wb = Window.partitionBy("ci", "cv").orderBy(
        F.col("d.arrival_seq"), F.col("d.doc_id")
    )
    blockers = (
        cl.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= NEARDUP_BLOCKER_CAP)
        .select("ci", "cv", F.col("d").alias("b"))
    )
    a = cl.select("ci", "cv", F.col("d").alias("a"))
    earlier = (F.col("b.arrival_seq") < F.col("a.arrival_seq")) | (
        (F.col("b.arrival_seq") == F.col("a.arrival_seq"))
        & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    ham = F.expr(hamming_expr("a.h", "b.h", "spark"))
    rej2 = (
        a.join(blockers, ["ci", "cv"])
        .filter(earlier)
        .filter(ham <= HAMMING_THRESHOLD)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("r2", F.lit(1))
        # same two-consumer lineage cut as the id-order twin's rej2
        .localCheckpoint(eager=False)
    )

    cal = dsir_features(ingest_cal_docs(spark, sf_dir))
    lr, params = dsir_frozen_model(cal)
    s2 = s1.join(rej2, "doc_id", "left_anti")
    scored = dsir_score_against_model(
        dsir_features(s2.select("doc_id", "lang", "text")), lr, params
    ).select("doc_id", "admitted")

    flagged = (
        staged.select("doc_id", "lang", "arrival_seq", "exact_ok")
        .join(rej2, "doc_id", "left")
        .join(scored, "doc_id", "left")
    )
    neardup_ok = F.col("exact_ok") & F.col("r2").isNull()
    return flagged.select(
        "doc_id",
        "lang",
        "arrival_seq",
        "exact_ok",
        neardup_ok.alias("neardup_ok"),
        F.coalesce(neardup_ok & F.col("admitted"), F.lit(False)).alias("kept"),
    )
