"""JSONL round-trip, cohort retention, MERGE-upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.analytic import retention_cohort_matrix
from reddit_sentiment_spark_streaming_pipeline_spark.operators.relational import merge_upsert_orders
from reddit_sentiment_spark_streaming_pipeline_spark.sinks import jsonl_roundtrip_events


def test_jsonl_roundtrip_lossless(spark, sf_dir):
    pdf = jsonl_roundtrip_events(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert pdf.n_events.sum() == ev.count()
    # max_ts must survive with microsecond fidelity (not truncated to ms)
    assert any(t.microsecond % 1000 != 0 for t in pdf.max_ts)


def test_retention_matrix_shrinks_forward(spark, sf_dir):
    pdf = retention_cohort_matrix(spark, sf_dir).toPandas()
    assert (pdf.week_offset >= 0).all()
    # within a cohort, offset-0 is the cohort's full size: no later cell
    # can exceed it (retention can only lose users)
    for _, g in pdf.groupby("cohort_week"):
        base = g.loc[g.week_offset == 0, "n_users"]
        assert len(base) == 1
        assert (g.n_users <= base.iloc[0]).all()


def test_merge_upsert_statuses(spark, sf_dir):
    pdf = merge_upsert_orders(spark, sf_dir).toPandas().set_index("o_orderstatus")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_base = orders.count()
    n_upd = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    n_ins = orders.filter(F.col("o_orderkey") % 17 == 0).count()
    # every update replaced (not added); every insert is new
    assert pdf.n_orders.sum() == n_base + n_ins
    assert pdf.loc["U"].n_orders == n_upd
    assert pdf.loc["N"].n_orders == n_ins


def test_curation_pipeline_stages_compose(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import corpus_curation_pipeline

    pdf = corpus_curation_pipeline(spark, sf_dir).toPandas()
    assert set(pdf.split) <= {"train", "val", "test"}
    # the 80/10/10 hash split: train strictly dominates
    by_split = pdf.groupby("split").n_docs.sum()
    assert by_split.get("train", 0) > by_split.get("val", 0)
    assert (pdf.n_pii_docs <= pdf.n_docs).all()
    assert pdf.avg_quality.between(0.35, 1).all()


def test_curation_pipeline_single_wide_stage(spark, sf_dir):
    import contextlib
    import io

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import corpus_curation_pipeline

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus_curation_pipeline(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    # dedup window + final aggregate + the output sort: at most 3 data
    # exchanges — no materialization barrier between composed stages
    n_exchanges = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n_exchanges <= 3, plan


def test_incremental_gate_rejects_resubmits_admits_novel(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import incremental_dedup_gate

    pdf = incremental_dedup_gate(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_resubmit = docs.filter(F.col("doc_id") % 10 == 0).count()
    n_novel = docs.filter(F.col("doc_id") % 7 == 0).count()
    assert pdf.n_incoming.sum() == n_resubmit + n_novel
    # exact resubmits are all rejected; tailed docs are all admitted
    assert pdf.n_rejected.sum() == n_resubmit
    assert pdf.n_admitted.sum() == n_novel
    assert (pdf.n_incoming == pdf.n_admitted + pdf.n_rejected).all()


def test_doc_chunks_cover_every_token(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import doc_chunks

    pdf = doc_chunks(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert pdf.doc_id.nunique() == n_docs
    assert (pdf.n_chunk_tokens > 0).all()
    for _, g in pdf.groupby("doc_id"):
        idx = sorted(g.chunk_idx)
        assert idx == list(range(len(idx)))  # contiguous from 0
        # window 32 / stride 24: all non-final chunks are full, and the
        # stride guarantees token coverage (32 + 24*(k-1) >= n_tokens)
        g = g.sort_values("chunk_idx")
        assert (g.n_chunk_tokens.iloc[:-1] == 32).all() or len(g) == 1
        n_tokens = 24 * (len(g) - 1) + g.n_chunk_tokens.iloc[-1]
        assert 32 + 24 * (len(g) - 1) >= n_tokens


def test_doc_chunks_plan_is_shuffle_free(spark, sf_dir):
    import contextlib
    import io

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import doc_chunks

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        doc_chunks(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan


def test_snapshot_novelty_zero_for_resubmits(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import snapshot_ngram_novelty

    pdf = snapshot_ngram_novelty(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_resubmit = docs.filter(F.col("doc_id") % 10 == 0).count()
    # every resubmitted doc contributes zero novel shingles
    assert pdf.n_fully_seen.sum() >= n_resubmit
    assert pdf.avg_novelty.between(0, 1).all()
    # tailed docs exist, so at least one source shows positive novelty
    assert (pdf.avg_novelty > 0).any()


def test_scratch_reaper_spares_live_pids_reaps_dead_ones(tmp_path, monkeypatch):
    import os
    import tempfile

    from reddit_sentiment_spark_streaming_pipeline_spark.sinks import _pid_scratch_dir

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    parent = tmp_path / "spark_graft_roundtrips"
    parent.mkdir()
    # a LIVE sibling (this process's parent pid) with an ancient mtime:
    # age alone must NOT reap it — a >2h sweep still lazily reads its files
    live = parent / f"jsonl_sf0.01_{os.getppid()}"
    live.mkdir()
    old = 1.0  # epoch — older than any age cutoff
    os.utime(live, (old, old))
    # a DEAD sibling: max pid + 1 can't be a running process
    with open("/proc/sys/kernel/pid_max") as f:
        dead_pid = int(f.read().strip()) + 1
    dead = parent / f"jsonl_sf0.01_{dead_pid}"
    dead.mkdir()
    # a HOSTILE sibling in the world-writable parent: a pid suffix beyond
    # C pid_t would make a naive os.kill probe raise OverflowError and
    # crash every round-trip query in the process — it must be skipped
    hostile = parent / "jsonl_sf0.01_99999999999999999999"
    hostile.mkdir()

    # legacy fixed-path dirs from the pre-pid-keyed scheme: no owner pid
    # to probe, so age decides — stale (>2h) is reaped, fresh survives
    # (a live old-code writer would have written recently)
    legacy_stale = parent / "jsonl_sf0.01"
    legacy_stale.mkdir()
    os.utime(legacy_stale, (old, old))
    legacy_fresh = parent / "csv_sf0.01"
    legacy_fresh.mkdir()

    out = _pid_scratch_dir("jsonl", "/root/testdata/sf0.01")
    assert live.is_dir(), "live sibling was reaped"
    assert not dead.is_dir(), "dead sibling survived"
    assert hostile.is_dir(), "oversized-pid dir should be skipped, not probed"
    assert not legacy_stale.is_dir(), "stale legacy dir survived"
    assert out.endswith(f"jsonl_sf0.01_{os.getpid()}")
    # the fresh legacy dir is for another kind; also check same-kind fresh
    _pid_scratch_dir("csv", "/root/testdata/sf0.01")
    assert legacy_fresh.is_dir(), "fresh legacy dir was reaped"


def test_dsir_scores_enrich_target_lang(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
        DSIR_TARGET_LANG,
        dsir_logratio_scores,
    )

    pdf = dsir_logratio_scores(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    # every doc with >= 1 token scores (this corpus has no empty docs)
    assert len(pdf) == len(docs)
    assert pdf.doc_id.is_unique
    # the selection must ENRICH the target slice: target-lang share among
    # selected docs strictly above its corpus share (the whole point of
    # importance resampling)
    sel = pdf[pdf.selected]
    assert len(sel) > 0
    corpus_share = (pdf.lang == DSIR_TARGET_LANG).mean()
    sel_share = (sel.lang == DSIR_TARGET_LANG).mean()
    assert sel_share > corpus_share
    # and mean target score above mean non-target score
    tgt = pdf[pdf.lang == DSIR_TARGET_LANG].dsir_logratio.mean()
    rest = pdf[pdf.lang != DSIR_TARGET_LANG].dsir_logratio.mean()
    assert tgt > rest


def test_dsir_feature_count_identity(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import dsir_logratio_scores

    pdf = dsir_logratio_scores(spark, sf_dir).toPandas().set_index("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    # features = unigrams + bigrams = n_tokens + (n_tokens - 1)
    n_tok = docs.set_index("doc_id").text.str.lower().str.split().str.len()
    want = (2 * n_tok - 1).clip(lower=0)
    got = pdf.n_feats.reindex(n_tok.index).fillna(0).astype(int)
    assert (got == want).all()


def test_dsir_plan_broadcasts_feature_table(spark, sf_dir):
    import contextlib
    import io

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import dsir_logratio_scores

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dsir_logratio_scores(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    # scoring joins against the bounded bucket table must be broadcast —
    # a sort-merge join here would shuffle the full feature stream
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def test_selection_pipeline_consistent_with_parents(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
        SEM_DECON_N_EVAL,
        dsir_logratio_scores,
        selection_pipeline,
        semantic_decontam_flags,
    )

    pipe = selection_pipeline(spark, sf_dir).toPandas().set_index("lang")
    d = dsir_logratio_scores(spark, sf_dir).toPandas()
    c = semantic_decontam_flags(spark, sf_dir).toPandas()
    # the composed keep-set must reconcile row-for-row with its parents
    m = d.merge(c, left_on="doc_id", right_on="vec_id")
    assert pipe.n_docs.sum() == len(m)
    by = m.groupby("lang")
    for lang, g in by:
        row = pipe.loc[lang]
        assert row.n_selected == g.selected.sum()
        assert row.n_contaminated == g.contaminated.sum()
        assert row.n_kept == (g.selected & ~g.contaminated).sum()
    # keep-set algebra: kept <= selected <= docs, and eval-side docs
    # (doc_id < N_EVAL) are excluded by the inner join
    assert (pipe.n_kept <= pipe.n_selected).all()
    assert (pipe.n_selected <= pipe.n_docs).all()
    assert m.doc_id.min() >= SEM_DECON_N_EVAL


def test_dsir_bigrams_match_textstats_bigram_contract(spark):
    """Two adjacent-word bigram builders exist (textstats' repetition
    pipeline uses element_at over a sequence; selection's DSIR uses
    zip_with over two slices). This pin keeps them from silently
    desynchronizing: both must emit the identical 'w_i w_{i+1}' arrays
    for the same token arrays, including the <2-token empty fallback."""
    from pyspark.sql import functions as F

    rows = [
        ("a b c d",), ("one",), ("",), ("x y",), ("p  q   r",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import tokens

    toked = df.select(tokens("text").alias("toks"))
    tc = F.col("toks")
    dsir_bg = F.when(
        F.size(tc) >= 2,
        F.zip_with(
            F.slice(tc, 1, F.size(tc) - 1),
            F.slice(tc, 2, F.size(tc) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    textstats_bg = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = toked.select(dsir_bg.alias("a"), textstats_bg.alias("b")).collect()
    for r in out:
        assert r["a"] == r["b"], (r["a"], r["b"])


def _write_selection_fixture(spark, out_dir, docs_rows=None, emb_rows=None):
    """Minimal sf-dir layout for the selection suite: only the tables the
    queries under test actually read."""
    if docs_rows is not None:
        spark.createDataFrame(
            docs_rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    if emb_rows is not None:
        spark.createDataFrame(
            emb_rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def test_semantic_decontam_tiebreak_prefers_smallest_eval_id(spark, tmp_path):
    """Two byte-identical eval vectors tie at the same rounded cosine:
    the argmax must report the SMALLER eval_id (the oracle's row_number
    order), which the (cosine, -eval_id) struct max encodes."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
        SEM_DECON_N_EVAL,
        semantic_decontam_flags,
    )

    v = [1.0] + [0.0] * 63
    w = [0.0, 1.0] + [0.0] * 62
    emb = []
    for i in range(SEM_DECON_N_EVAL):
        emb.append((i, v if i in (3, 7) else w, 0))
    emb.append((SEM_DECON_N_EVAL, v, 0))      # corpus vec == evals 3 and 7
    emb.append((SEM_DECON_N_EVAL + 1, w, 0))  # ties across ALL other evals
    _write_selection_fixture(spark, str(tmp_path), emb_rows=emb)
    got = (
        semantic_decontam_flags(spark, str(tmp_path))
        .toPandas()
        .set_index("vec_id")
    )
    assert got.loc[SEM_DECON_N_EVAL].nearest_eval_id == 3
    assert got.loc[SEM_DECON_N_EVAL].max_cosine == 1.0
    assert bool(got.loc[SEM_DECON_N_EVAL].contaminated)
    # the 23-way tie among the w-evals resolves to the smallest id (0)
    assert got.loc[SEM_DECON_N_EVAL + 1].nearest_eval_id == 0


def test_semantic_decontam_empty_eval_set_yields_zero_rows(spark, tmp_path):
    """The review-found degenerate case: no eval-side vectors => the
    oracle's cross join is empty, and the engine must also emit ZERO
    rows (not corpus rows with NULL flags)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import (
        SEM_DECON_N_EVAL,
        semantic_decontam_flags,
    )

    w = [0.0, 1.0] + [0.0] * 62
    emb = [(SEM_DECON_N_EVAL + i, w, 0) for i in range(4)]  # corpus only
    _write_selection_fixture(spark, str(tmp_path), emb_rows=emb)
    assert semantic_decontam_flags(spark, str(tmp_path)).count() == 0


def test_dsir_degenerate_corpora(spark, tmp_path):
    """Single-doc corpus: stddev_samp is NULL, so dsir_z is NULL and
    selected must coalesce to False (the branch the organic corpus never
    hits). Token-less docs are absent from the output entirely."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import dsir_logratio_scores

    docs = [(0, "alpha beta alpha", "en", "s0", 16), (1, "   ", "de", "s0", 3)]
    _write_selection_fixture(spark, str(tmp_path), docs_rows=docs)
    got = dsir_logratio_scores(spark, str(tmp_path)).toPandas()
    # doc 1 is whitespace-only -> no tokens -> absent
    assert list(got.doc_id) == [0]
    row = got.iloc[0]
    assert row.n_feats == 5  # 3 unigrams + 2 bigrams
    assert row.dsir_z != row.dsir_z or row.dsir_z is None  # NaN/None
    assert not bool(row.selected)


def test_dsir_target_lang_env_knob():
    """SPARK_GRAFT_DSIR_TARGET_LANG re-targets the importance model: the
    engine expression, the embedded oracle SQL, and the composed
    selection_pipeline oracle all regrow from the one constant at
    import, so the cross-engine contract must hold at a NON-default
    setting. Prove it in a fresh subprocess (import-time constant) by
    running the full Spark-vs-DuckDB comparison targeted at 'de'."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_DSIR_TARGET_LANG="de")
    out = subprocess.run(
        [sys.executable, "tools/check.py", "/root/testdata/sf0.001",
         "dsir_logratio_scores", "selection_pipeline"],
        env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "2/2 queries match" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_dsir_target_lang_env_validation():
    """The knob is spliced into oracle SQL as a literal, so implausible
    values must be refused at import with a clear message."""
    import subprocess
    import sys
    import os

    code = (
        "import sys; sys.path.insert(0, '.');\n"
        "from reddit_sentiment_spark_streaming_pipeline_spark.operators import selection\n"
    )
    env = dict(os.environ, SPARK_GRAFT_DSIR_TARGET_LANG="en' OR '1'='1")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode != 0
    assert "SPARK_GRAFT_DSIR_TARGET_LANG" in out.stderr


def test_dsir_empty_target_slice_fails_loud(spark, tmp_path):
    """A typo'd target tag passes shape validation but matches no rows;
    the importance model must fail LOUD (assert_true riding the 1-row
    tot broadcast), not silently degenerate to raw counts."""
    import pytest

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.selection import dsir_logratio_scores

    docs = [(0, "alpha beta gamma", "de", "s0", 16),
            (1, "beta gamma delta", "fr", "s0", 16)]
    _write_selection_fixture(spark, str(tmp_path), docs_rows=docs)
    with pytest.raises(Exception, match="DSIR target slice"):
        dsir_logratio_scores(spark, str(tmp_path)).collect()


def test_oracle_of_error_paths():
    """oracle_of must name the module-order contract for unregistered
    names (a composing query importing before its constituent) and
    refuse oracle-less queries explicitly."""
    import pytest

    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    registry.load_all()
    with pytest.raises(ValueError, match="_QUERY_MODULES order"):
        registry.oracle_of("no_such_query_xyz")
    assert "SELECT" in registry.oracle_of("dsir_logratio_scores").upper()
