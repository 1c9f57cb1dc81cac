"""Text analysis + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import multimodal as mm
from reddit_sentiment_spark_streaming_pipeline_spark.operators import textstats as ts


def test_token_stats_consistency(spark, sf_dir):
    df = ts.token_stats(spark, sf_dir).toPandas()
    assert (df.n_distinct <= df.n_tokens).all()
    assert (df.avg_token_len > 0).all()


def test_quality_scores_bounds(spark, sf_dir):
    df = ts.quality_scores(spark, sf_dir).toPandas()
    assert df.stopword_ratio.between(0, 1).all()
    assert df.punct_ratio.between(0, 1).all()
    assert df.quality_score.between(0, 1).all()


def test_lang_id_deterministic_argmax(spark, sf_dir):
    df = ts.lang_id_scores(spark, sf_dir).toPandas()
    assert df.predicted_lang.isin(list(ts.LANG_MARKERS)).all()
    assert (df.marker_hits >= 0).all()


def test_fingerprint_is_order_sensitive(spark, tmp_path):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma", "gamma beta alpha", "alpha beta gamma"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    fp = {r.doc_id: r.fingerprint for r in ts.doc_fingerprints(spark, str(tmp_path)).collect()}
    assert fp[1] == fp[3]  # identical text → identical fingerprint
    assert fp[1] != fp[2]  # same bag of words, different order → different


def test_decode_image_rejects_unsupported_container():
    # decode_image is a real dispatcher now (PNG/PGM, r6); containers
    # whose codecs this environment doesn't ship fail loudly
    with pytest.raises(ValueError):
        mm.decode_image(b"bytes")


def test_media_features_match_scalar_stub(spark, sf_dir):
    rows = mm.media_features(spark, sf_dir).orderBy("media_id").limit(5).collect()
    media = mm.media_table(spark, sf_dir).orderBy("media_id").limit(5).collect()
    for r, m in zip(rows, media):
        n, mean = mm.fake_decode_features(bytes(m.payload))
        assert r.n_bytes == n
        assert r.mean_nibble == round(mean, 6)


def test_metadata_query_prunes_payload_column(spark, sf_dir, tmp_path):
    # materialize the media table (payload stored as a real binary column),
    # then check a metadata-only agg never reads the payload bytes
    out = str(tmp_path / "media.parquet")
    mm.media_table(spark, sf_dir).write.parquet(out)
    stored = spark.read.parquet(out)
    agg = stored.groupBy("mime").agg(F.sum("n_bytes").alias("total_bytes"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "payload" not in read_schema, f"payload column not pruned: {read_schema}"
    assert "n_bytes" in read_schema and "mime" in read_schema


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    from pyspark.sql import functions as F
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import (
        PACK_BUDGET,
        sequence_packing,
        token_stats,
    )

    packed = sequence_packing(spark, sf_dir).toPandas()
    total = token_stats(spark, sf_dir).agg(F.sum("n_tokens")).first()[0]
    # every token lands in exactly one bin
    assert packed.n_tokens.sum() == total
    # tolerance, not equality: Spark rounds HALF_UP, numpy half-even, and
    # n/512 lands exactly on .xxx5 boundaries
    assert (packed.fill - packed.n_tokens / PACK_BUDGET).abs().max() <= 5.1e-7
    # bins are contiguous from 0 within each (source, shard) lane
    for (_, _), lane in packed.groupby(["source", "shard"]):
        bins = sorted(lane.bin.tolist())
        assert bins[0] == 0
        assert all(b2 - b1 <= 1 for b1, b2 in zip(bins, bins[1:]))


def test_winnowing_exact_dups_share_fingerprints(spark, sf_dir):
    """The MOSS guarantee, exercised end-to-end on the documents table:
    identical token streams produce identical fingerprint sets, and the
    fingerprint set is a genuine compression of the k-gram hashes."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.winnowing import (
        WINNOW_W,
        winnowing_fingerprints,
    )

    fps = winnowing_fingerprints(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(fps) > 0
    full = fps[fps.n_kgrams >= WINNOW_W]
    assert (full.n_fingerprints >= 1).all()
    assert (full.n_fingerprints <= full.n_kgrams).all()
    # winnowing keeps ~1/W of hashes: require real compression on docs
    # long enough for the ratio to be meaningful
    long = fps[fps.n_kgrams >= 10 * WINNOW_W]
    if len(long):
        assert (long.n_fingerprints <= long.n_kgrams * 0.8).all()


def test_unigram_logprob_scores_semantics(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import token_stats
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.winnowing import unigram_logprob_scores

    lp = unigram_logprob_scores(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(lp) > 0
    # log-probs of a proper distribution are negative; ratios are shares
    assert (lp.mean_logprob < 0).all()
    assert lp.rare_ratio.between(0, 1).all()
    # token accounting agrees with token_stats
    ts = token_stats(spark, sf_dir).toPandas().set_index("doc_id")
    assert (lp.n_tokens == ts.loc[lp.index].n_tokens).all()


def test_winnowing_overlap_pairs_consistent_with_fingerprints(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.winnowing import (
        WINNOW_MIN_SHARED,
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    pairs = winnowing_overlap_pairs(spark, sf_dir).toPandas()
    fps = winnowing_fingerprints(spark, sf_dir).toPandas().set_index("doc_id")
    assert (pairs.doc_a < pairs.doc_b).all()
    assert (pairs.n_shared >= WINNOW_MIN_SHARED).all()
    # a pair can share at most as many fingerprints as either doc has
    for r in pairs.itertuples():
        cap = min(fps.loc[r.doc_a].n_fingerprints, fps.loc[r.doc_b].n_fingerprints)
        assert r.n_shared <= cap


def test_winnowing_moss_recall_guarantee_on_planted_runs(spark, tmp_path):
    """The winnowing selection guarantee, end-to-end on a crafted corpus:
    two docs sharing a long-enough common token run MUST share selected
    fingerprints (Schleimer et al. 2003, Thm: any match of length
    >= w + k - 1 is caught); docs with disjoint vocabulary share none."""
    import pandas as pd

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.winnowing import (
        WINNOW_K,
        WINNOW_W,
        winnowing_overlap_pairs,
    )

    # a shared run long enough to yield several shared window-minima
    # (comfortably above the WINNOW_MIN_SHARED=2 reporting threshold)
    run = " ".join(f"shared{i}" for i in range(4 * (WINNOW_W + WINNOW_K)))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma " + run + " delta epsilon",
                "omega psi chi phi " + run + " upsilon tau",
                # disjoint vocabulary: must share nothing with anyone
                " ".join(f"lonely{i}" for i in range(60)),
                " ".join(f"hermit{i}" for i in range(60)),
            ],
            "lang": ["en"] * 4,
            "source": ["test"] * 4,
            "n_chars": [0, 0, 0, 0],
        }
    )
    sf_dir = str(tmp_path)
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    pairs = winnowing_overlap_pairs(spark, sf_dir).toPandas()
    found = {(r.doc_a, r.doc_b) for r in pairs.itertuples()}
    assert (1, 2) in found, f"planted shared run not recalled: {pairs}"
    assert all(a not in (3, 4) and b not in (3, 4) for a, b in found), pairs


def test_per_source_top_docs_selects_max_quality(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import (
        per_source_top_docs,
        quality_scores,
    )
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    top = per_source_top_docs(spark, sf_dir).toPandas()
    assert (top.groupby("source").size() <= 3).all()
    assert (top.rk.between(1, 3)).all()
    # rank 1 really is that source's max quality score
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").toPandas()
    q = quality_scores(spark, sf_dir).toPandas()[["doc_id", "quality_score"]]
    joined = docs.merge(q, on="doc_id")
    best = joined.groupby("source").quality_score.max()
    for r in top[top.rk == 1].itertuples():
        assert r.quality_score == best[r.source]


def test_stratified_quota_sample_respects_quotas(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import stratified_quota_sample

    pdf = stratified_quota_sample(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_by_lang = docs.groupby("lang").size()
    for lang, g in pdf.groupby("lang"):
        q = 40 if lang == "en" else 20
        # exact quota when the stratum is large enough, never above it
        assert len(g) <= q
        if n_by_lang[lang] >= 3 * q:
            assert len(g) == q
        assert sorted(g.sample_rank) == list(range(1, len(g) + 1))
    # deterministic: a second run yields the identical sample
    pdf2 = stratified_quota_sample(spark, sf_dir).toPandas()
    assert pdf.sort_values(["lang", "sample_rank"]).reset_index(drop=True).equals(
        pdf2.sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    )


def test_gopher_flags_compose_into_keep(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import gopher_quality_flags

    pdf = gopher_quality_flags(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(pdf) == docs.count()
    # keep is exactly the conjunction of no-rule-fired
    fired = (
        pdf.too_few_words | pdf.too_many_words | pdf.bad_mean_word_len
        | pdf.low_alpha_frac | pdf.low_stopword_hits
    )
    assert (pdf.keep == ~fired).all()
    assert pdf.alpha_word_frac.between(0, 1).all()
    assert (pdf.stopword_hits <= 8).all()


def test_fertility_at_least_one_token_per_word(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import tokenizer_fertility_by_lang

    for r in tokenizer_fertility_by_lang(spark, sf_dir).collect():
        # the BPE-ish pre-tokenizer can only split words, never merge them
        assert r.fertility >= 1.0
        assert r.chars_per_token > 0


def test_length_band_keeps_at_least_ninety_percent_minus_ties(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats import length_band_filter

    for r in length_band_filter(spark, sf_dir).collect():
        assert r.p5 <= r.p95
        # p5/p95 band keeps ~90% of rows; on a discrete column each tail
        # can exclude up to one extra boundary doc, hence the -2 slack
        assert r.n_kept >= 0.9 * r.n_total - 2
