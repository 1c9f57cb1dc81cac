"""Dedup suite: exact, MinHash+LSH, n-gram Jaccard ground truth, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import dedup as dd


def test_exact_dup_groups_are_the_synthesized_ones(spark, sf_dir):
    groups = dd.exact_dup_groups(spark, sf_dir).toPandas()
    # one group per every-10th doc, each of size 2, surviving id = original
    assert (groups.n_docs == 2).all()
    assert (groups.min_doc_id < 1000000).all()
    stats = dd.dedup_survivor_stats(spark, sf_dir).first()
    assert stats.n_removed == len(groups)
    assert stats.n_total == stats.n_unique + stats.n_removed


def test_lsh_finds_synthesized_near_dups(spark, sf_dir):
    pairs = dd.minhash_near_dups(spark, sf_dir).toPandas()
    # every exact dup (identical signature) and tail-append near-dup must pair
    # classify against the *original* doc (doc_a < 1e6): (8, 1000008) is an
    # exact pair, but (1000008, 2000008) also differs by 1e6 and is not
    exact_pairs = pairs[(pairs.doc_a < 1000000) & (pairs.doc_b == pairs.doc_a + 1000000)]
    near_pairs = pairs[(pairs.doc_a < 1000000) & (pairs.doc_b == pairs.doc_a + 2000000)]
    assert len(exact_pairs) > 0 and (exact_pairs.jaccard == 1.0).all()
    assert len(near_pairs) > 0 and (near_pairs.jaccard >= 0.5).all()


def test_lsh_recall_vs_ground_truth(spark, sf_dir):
    truth = {
        (r.doc_a, r.doc_b) for r in dd.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    found = {
        (r.doc_a, r.doc_b) for r in dd.minhash_near_dups(spark, sf_dir).collect()
    }
    assert found <= truth  # verification step guarantees no false positives
    recall = len(found & truth) / max(len(truth), 1)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9"


def test_simhash_identical_docs_have_zero_hamming(spark, sf_dir):
    pairs = dd.simhash_near_dups(spark, sf_dir).toPandas()
    exact = pairs[(pairs.doc_a < 1000000) & (pairs.doc_b == pairs.doc_a + 1000000)]
    assert len(exact) > 0 and (exact.hamming == 0).all()


def test_simhash_chunks_are_16bit(spark, sf_dir):
    fp = dd.simhash_fingerprints(spark, sf_dir)
    mm = fp.agg(
        *[F.min(f"h{c}").alias(f"lo{c}") for c in range(4)],
        *[F.max(f"h{c}").alias(f"hi{c}") for c in range(4)],
    ).first()
    for c in range(4):
        assert 0 <= mm[f"lo{c}"] and mm[f"hi{c}"] <= 65535


def test_lsh_bucket_cap_bounds_pathological_buckets(spark):
    # 1,000 byte-identical docs: every doc lands in the same bucket in every
    # band. Uncapped that expands C(1000,2)=499,500 pairs on one reducer;
    # the cap keeps MAX_LSH_BUCKET docs per signature-ordered bucket window
    # (identical signatures here, so doc_id order) for PAIRWISE expansion,
    # and every overflow member gets exactly one exemplar pair with its
    # sort-PREDECESSOR (r10: a path, so chained pairs verify against their
    # nearest neighbor even in family-mixed buckets) — the flood stays one
    # connected component at C(cap,2) + (n - cap) total pairs instead of
    # silently losing 936 members (the pre-r9 behavior).
    n = 1000
    corpus = spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("identical text repeated across every single document here").alias("text"),
    )
    cand = dd.minhash_candidates(corpus)
    cap = dd.MAX_LSH_BUCKET
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    kept = set(range(cap))
    expect = {(a, b) for a in kept for b in kept if a < b} | {
        (m - 1, m) for m in range(cap, n)
    }
    assert got == expect
    # every flood member — capped or overflow — appears in some pair
    assert {d for p in got for d in p} == set(range(n))


def test_simhash_overflow_chains_to_sort_predecessor(spark):
    """Over-cap SimHash buckets chain each overflow member to its
    FINGERPRINT-sort predecessor (r10): in a degenerate 16-bit-chunk
    bucket mixing two unrelated near-dup families, the previous
    bucket-min chain head belonged to one family, so every chained
    member of the OTHER family failed the Hamming verify and was
    silently lost (the r10 template-spam flood rehearsal measured
    6/4495 flood members lost at 10x). With the sorted path each family
    sorts contiguously, chained pairs verify against their
    Hamming-nearest neighbor, and each family stays one connected
    component — while no cross-family pair survives the verify."""
    rows = []
    for i in range(80):
        # family A on even ids, family B on odd ids: a bucket-global-min
        # chain head (doc 0, family A) would orphan over-cap B members
        rows.append((2 * i, 7777, 1000, 1000, 1000 + (i % 2)))
        rows.append((2 * i + 1, 7777, 40000, 40000, 40000 + (i % 2)))
    fp = spark.createDataFrame(
        rows, "doc_id int, h0 int, h1 int, h2 int, h3 int"
    )
    pairs = dd.simhash_pair_rows(fp).collect()
    assert pairs
    # the shared h0 chunk buckets both families together (160 > cap), but
    # only within-family pairs survive the Hamming verify
    assert all(r.doc_a % 2 == r.doc_b % 2 for r in pairs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(r.doc_a)] = find(r.doc_b)
    comps: dict[int, set[int]] = {}
    for d in range(160):
        comps.setdefault(find(d), set()).add(d)
    assert sorted(len(c) for c in comps.values()) == [80, 80]


def test_lsh_cap_does_not_bind_on_normal_corpus(spark, sf_dir):
    # On the organic corpus every bucket is far below the cap, so capped and
    # effectively-uncapped candidate sets are identical (the r2 hash must
    # not change).
    import reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup as dmod

    orig = dmod.MAX_LSH_BUCKET
    cand_capped = dd.minhash_candidates(dd.dedup_corpus(spark, sf_dir)).toPandas()
    try:
        dmod.MAX_LSH_BUCKET = 1_000_000
        cand_raw = dd.minhash_candidates(dd.dedup_corpus(spark, sf_dir)).toPandas()
    finally:
        dmod.MAX_LSH_BUCKET = orig
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].values.tolist()))
    assert key(cand_capped) == key(cand_raw)


def test_containment_tail_construction_is_fully_contained(spark, sf_dir):
    """Every 7th doc is re-added with a 3-token tail: the original's
    shingle set is a strict subset of the variant's, so containment of
    the original in the variant must be exactly 1.0 (and the variant in
    the original strictly below 1)."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import containment_pairs

    rows = containment_pairs(spark, sf_dir).toPandas()
    base = rows.doc_a < 1_000_000  # doc_a is an original, not a construction
    tail_pairs = rows[base & (rows.doc_b == rows.doc_a + 2_000_000)]
    assert len(tail_pairs) > 0
    assert (tail_pairs.cont_a_in_b == 1.0).all()
    assert (tail_pairs.cont_b_in_a < 1.0).all()
    # exact-dup construction: containment 1.0 both directions
    exact_pairs = rows[base & (rows.doc_b == rows.doc_a + 1_000_000)]
    assert len(exact_pairs) > 0
    assert (exact_pairs.cont_a_in_b == 1.0).all()
    assert (exact_pairs.cont_b_in_a == 1.0).all()


def test_dedup_recall_eval_semantics(spark, sf_dir):
    """Precision is 1.0 by construction (LSH pairs are exact-Jaccard
    verified, so every reported pair is true); recall is bounded by
    (n_hits / n_true) consistency and must catch the exact-dup pairs,
    whose identical signatures collide in every band."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import dedup_recall_eval

    r = dedup_recall_eval(spark, sf_dir).collect()[0]
    assert r.n_true > 0
    assert r.precision == 1.0
    assert r.n_hits <= r.n_true and r.n_hits == r.n_lsh
    assert 0 < r.recall <= 1.0


def test_payload_simhash_finds_byte_level_dups(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import (
        HAMMING_THRESHOLD,
        payload_simhash_dups,
    )

    pdf = payload_simhash_dups(spark, sf_dir).toPandas()
    assert (pdf.hamming <= HAMMING_THRESHOLD).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_exact = docs.filter((docs.doc_id % 10) == 0).count()
    # byte-identical payloads hash identically: every exact resubmit pairs
    # with its original at hamming 0
    zero = pdf[pdf.hamming == 0]
    planted_exact = set(
        r.doc_id for r in docs.filter((docs.doc_id % 10) == 0).select("doc_id").collect()
    )
    got_exact = {
        (a, b) for a, b in zip(zero.doc_a, zero.doc_b)
        if b - 1000000 == a and a in planted_exact
    }
    assert len(got_exact) == n_exact
    # appended-tail edits stay within the hamming budget at byte level:
    # most +2M tailed docs pair with their source
    tailed = pdf[(pdf.doc_b >= 2000000) & (pdf.doc_a == pdf.doc_b - 2000000)]
    n_tailed = docs.filter((docs.doc_id % 7) == 0).count()
    assert len(tailed) >= 0.8 * n_tailed


def test_segment_prevalence_counts_consistent(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import segment_dedup_prevalence

    rows = segment_dedup_prevalence(spark, sf_dir).collect()
    assert rows, "planted duplicates guarantee shared segments"
    for r in rows:
        assert r.n_docs >= 2 and r.n_occurrences >= r.n_docs


def test_boilerplate_ratio_bounds(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.curation import boilerplate_segment_stats

    rows = boilerplate_segment_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_boilerplate <= r.n_segments
        assert 0 < r.boilerplate_ratio <= 1


def test_repeated_ngram_spans_cover_planted_exact_dups(spark, sf_dir):
    """Every planted exact-dup doc (doc_id % 10 == 0 copied to +1000000)
    shares ALL its windows with its copy, so both sides must surface one
    span covering the whole tokenized doc (when it has >= SPAN_NGRAM
    words); the near-dup tail copies (+2000000) share their long prefix."""
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup import (
        SPAN_NGRAM,
        dedup_corpus,
        repeated_ngram_spans,
    )
    from pyspark.sql import functions as F

    spans = repeated_ngram_spans(spark, sf_dir).toPandas()
    assert (spans.span_end - spans.span_start == spans.span_words).all()
    assert (spans.span_words >= SPAN_NGRAM).all()
    # whole-doc coverage for the exact-dup copies
    lens = (
        dedup_corpus(spark, sf_dir)
        .filter(F.col("doc_id") >= 1000000)
        .filter(F.col("doc_id") < 2000000)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .filter(F.col("n") >= SPAN_NGRAM)
        .toPandas()
    )
    merged = spans.groupby("doc_id").agg({"span_start": "min", "span_end": "max"})
    for _, r in lens.iterrows():
        assert r.doc_id in merged.index, f"no span for exact-dup copy {r.doc_id}"
        assert merged.loc[r.doc_id, "span_start"] == 0
        assert merged.loc[r.doc_id, "span_end"] == r.n


def test_prefix_block_overflow_chains_to_exemplar(spark):
    """A prefix block larger than 64 docs used to be DROPPED entirely
    (zero pairs for the whole flood); now 64 docs per head-ordered block
    window expand pairwise and every overflow member chains to its
    head-sort predecessor (identical heads here, so doc_id order), so
    the flood stays one connected component — mirroring the LSH bucket
    caps' sorted exemplar chain."""
    n = 70
    corpus = spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("the same normalized head text in every flood document").alias("text"),
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.prefix_editdist_pairs(corpus).collect()
    }
    kept = set(range(64))
    expect = {(a, b) for a in kept for b in kept if a < b} | {
        (m - 1, m) for m in range(64, n)
    }
    assert got == expect
    assert {d for p in got for d in p} == set(range(n))
