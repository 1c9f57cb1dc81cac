"""Similarity search: brute-force cosine top-k, LSH buckets, centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators import similarity as sim


def test_cosine_topk_shape_and_bounds(spark, sf_dir):
    df = sim.cosine_topk(spark, sf_dir).toPandas()
    assert set(df.query_id.unique()) == set(range(sim.N_QUERIES))
    assert df.groupby("query_id").size().eq(sim.TOP_K).all()
    assert df.cosine.between(-1.000001, 1.000001).all()
    # per query, ranks are 1..K and cosine non-increasing along rank
    for _, g in df.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, sim.TOP_K + 1))
        assert (g.cosine.diff().dropna() <= 0).all()


def test_cosine_topk_excludes_self(spark, sf_dir):
    df = sim.cosine_topk(spark, sf_dir)
    assert df.filter(F.col("query_id") == F.col("vec_id")).count() == 0


def test_ann_results_subset_of_bucket(spark, sf_dir):
    exact = sim.cosine_topk(spark, sf_dir).toPandas()
    ann = sim.ann_lsh_topk(spark, sf_dir).toPandas()
    # ANN returns ≤ K per query and its hits are a subset of corpus scored
    assert ann.groupby("query_id").size().le(sim.TOP_K).all()
    # recall sanity: ANN's top hit should appear in exact top-k often;
    # require at least one overlap per query at this tiny scale
    for qid, g in ann.groupby("query_id"):
        overlap = set(g.vec_id) & set(exact[exact.query_id == qid].vec_id)
        assert overlap, f"ANN bucket for query {qid} shares nothing with exact top-k"


def test_bucket_histogram_partitions_corpus(spark, sf_dir):
    hist = sim.lsh_bucket_histogram(spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert hist.n_vectors.sum() == n
    assert hist.bucket.between(0, 2**sim.LSH_BITS - 1).all()


def test_no_python_udf_in_vector_plans(spark, sf_dir):
    for q in (sim.cosine_topk, sim.ann_lsh_topk, sim.embedding_norms):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, f"{q.__name__} fell off the JVM path"


def test_embedding_near_dup_recall(spark, sf_dir):
    """Found pairs must be exactly (source, perturbed-copy) pairs; recall of
    the single-table 4-bit LSH is imperfect but every hit is a true dup."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity import embedding_near_dups

    got = embedding_near_dups(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got.vec_b - got.vec_a == 1000000).all()  # no false positives
    assert (got.cosine >= 0.99).all()


def test_semantic_dedup_prunes_planted_pairs(spark, sf_dir):
    pdf = sim.semantic_dedup_prune(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = {
        r.vec_id + 1000000
        for r in emb.filter(F.col("vec_id") % 10 == 0).select("vec_id").collect()
    }
    assert (pdf.exemplar_cosine >= sim.COSINE_DUP_THRESHOLD).all()
    assert (pdf.exemplar_id < pdf.pruned_id).all()
    # the corpus is organic below ~0.51 cosine, so ONLY planted copies can
    # cross the 0.99 bar — and each must be pruned against its own source
    assert set(pdf.pruned_id) <= planted
    pruned_planted = pdf[pdf.pruned_id.isin(planted)]
    # a copy escapes only if the tiny perturbation lands it in a different
    # coarse cluster than its source; that must stay the rare exception
    assert len(pruned_planted) >= 0.9 * len(planted)
    assert (pruned_planted.exemplar_id == pruned_planted.pruned_id - 1000000).all()


def test_semantic_dedup_pairs_share_cluster(spark, sf_dir):
    pdf = sim.semantic_dedup_prune(spark, sf_dir).toPandas()
    # cid is the cluster of BOTH endpoints (pairs are discovered inside a
    # cluster only), so every cid is a valid coarse-centroid id
    assert pdf.cid.between(0, sim.N_CENTROIDS - 1).all()
    # greedy keep-lowest-id: an exemplar may itself appear as pruned only
    # via a lower id, never via itself
    assert not (pdf.exemplar_id == pdf.pruned_id).any()


def test_rp_simhash_finds_planted_jitter_pairs(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity import embedding_rp_simhash_dups
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    n_planted = load_table(spark, sf_dir, "embeddings").filter(
        "vec_id % 5 = 0"
    ).count()
    rows = embedding_rp_simhash_dups(spark, sf_dir).collect()
    recovered = {(r.vec_a, r.vec_b) for r in rows if r.vec_b == r.vec_a + 1000000}
    # ±1-milli jitter flips a sign bit only where |dot| is tiny: at least
    # 60% of the planted every-5th pairs must survive banding + the
    # Hamming<=2 verify (a recall collapse must fail, not slip through)
    assert len(recovered) >= 0.6 * n_planted
    for r in rows:
        assert 0 <= r.hamming <= 2


def test_decode_pgm_parses_reference_bytes():
    import numpy as np

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_pgm

    raster = bytes(range(12))
    buf = b"P5\n4 3\n255\n" + raster
    w, h, maxval, px = decode_pgm(buf)
    assert (w, h, maxval) == (4, 3, 255)
    assert np.array_equal(px, np.frombuffer(raster, dtype=np.uint8))


def test_pgm_payloads_are_decodable_after_parquet_roundtrip(spark, sf_dir, tmp_path):
    # binary fidelity through a real sink: write the payload column to
    # parquet, read it back, decode — dims must match the metadata cols
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_pgm, pgm_media_table

    path = str(tmp_path / "pgm")
    pgm_media_table(spark, sf_dir).limit(20).write.mode("overwrite").parquet(path)
    for row in spark.read.parquet(path).collect():
        w, h, maxval, px = decode_pgm(row.payload)
        assert (w, h) == (row.w, row.h)
        assert maxval == 255 and len(px) == w * h


def test_decode_wav_parses_reference_bytes():
    import numpy as np

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype="<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    rate, px = decode_wav(hdr + data)
    assert rate == 8000
    assert np.array_equal(px, samples)


def test_wav_payloads_decodable_after_parquet_roundtrip(spark, sf_dir, tmp_path):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_wav, wav_media_table

    path = str(tmp_path / "wav")
    wav_media_table(spark, sf_dir).limit(20).write.mode("overwrite").parquet(path)
    for row in spark.read.parquet(path).collect():
        rate, px = decode_wav(row.payload)
        assert rate == 8000 and len(px) == row.n_samples


def test_decode_y4m_parses_reference_bytes():
    import numpy as np

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_y4m

    f0 = bytes(range(12))
    f1 = bytes(range(100, 112))
    buf = b"YUV4MPEG2 W4 H3 F25:1 Ip A1:1 Cmono\n" + b"FRAME\n" + f0 + b"FRAME\n" + f1
    w, h, frames = decode_y4m(buf)
    assert (w, h) == (4, 3) and len(frames) == 2
    assert np.array_equal(frames[0], np.frombuffer(f0, dtype=np.uint8))
    assert np.array_equal(frames[1], np.frombuffer(f1, dtype=np.uint8))


def test_y4m_payloads_decodable_after_parquet_roundtrip(spark, sf_dir, tmp_path):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_y4m, y4m_media_table

    path = str(tmp_path / "y4m")
    y4m_media_table(spark, sf_dir).limit(12).write.mode("overwrite").parquet(path)
    for row in spark.read.parquet(path).collect():
        w, h, frames = decode_y4m(row.payload)
        assert (w, h) == (8, 6) and len(frames) == row.n_frames


def test_dup_frame_groups_planted_pools(spark, sf_dir):
    """Every 5th video's frame 0 comes from a 3-raster shared pool, so the
    dup groups are exactly the non-singleton pools and each group's size
    equals its pool's membership."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import dup_frame_groups
    from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

    got = dup_frame_groups(spark, sf_dir).toPandas()
    assert len(got) <= 3  # one group per shared raster key (media_id % 3)
    assert (got.n_media >= 2).all()
    assert (got.n_frames == got.n_media).all()  # one shared frame per video
    expected = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .groupBy((F.col("doc_id") % 3).alias("pool"))
        .count()
        .toPandas()
    )
    exp_sizes = sorted(int(c) for c in expected["count"] if c >= 2)
    assert sorted(int(c) for c in got.n_media) == exp_sizes


def test_audio_fingerprint_gain_invariance(spark, sf_dir):
    """Planted pool members are the same recording at x1 vs x2 gain; the
    transition fingerprint must be IDENTICAL within a pool (exact
    integer-inequality invariance, not tolerance)."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
        decode_wav,
        wav_dup_media_table,
    )

    rows = (
        wav_dup_media_table(spark, sf_dir)
        .filter(F.col("media_id") % 7 == 0)
        .select("media_id", "payload")
        .collect()
    )
    import numpy as np

    fps = {}
    for r in rows:
        rate, samples = decode_wav(r.payload)
        assert len(samples) == 128
        s = samples.astype(np.int64)
        e = (s * s).reshape(8, 16).sum(axis=1)
        fp = "".join(
            "3" if e[k] > 2 * e[k - 1] else
            "2" if e[k] > e[k - 1] else
            "1" if 2 * e[k] > e[k - 1] else "0"
            for k in range(1, 8)
        )
        fps.setdefault((r.media_id // 7) % 2, set()).add(fp)
        # gains actually differ within a pool: amplitudes at gain 2 are
        # exactly double those at gain 1, so raw bytes differ
    assert len(fps) == 2
    for pool, got in fps.items():
        assert len(got) == 1, f"pool {pool} fingerprints diverged: {got}"


def test_image_dhash_brightness_invariance(spark, sf_dir):
    """Planted pool members are the same picture at +0/+32/+64 exposure;
    the dHash must be identical within a pool while raw bytes differ."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
        decode_pgm,
        pgm_dup_media_table,
    )

    rows = (
        pgm_dup_media_table(spark, sf_dir)
        .filter(F.col("media_id") % 6 == 0)
        .select("media_id", "payload")
        .collect()
    )
    pools = {}
    rasters = {}
    for r in rows:
        w, h, maxval, pixels = decode_pgm(r.payload)
        assert (w, h) == (9, 8)
        grid = pixels.reshape(h, w)
        fp = "".join(map(str, (grid[:, :-1] < grid[:, 1:]).astype(int).flatten()))
        pool = (r.media_id // 6) % 3
        pools.setdefault(pool, set()).add(fp)
        rasters.setdefault(pool, set()).add(bytes(pixels.tobytes()))
    assert len(pools) == 3
    for pool, fps in pools.items():
        assert len(fps) == 1, f"pool {pool} hashes diverged"
        # exposures genuinely differ: multiple distinct byte rasters
        assert len(rasters[pool]) > 1, f"pool {pool} rasters all identical"


def test_audio_fingerprint_matches_contains_planted_pools(spark, sf_dir):
    """The registered query's output must contain both planted pools:
    a group at (n_windows=8, pool fp) with n_media >= the pool size."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
        decode_wav,
        audio_fingerprint_matches,
        wav_dup_media_table,
    )
    import numpy as np

    got = audio_fingerprint_matches(spark, sf_dir).toPandas()
    rows = (
        wav_dup_media_table(spark, sf_dir)
        .filter(F.col("media_id") % 7 == 0)
        .select("media_id", "payload")
        .collect()
    )
    pool_fp, pool_n = {}, {}
    for r in rows:
        _, samples = decode_wav(r.payload)
        s = samples.astype(np.int64)
        e = (s * s).reshape(8, 16).sum(axis=1)
        fp = "".join(
            "3" if e[k] > 2 * e[k - 1] else
            "2" if e[k] > e[k - 1] else
            "1" if 2 * e[k] > e[k - 1] else "0"
            for k in range(1, 8)
        )
        pool = (r.media_id // 7) % 2
        pool_fp[pool] = fp
        pool_n[pool] = pool_n.get(pool, 0) + 1
    assert len(pool_fp) == 2
    for pool, fp in pool_fp.items():
        hit = got[(got.n_windows == 8) & (got.fp == fp)]
        assert len(hit) == 1, f"pool {pool} group missing from output"
        assert int(hit.n_media.iloc[0]) >= pool_n[pool]


def _reference_png(pixels, w, h, filters) -> bytes:
    """Independent PNG writer for decoder tests: COMPRESSED deflate
    stream via zlib.compress (the engine's builder emits only stored
    blocks, so this exercises the decoder against the other class of
    valid zlib stream), with reference-implementation filtering."""
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    for r in range(h):
        t = filters[r]
        raw.append(t)
        for x in range(w):
            cur = pixels[r * w + x]
            left = pixels[r * w + x - 1] if x > 0 else 0
            up = pixels[(r - 1) * w + x] if r > 0 else 0
            ul = pixels[(r - 1) * w + x - 1] if (r > 0 and x > 0) else 0
            if t == 0:
                v = cur
            elif t == 1:
                v = (cur - left) % 256
            elif t == 2:
                v = (cur - up) % 256
            elif t == 3:
                v = (cur - (left + up) // 2) % 256
            else:
                v = (cur - paeth(left, up, ul)) % 256
            raw.append(v)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filters_against_reference_writer():
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_png

    w, h = 7, 5
    pixels = [(13 * i + 101) % 256 for i in range(w * h)]
    for filters in ([0, 1, 2, 3, 4], [4, 4, 4, 4, 4], [3, 0, 1, 2, 3]):
        buf = _reference_png(pixels, w, h, filters)
        dw, dh, px, dec_filters = decode_png(buf)
        assert (dw, dh) == (w, h)
        assert list(px) == pixels
        assert dec_filters == filters


def test_decode_png_rejects_corruption():
    import pytest

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import decode_png

    buf = bytearray(_reference_png([10, 20, 30, 40], 2, 2, [0, 1]))
    # flip one byte inside the IDAT body: the chunk CRC must catch it
    idat_at = bytes(buf).index(b"IDAT")
    bad = bytearray(buf)
    bad[idat_at + 6] ^= 0x01
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00garbage")


def test_decode_image_dispatches_by_signature(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
        decode_image,
        pgm_media_table,
        png_media_table,
    )

    import pytest

    png_row = png_media_table(spark, sf_dir).limit(1).collect()[0]
    w, h, px = decode_image(png_row.payload)
    assert (w, h) == (png_row.w, png_row.h) and len(px) == w * h
    pgm_row = pgm_media_table(spark, sf_dir).limit(1).collect()[0]
    w, h, px = decode_image(pgm_row.payload)
    assert (w, h) == (pgm_row.w, pgm_row.h) and len(px) == w * h
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 not actually jpeg")


def test_png_payloads_decodable_after_parquet_roundtrip(spark, sf_dir, tmp_path):
    # the payload must survive a real parquet write/read as a binary
    # column — the 100 TB storage path — not just in-memory rows
    from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
        decode_png,
        png_media_table,
    )

    out = str(tmp_path / "png_media")
    png_media_table(spark, sf_dir).limit(20).write.parquet(out)
    for row in spark.read.parquet(out).collect():
        w, h, px, filters = decode_png(row.payload)
        assert (w, h) == (row.w, row.h)
        assert len(px) == w * h
        assert filters == [r % 5 for r in range(h)]


def test_cos_bucket_cap_exemplar_chaining(spark):
    """A duplicate flood (more same-bucket vectors than MAX_COS_BUCKET)
    must not silently swallow overflow members: the lowest 64 vec_ids
    expand pairwise, and every member past the cap gets exactly one
    (bucket-min, member) exemplar pair — so the flood stays one
    connected component at O(1) pairs per overflow member. The r9
    jitter-flood rehearsal measured planted copies vanishing entirely
    under the pure cap (high vec_ids sort last in every band), which is
    the failure mode this pins down."""
    from pyspark.sql import functions as F

    from reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity import (
        MAX_COS_BUCKET,
        _cos_candidate_pairs,
    )

    n = MAX_COS_BUCKET + 16  # 80 identical vectors -> one bucket per band
    base = [float((i % 7) - 3) or 1.0 for i in range(64)]
    c = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(x) for x in base]).alias("ce"),
        )
        .withColumn("nrm", F.lit(1.0))  # unused by the candidate stage
    )
    pairs = _cos_candidate_pairs(c).collect()
    got = {(r.vec_a, r.vec_b) for r in pairs}
    kept = set(range(MAX_COS_BUCKET))
    expect = {(a, b) for a in kept for b in kept if a < b} | {
        (0, m) for m in range(MAX_COS_BUCKET, n)
    }
    assert got == expect
    # every flood member — capped or overflow — appears in some pair
    assert {v for p in got for v in p} == set(range(n))


def test_cos_band_bits_env_widening():
    """The production path past the 2^23-vector ceiling is raising
    SPARK_GRAFT_COS_BAND_BITS to ceil(log2(2 N_max)) — and the claimed
    invariant is that the cross-engine contract survives ANY width,
    because the plane pool, the engine's band hashes, and the embedded
    oracle SQL all regrow from the same constant at import. Prove it at
    a non-default width: a fresh subprocess (import-time constant) runs
    the full Spark-vs-DuckDB comparison at 26 bits."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_COS_BAND_BITS="26")
    out = subprocess.run(
        [sys.executable, "tools/check.py", "/root/testdata/sf0.001",
         "embedding_near_dups"],
        env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "1/1 queries match" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_cos_band_bits_env_validation():
    """The sizing knob is validated at import: ≥31 wraps Spark SQL's
    32-bit shiftleft bucket mask, so out-of-range and non-integer values
    must fail loud with the bound in the message, not silently
    mis-bucket (or raise an opaque int() ValueError)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for bad in ("31", "7", "abc"):
        out = subprocess.run(
            [sys.executable, "-c",
             "import reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity"],
            env=dict(os.environ, SPARK_GRAFT_COS_BAND_BITS=bad),
            capture_output=True, text=True, timeout=120, cwd=repo,
        )
        assert out.returncode != 0, bad
        assert "SPARK_GRAFT_COS_BAND_BITS" in out.stderr, out.stderr[-1000:]
        assert "8..30" in out.stderr, out.stderr[-1000:]


def test_semantic_decontam_matches_bruteforce(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from reddit_sentiment_spark_streaming_pipeline_spark.operators import selection as sel

    got = sel.semantic_decontam_flags(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    M = np.array(emb.embedding.tolist(), dtype=np.float64)
    ids = emb.vec_id.to_numpy()
    is_ev = ids < sel.SEM_DECON_N_EVAL
    E, C = M[is_ev], M[~is_ev]
    eids, cids = ids[is_ev], ids[~is_ev]
    sims = np.round(
        (C @ E.T)
        / np.sqrt((C * C).sum(1)[:, None] * (E * E).sum(1)[None, :]),
        6,
    )
    # argmax: highest cosine, smallest eval_id on ties — scan eval ids
    # ascending and keep the first strict improvement
    order = np.argsort(eids)
    best_cos = sims[:, order].max(1)
    best_eid = eids[order][np.argmax(sims[:, order], axis=1)]
    want = pd.DataFrame(
        {"vec_id": cids, "exp_cos": best_cos, "exp_eid": best_eid}
    )
    m = got.merge(want, on="vec_id", how="outer")
    assert len(m) == len(got) == (~is_ev).sum()
    assert np.allclose(m.max_cosine, m.exp_cos, atol=1e-9)
    assert (m.nearest_eval_id == m.exp_eid).all()
    assert (m.contaminated == (m.max_cosine >= sel.SEM_DECON_TAU)).all()


def test_semantic_decontam_plan_is_map_only(spark, sf_dir):
    from reddit_sentiment_spark_streaming_pipeline_spark.operators import selection as sel

    plan = (
        sel.semantic_decontam_flags(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus side must never key-shuffle: only the explicit spread()
    # round-robin plus the one-row eval broadcast are allowed
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
