"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched `mapInPandas` stages.

The container has no image/audio codecs, so the *decode* step is stubbed
(`decode_image` raises NotImplementedError; `fake_decode_features` is the
deterministic stand-in) — but everything Spark-side is real and tested:
the binary column construction, the metadata schema, the mapInPandas
batch iterator signature, and the output schema contract.

At 100 TB the payload column dominates I/O: metadata queries must prune it
(parquet column pruning — verified in tests via the scan's ReadSchema), and
decode runs once per partition batch via Arrow, never per row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

_HEX = "0123456789abcdef"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from `documents`: payload = UTF-8 bytes
    of the text (stand-in for image bytes) + typed metadata columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        F.octet_length("text").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """Real codec hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; use fake_decode_features for deterministic tests"
    )


def fake_decode_features(payload: bytes) -> tuple[int, float]:
    """Deterministic decode stand-in: (n_bytes, mean md5 nibble).

    Mirrors what a real extractor would produce (per-item scalar features)
    while staying reproducible in SQL for the oracle.
    """
    digest = hashlib.md5(payload).hexdigest()
    nibbles = [_HEX.index(c) for c in digest]
    return len(payload), sum(nibbles) / len(nibbles)


_FEATURE_SCHEMA = "media_id bigint, n_bytes bigint, mean_nibble double, width int, height int"


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf.payload.map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf.media_id,
                    "n_bytes": feats.map(lambda t: t[0]),
                    "mean_nibble": feats.map(lambda t: round(t[1], 6)),
                    "width": pdf.width,
                    "height": pdf.height,
                }
            )

    return media.mapInPandas(batches, schema=_FEATURE_SCHEMA)


# mean md5 nibble of the payload, reproduced in closed-form SQL (32 terms).
_NIBBLE_SUM = " + ".join(
    f"(instr('{_HEX}', substr(h, {p + 1}, 1)) - 1)" for p in range(32)
)


@register(
    "media_features",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               md5(text)                 AS h,
               octet_length(encode(text))        AS n_bytes,
               CAST(doc_id % 640 + 16 AS INTEGER) AS width,
               CAST(doc_id % 480 + 16 AS INTEGER) AS height
        FROM documents
    )
    SELECT media_id, n_bytes,
           round(({_NIBBLE_SUM}) / 32.0, 6) AS mean_nibble,
           width, height
    FROM m
    """,
    doc="Multimodal plumbing end-to-end: binary payload column → "
    "mapInPandas (Arrow batches) feature extraction; decode stubbed "
    "deterministically, Spark-side schema/batch contract real",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir))


FRAME_CHARS = 256  # frame-sampling stride (characters of the fake payload)

_FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_chars int, frame_hash string"


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampling via mapInPandas: each payload yields one row per
    FRAME_CHARS slice (the video→frames shape — decode stubbed as UTF-8
    slicing, the Arrow batch contract and row-expansion real)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, hashes = [], [], [], []
            for media_id, payload in zip(pdf.media_id, pdf.payload):
                text = bytes(payload).decode("utf-8")
                for k in range((len(text) + FRAME_CHARS - 1) // FRAME_CHARS):
                    frame = text[k * FRAME_CHARS : (k + 1) * FRAME_CHARS]
                    ids.append(media_id)
                    idxs.append(k)
                    sizes.append(len(frame))
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_chars": sizes,
                 "frame_hash": hashes}
            )

    return media.mapInPandas(batches, schema=_FRAME_SCHEMA)


@register(
    "media_frame_samples",
    oracle=f"""
    SELECT doc_id                                   AS media_id,
           CAST(k AS INTEGER)                       AS frame_idx,
           length(substr(text, k * {FRAME_CHARS} + 1, {FRAME_CHARS})) AS frame_chars,
           md5(substr(text, k * {FRAME_CHARS} + 1, {FRAME_CHARS}))    AS frame_hash
    FROM documents,
         LATERAL unnest(range(0, (length(text) + {FRAME_CHARS} - 1) // {FRAME_CHARS})) AS t(k)
    ORDER BY media_id, frame_idx
    """,
    doc="Multimodal 1→N frame sampling: mapInPandas expands each payload "
    "into per-frame rows (frame-sample/resize shape; Arrow batches, no "
    "per-row Python overhead beyond the stubbed decode)",
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no orderBy: the frame table scales with the corpus — don't global-sort it
    return sample_frames(media_table(spark, sf_dir))


@register(
    "media_metadata_stats",
    oracle="""
    SELECT CAST(doc_id % 640 + 16 AS INTEGER) // 100 AS width_bucket,
           count(*)                                   AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT)   AS total_bytes,
           round(avg(octet_length(encode(text))), 6)          AS avg_bytes
    FROM documents
    GROUP BY 1
    ORDER BY width_bucket
    """,
    doc="Metadata-only aggregation — must not read the payload column "
    "(parquet column pruning keeps the heavy bytes out of the scan)",
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.groupBy((F.col("width").cast("int") / 100).cast("int").alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        )
        .orderBy("width_bucket")
    )
