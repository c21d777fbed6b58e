"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` payloads plus a typed metadata
struct — the lakehouse-native layout for multimodal training data. The
test lake has no real media, so a deterministic multimodal view is
derived from ``documents``: payload = UTF-8 bytes of the text,
media_type = doc_id mod 3, and the metadata struct carries real byte
lengths plus hash-derived fake dimensions.

What is REAL here (and tested): the schema contract, the JVM-side
metadata path, and the Arrow-batched ``mapInPandas`` decode pipeline —
batch shapes, output schema, partition behavior. What is STUBBED: the
actual pixel/sample decode, behind ``decode_payload`` which raises
``NotImplementedError`` unless ``fake=True`` (the image/audio libs are
not in this image). Swapping in a real decoder changes one function.

Reference analogue: none (bpaotu is tabular-only); this is the mandated
LLM-pipeline extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

MEDIA_TYPES = ("image", "audio", "video")

DECODED_SCHEMA = (
    "asset_id bigint, media_type string, n_bytes int, width int, height int, "
    "n_frames int, checksum string"
)


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (asset_id, media_type, payload binary, meta struct)."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            # hash-derived fake dimensions: deterministic, no media libs
            (F.crc32(payload) % 1920).cast("int").alias("width"),
            (F.crc32(payload) % 1080).cast("int").alias("height"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# multimodal_meta — per-media-type stats over the typed metadata (pure
# JVM path; proves the binary+struct schema carries through groupBy).
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    oracle="""
WITH m AS (
  SELECT
    doc_id AS asset_id,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      AS media_type,
    octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT media_type,
  count(*) AS n_assets,
  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
  CAST(round(sum(CAST(n_bytes AS DECIMAL(18,6))) / count(n_bytes), 4) AS DOUBLE) AS avg_bytes,
  max(n_bytes) AS max_bytes
FROM m GROUP BY media_type
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = multimodal_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(
            F.sum(F.col("meta.n_bytes").cast("decimal(18,6)"))
            / F.count("meta.n_bytes"),
            4,
        )
        .cast("double")
        .alias("avg_bytes"),
        # bigint: the oracle's octet_length() is BIGINT; match its width
        F.max("meta.n_bytes").cast("bigint").alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# decode pipeline — Arrow-batched mapInPandas. The decode itself is a
# stub; the Spark-side plumbing (batch iteration, schema, vectorized
# checksum) is real and is what the tests exercise.
# ---------------------------------------------------------------------------


def decode_payload(payload: bytes, media_type: str, fake: bool = False):
    """Decode one media payload → (width, height, n_frames).

    STUB: real decoding needs PIL/ffmpeg (not in this image). With
    ``fake=True`` returns deterministic hash-derived dimensions so the
    pipeline around it can be exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg; pass fake=True for the "
            "deterministic test double"
        )
    import zlib

    h = zlib.crc32(payload)
    n_frames = 1 if media_type == "image" else (h % 240) + 1
    return (h % 1920, h % 1080, n_frames)


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: binary payloads → typed decode results.

    Arrow moves each partition in vectorized batches; the Python side
    sees pandas DataFrames, the JVM side sees a normal DataFrame with
    ``DECODED_SCHEMA`` — this is the pattern a real decoder drops into.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            dims = [
                decode_payload(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(batches, schema=DECODED_SCHEMA)


@register("multimodal_decode")  # no oracle: Pandas-UDF path, rows-only check
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_assets(multimodal_table(spark, sf_dir), fake=True)


# ---------------------------------------------------------------------------
# resize / frame-sample / feature-extract — the three transform stages
# a multimodal training pipeline runs after decode. Same contract as
# decode: the pixel/sample math is a deterministic stub, the Spark
# plumbing (Arrow batches, schemas, explode shapes, partitioning) is
# real and tested.
# ---------------------------------------------------------------------------

RESIZE_TARGET = 224

RESIZED_SCHEMA = (
    "asset_id bigint, media_type string, src_w int, src_h int, "
    "out_w int, out_h int, scale double"
)


def resize_assets(decoded: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Fit-within-target resize geometry. Pure JVM arithmetic over the
    decoded dims — resize *geometry* never needs Python; only the pixel
    resample (stubbed inside a real decoder) does. Map-only: no
    shuffle, rides whatever partitioning decode produced."""
    scale = F.when(
        F.greatest("width", "height") > target,
        target / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "asset_id",
        "media_type",
        F.col("width").alias("src_w"),
        F.col("height").alias("src_h"),
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


FRAME_STEP = 30  # sample one frame per step (≈1 fps at 30 fps video)

FRAMES_SCHEMA = "asset_id bigint, frame_idx int, frame_key string"


def sample_frames(decoded: DataFrame, step: int = FRAME_STEP) -> DataFrame:
    """Frame sampling: videos explode to one row per sampled frame
    (sequence + explode — JVM-side, no Python). The frame payload
    extraction is the stubbed part (frame_key stands in for the frame
    bytes); the row explosion IS the real shape: output rows scale with
    total video seconds, and downstream stages partition on asset_id."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(step))
    return (
        decoded.filter(F.col("media_type") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
        .select(
            "asset_id",
            "frame_idx",
            F.md5(F.concat_ws(":", "asset_id", "frame_idx")).alias("frame_key"),
        )
    )


FEATURE_DIM = 8

FEATURES_SCHEMA = "asset_id bigint, media_type string, feature array<float>"


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature extraction via Arrow-batched mapInPandas: payload bytes →
    FEATURE_DIM float vector (deterministic hash stub standing in for a
    vision/audio encoder). The output column is the same
    ``array<float>`` shape the ANN operators consume, so the chain
    multimodal → features → ann_*_topk runs end-to-end."""
    import hashlib

    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                v = np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(
                    np.float32
                )
                feats.append(((v - 127.5) / 127.5).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(batches, schema=FEATURES_SCHEMA)


@register("multimodal_resize")  # rows-only: consumes the stubbed decode dims
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_assets(multimodal_decode(spark, sf_dir))


@register("multimodal_frame_sample")  # rows-only: consumes stubbed decode dims
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(multimodal_decode(spark, sf_dir))


@register("multimodal_features")  # rows-only: Pandas-UDF path
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(multimodal_table(spark, sf_dir))
