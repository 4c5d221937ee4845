"""Multimodal column plumbing (SURVEY §2.10 north-star: image/audio/video
as opaque binary columns with typed metadata).

The decode step is STUBBED (image/audio libraries are not in this
container — see ``decode_image``); everything Spark-side is real and
tested: schema, partition-aware batching via ``mapInPandas``, Arrow batch
shapes, metadata extraction, frame-sampling plumbing.

Scale design: binary payloads ride in parquet as BinaryType. Feature
extraction runs as ``mapInPandas`` so one Arrow batch of (id, bytes) rows
is processed per call — the batch never materializes on the driver, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media",
    "media_metadata",
    "decode_image",
    "resize_images",
    "extract_features",
    "sample_frames",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows for tests: content bytes are a
    seeded digest stream, metadata is derived from the id."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 4)
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 8) * 16 if kind != "audio" else None,
                48 + (i % 8) * 12 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_metadata(df: DataFrame, digest: str = "md5") -> DataFrame:
    """Pure-expression metadata pass: payload size, content digest,
    aspect ratio. No Python in the loop.

    ``digest="md5"`` (default) emits the portable content fingerprint;
    ``digest="hex"`` emits the raw payload hex instead — used by the
    oracle-checked registry query because DuckDB cannot hash BLOBs
    (md5/sha256 there are VARCHAR-only) and the synthetic payloads are
    small enough to compare verbatim."""
    dig = (
        F.hex("content").alias("content_hex")
        if digest == "hex"
        else F.md5("content").alias("content_md5")
    )
    return df.select(
        "media_id",
        "kind",
        "mime",
        F.length("content").alias("n_bytes"),
        dig,
        F.when(
            F.col("height").isNotNull() & (F.col("height") > 0),
            F.round(F.col("width") / F.col("height"), 4),
        ).alias("aspect"),
    )


def decode_image(content: bytes) -> "object":
    """STUB — image decode requires PIL/libjpeg, not present in this
    container. The real implementation returns an ndarray (H, W, C);
    everything downstream consumes only shapes/bytes so the pipeline is
    testable without it."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; wire PIL.Image.open(io.BytesIO(content)) here"
    )


_FEATURE_DIM = 8


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Feature extraction over binary media via ``mapInPandas``.

    The per-item featurizer is a deterministic digest fold (stands in for
    a CNN/spectrogram embedding — the container has no decoder libs); the
    distributed contract is real: Arrow record batches in, (media_id,
    feature array<float>) out, executor-local, memory bounded by the Arrow
    batch size rather than the partition size."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                digest = hashlib.sha256(bytes(content)).digest()
                vals = struct.unpack("<8f", digest[:32])
                norm = max(sum(abs(v) for v in vals), 1e-9)
                feats.append([float(v) / norm for v in vals])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "content").mapInPandas(featurize, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (real decoder would slice the container at these points —
    here the frame payload is a deterministic digest). Uses sequence +
    explode: the fan-out happens distributed, proportional to duration."""
    frames = (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))),
        )
        .select(
            "media_id",
            "frame_ts_ms",
            # digest over (payload hex || ts): string-domain md5 so any
            # engine can recompute it (DuckDB's md5 is VARCHAR-only)
            F.md5(
                F.concat(F.hex("content"), F.col("frame_ts_ms").cast("string"))
            ).alias("frame_digest"),
        )
    )
    return frames


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image resize over binary payloads via ``mapInPandas``.

    The pixel transform is stubbed (no PIL in this container — the fake
    emits a deterministic digest of (content, target size) as the resized
    payload) but the distributed contract is the production one: Arrow
    batches of (media_id, content) in, (media_id, content, width, height)
    out, executor-local memory bounded by batch size. Wire
    ``decode_image`` + ``PIL.Image.resize`` + re-encode into the loop for
    the real thing; partitioning, schema, and batching do not change."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                fake = hashlib.sha256(
                    bytes(content) + f"{target_w}x{target_h}".encode()
                ).digest()
                out.append(fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(resize, schema=out_schema)
    )
