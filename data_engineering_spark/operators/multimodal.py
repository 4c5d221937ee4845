"""Multimodal column plumbing (SURVEY §2.10 north-star: image/audio/video
as opaque binary columns with typed metadata).

Image decode is REAL for the two dependency-free raw-pixel formats —
binary PPM (P6) and uncompressed 24-bit BMP — implemented over numpy
(``decode_image``); compressed formats (JPEG/PNG) would slot in behind
the same dispatch via PIL where available. Audio decode is REAL for PCM
WAV (chunk-walking RIFF parser, ``decode_wav``) with per-frame RMS /
zero-crossing features; compressed codecs and video containers stay a
deterministic digest stand-in (no AV libs in this container), clearly
branched per kind. Everything Spark-side is real and tested: schema,
partition-aware batching via ``mapInPandas``, Arrow batch shapes,
metadata extraction, pixel resize, frame-sampling plumbing.

Scale design: binary payloads ride in parquet as BinaryType. Feature
extraction runs as ``mapInPandas`` so one Arrow batch of (id, bytes) rows
is processed per call — the batch never materializes on the driver, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory.
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media",
    "media_metadata",
    "decode_image",
    "encode_ppm",
    "resize_images",
    "extract_features",
    "sample_frames",
    "encode_wav",
    "decode_wav",
    "synthetic_audio",
    "audio_frame_features",
    "image_ahash",
    "image_hashes",
    "image_near_dup_pairs",
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
    """Deterministic fake media rows for tests. Image rows carry a REAL
    binary-PPM (P6) payload whose pixel bytes come from a seeded sha256
    stream tiled to width×height×3 — so the decode/resize/feature paths
    exercise genuine pixels, and the DuckDB oracle can reconstruct the
    exact payload (header concat + hex-domain repeat/substring, see the
    ``mm_media_metadata`` oracle). Audio/video payloads stay the plain
    repeated-digest stream (no AV decode in this container)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        digest = hashlib.sha256(f"media-{i}".encode()).digest()
        width = 64 + (i % 8) * 16 if kind != "audio" else None
        height = 48 + (i % 8) * 12 if kind != "audio" else None
        if kind == "image":
            npix = width * height * 3
            payload = (
                f"P6\n{width} {height}\n255\n".encode()
                + (digest * ((npix + 31) // 32))[:npix]
            )
        else:
            payload = digest * (4 + i % 4)
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "image": "image/x-portable-pixmap",
                    "audio": "audio/wav",
                    "video": "video/mp4",
                }[kind],
                width,
                height,
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


def _decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6): ASCII header (magic, width, height, maxval,
    '#' comments allowed) then raw RGB rows."""
    # header tokens are whitespace-separated; comments run '#'..newline
    pos, tokens = 2, []
    while len(tokens) < 3:
        m = re.match(rb"(?:\s+|#[^\n]*\n)*([0-9]+)", content[pos:])
        if not m:
            raise ValueError("truncated PPM header")
        tokens.append(int(m.group(1)))
        pos += m.end()
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 PPM supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval
    pix = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def _decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): BGR rows padded to 4
    bytes, bottom-up unless height is negative."""
    if len(content) < 54:
        raise ValueError("truncated BMP")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(content: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB ndarray.

    Dependency-free formats are decoded natively: binary PPM (``P6``)
    and uncompressed 24-bit BMP (``BM``). Anything else raises
    ``ValueError`` — compressed formats (JPEG/PNG) belong behind the
    same dispatch via ``PIL.Image.open(io.BytesIO(content))`` in an
    environment that ships an imaging library."""
    content = bytes(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise ValueError("unsupported image format (need P6 PPM or 24-bit BMP)")


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM — the inverse of
    ``_decode_ppm`` (round-trip asserted in tests)."""
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


_FEATURE_DIM = 8


def _pixel_features(arr: np.ndarray) -> list[float]:
    """8-dim deterministic pixel feature: per-channel means, grayscale
    std, and the four quadrant grayscale means — all in [0, 1]."""
    a = arr.astype(np.float64) / 255.0
    gray = a.mean(axis=2)
    h, w = gray.shape
    h2, w2 = max(1, h // 2), max(1, w // 2)
    quads = [gray[:h2, :w2], gray[:h2, w2:], gray[h2:, :w2], gray[h2:, w2:]]
    return [
        float(a[:, :, 0].mean()),
        float(a[:, :, 1].mean()),
        float(a[:, :, 2].mean()),
        float(gray.std()),
        *[float(q.mean()) if q.size else float(gray.mean()) for q in quads],
    ]


def _digest_features(content: bytes) -> list[float]:
    """Digest-fold stand-in embedding for payloads with no native decoder
    (audio/video in this container)."""
    digest = hashlib.sha256(content).digest()
    vals = struct.unpack("<8f", digest[:32])
    norm = max(sum(abs(v) for v in vals), 1e-9)
    return [float(v) / norm for v in vals]


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Feature extraction over binary media via ``mapInPandas``.

    Decodable images (PPM/BMP) get REAL pixel statistics
    (``_pixel_features``: channel means, grayscale std, quadrant means —
    a deterministic stand-in for a CNN embedding with the same shape
    contract); undecodable payloads fall back to the digest-fold
    embedding. The distributed contract: Arrow record batches in,
    (media_id, feature array<float>) out, executor-local, memory bounded
    by the Arrow batch size rather than the partition size."""

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
                raw = bytes(content)
                try:
                    feats.append(_pixel_features(decode_image(raw)))
                except ValueError:
                    feats.append(_digest_features(raw))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "content").mapInPandas(featurize, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (real decoder would slice the container at these points —
    here the frame payload is a deterministic digest). Uses sequence +
    explode: the fan-out happens distributed, proportional to duration.

    ``explode_outer``, not ``explode``: a video row with NULL
    duration_ms produces a NULL sequence, and plain explode silently
    DROPPED the row — the three-valued-logic vanish class (r12 review;
    same family as scd2's NULL is_current). Such a row now survives as
    one classified (frame_ts_ms NULL, frame_digest NULL) row: visible
    to downstream audits instead of disappearing."""
    frames = (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode_outer(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ),
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
    """REAL image resize over binary payloads via ``mapInPandas``:
    decode (PPM/BMP) → nearest-neighbor index sampling → re-encode PPM.

    The distributed contract is the production one: Arrow batches of
    (media_id, content) in, (media_id, content, width, height) out,
    executor-local memory bounded by batch size. A different
    interpolation (PIL bilinear/Lanczos) swaps into the per-item loop
    without touching partitioning, schema, or batching."""

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
                arr = decode_image(bytes(content))
                ys = np.arange(target_h) * arr.shape[0] // target_h
                xs = np.arange(target_w) * arr.shape[1] // target_w
                out.append(encode_ppm(arr[ys][:, xs]))
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


# ---------------------------------------------------------------------------
# Audio: real PCM WAV codec + frame features (dependency-free)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono int16 samples as a canonical PCM WAV (RIFF) file —
    the inverse of ``decode_wav`` (round-trip asserted in tests)."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV payload to ``(sample_rate, int16 samples)``.

    A real chunk-walking RIFF parser (not an offset guess): skips unknown
    chunks (LIST/INFO etc.) with even-byte padding, validates the fmt
    chunk (PCM, 16-bit), and reads exactly the data chunk's extent.
    Multi-channel audio is downmixed to mono by averaging channels.
    Compressed codecs raise ``ValueError`` — they'd slot in behind the
    same dispatch via an AV library where available."""
    content = bytes(content)
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        if cid in (b"fmt ", b"data") and pos + 8 + size > len(content):
            # a declared size overrunning the payload would silently
            # TRUNCATE body (Python slice semantics) — a corrupted data
            # chunk decoding to silently-shorter audio, features quietly
            # computed over the wrong extent (r12 review). Unknown
            # chunks may still be lazily truncated: they are skipped.
            raise ValueError(
                f"truncated WAV: {cid!r} chunk declares {size} bytes, "
                f"{len(content) - pos - 8} remain"
            )
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV: fmt chunk shorter than 16 bytes")
            fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"only 16-bit PCM WAV supported (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    x = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    if channels and channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
        x = np.round(x).astype(np.int16)
    return sr, x


def synthetic_audio(spark, n: int = 48, sample_rate: int = 8000) -> DataFrame:
    """Deterministic audio rows carrying REAL PCM WAV payloads: sample
    bytes come from the sha256('audio-i') digest tiled to 2×n_samples —
    the same seeded-stream trick the image rows use, so the DuckDB
    oracle can regenerate every int16 sample from the hex digest and
    hash-check real decoded features (see ``mm_audio_features``)."""
    rows = []
    for i in range(n):
        digest = hashlib.sha256(f"audio-{i}".encode()).digest()
        n_samples = 800 * (1 + i % 5)
        data = (digest * ((2 * n_samples + 31) // 32))[: 2 * n_samples]
        rows.append((i, encode_wav(np.frombuffer(data, dtype="<i2"), sample_rate)))
    return spark.createDataFrame(rows, "media_id long, content binary")


def audio_frame_features(df: DataFrame, frame: int = 800) -> DataFrame:
    """Per-frame audio features over binary WAV columns via
    ``mapInPandas``: normalized RMS energy and the zero-crossing count of
    each ``frame``-sample window — the deterministic stand-in for a real
    audio embedding, with the same distributed contract (Arrow batches of
    (id, bytes) in, one row per frame out; executor-local, no shuffle).

    Both features are integer-exact in double precision (sum of int16²
    over ≤2²⁰ samples < 2⁵³), so an oracle can recompute them bit-for-bit
    from the generating stream — that is what upgrades the audio decode
    path to hash-checked rather than rows-only."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, fno, rms, zcr = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                _, x = decode_wav(bytes(content))
                x = x.astype(np.int64)
                for f in range(0, len(x), frame):
                    seg = x[f : f + frame]
                    sgn = seg >= 0
                    mid.append(media_id)
                    fno.append(f // frame)
                    rms.append(round(float(np.sqrt((seg * seg).sum() / len(seg)) / 32768.0), 6))
                    zcr.append(int((sgn[1:] != sgn[:-1]).sum()))
            yield pd.DataFrame(
                {"media_id": mid, "frame_no": fno, "rms": rms, "zero_crossings": zcr}
            )

    return df.select("media_id", "content").mapInPandas(featurize, schema=out_schema)


# ---------------------------------------------------------------------------
# Image near-duplicate detection (perceptual average-hash)
# ---------------------------------------------------------------------------


def image_ahash(arr: np.ndarray) -> int:
    """64-bit perceptual average-hash: grayscale → 8×8 block means →
    threshold at the mean → bit-packed row-major. Robust to small pixel
    edits and re-encodes (the edits move few block means across the
    threshold), unlike the byte-exact md5 fingerprint."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.minimum((np.arange(9) * h) // 8, h)
    xs = np.minimum((np.arange(9) * w) // 8, w)
    blocks = np.empty((8, 8), dtype=np.float64)
    for r in range(8):
        for c in range(8):
            seg = gray[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)]
            blocks[r, c] = seg.mean()
    bits = (blocks >= blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


def image_hashes(df: DataFrame) -> DataFrame:
    """(media_id, ahash) via ``mapInPandas`` over binary image payloads —
    the shuffle-free signature stage of image near-dedup (same contract
    as the text simhash signature build: Arrow batches in, 8 bytes per
    image out; undecodable payloads are skipped, not failed)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, hs = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = decode_image(bytes(content))
                except ValueError:
                    continue
                mid.append(media_id)
                hs.append(image_ahash(arr))
            yield pd.DataFrame({"media_id": mid, "ahash": hs})

    return df.select("media_id", "content").mapInPandas(hash_batch, schema=out_schema)


def image_near_dup_pairs(df: DataFrame, max_hamming: int = 6, bands: int = 8) -> DataFrame:
    """Image near-duplicate pairs: banded blocking over the 64-bit aHash
    (``bands`` runs of ``64/bands`` bits — pigeonhole guarantees any pair
    within ``bands-1`` hamming shares a band), then exact hamming verify
    with ``bit_count(xor)``. Same candidate-generation shape as the text
    simhash path: the join key is (band, band-bits), never the image
    bytes, so at corpus scale only 8-byte signatures shuffle."""
    width = 64 // bands
    mask = (1 << width) - 1
    h = image_hashes(df)
    exploded = h.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("ahash", i * width).bitwiseAND(mask).alias("bh"),
                )
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select("media_id", "ahash", "bb.band", "bb.bh")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
