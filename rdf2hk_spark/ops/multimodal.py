"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-friendly
Arrow batching, mapInPandas signatures, deterministic fake decoders — while
the actual codec calls are stubbed behind ``_HAS_CODECS`` (the image/audio
libraries are not in this container). Swapping in Pillow/torchaudio/ffmpeg is
a one-function change per modality; nothing about the distributed plan moves.

Design for 100 TB of media:
- media rides in parquet/Iceberg BINARY columns next to typed metadata
  (mime, width/height/duration, sha256) so scans prune to metadata-only
  whenever the payload is not needed;
- decode/resize/frame-sample run in ``mapInPandas`` (one Arrow batch per
  call, zero-copy into the decoder) — never per-row Python;
- feature vectors come back as ``array<float>`` ready for the similarity
  operators (ops.similarity).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_HAS_CODECS = False  # real decoders (PIL / torchaudio / av) not in container

MEDIA_SCHEMA = (
    "media_id long, mime string, payload binary, width int, height int,"
    " duration_ms int, sha256 string"
)

FEATURE_SCHEMA = "media_id long, mime string, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame_sha string"


def synthetic_media(spark, n: int, seed: str = "media") -> DataFrame:
    """Deterministic fake media corpus: payload bytes derived from md5 chains
    (stands in for real image/audio bytes; sizes vary by id)."""
    from rdf2hk_spark.ops.hashing import md5_int

    df = spark.range(n).withColumnRenamed("id", "media_id")
    h = md5_int(F.concat(F.lit(seed + ":"), F.col("media_id").cast("string")))
    mime = (
        F.when(F.col("media_id") % 3 == 0, "image/png")
        .when(F.col("media_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    payload = F.encode(
        F.concat(
            F.lit("FAKEMEDIA"),
            F.md5(F.encode(F.concat(F.lit(seed), F.col("media_id").cast("string")), "UTF-8")),
            F.repeat(F.lit("x"), (h % 200 + 32).cast("int")),
        ),
        "UTF-8",
    )
    return df.select(
        "media_id",
        mime.alias("mime"),
        payload.alias("payload"),
        ((h % 640) + 16).cast("int").alias("width"),
        ((h % 480) + 16).cast("int").alias("height"),
        ((h % 60000) + 1000).cast("int").alias("duration_ms"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _decode_stub(payload: bytes, mime: str) -> bytes:
    """Stub decode: a real implementation dispatches on mime to PIL/ffmpeg.
    The deterministic fake returns a digest-expanded pseudo-raster so
    downstream stages exercise real data flow."""
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("wire PIL/torchaudio/av decoders here")
    d = hashlib.sha256(payload).digest()
    return d * 4  # 128 pseudo-pixels


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched). Features are
    deterministic functions of the payload bytes — unit-normalized float32."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                raw = _decode_stub(bytes(payload), mime)
                arr = np.frombuffer(raw, dtype=np.uint8)[: dim * 4]
                v = arr.astype(np.float32).reshape(-1)[:dim]
                if v.size < dim:
                    v = np.pad(v, (0, dim - v.size))
                v = v - v.mean()
                n = np.linalg.norm(v)
                feats.append((v / n if n > 0 else v).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: filters to images, batches payloads through the stub
    resizer, returns (media_id, payload, width, height)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                raw = _decode_stub(bytes(payload), "image/*")
                out.append(raw[: width * height // 64])  # stub "raster"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("mime").startswith("image/")).mapInPandas(
        batches, "media_id long, payload binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing for video: one row per sampled timestamp with a
    deterministic frame digest (a real impl decodes the frame instead)."""
    frames = media.filter(F.col("mime").startswith("video/")).select(
        "media_id",
        "sha256",
        F.explode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int"),
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
        F.md5(
            F.encode(
                F.concat("sha256", F.lit("#"), F.col("frame_idx").cast("string")),
                "UTF-8",
            )
        ).alias("frame_sha"),
    )
