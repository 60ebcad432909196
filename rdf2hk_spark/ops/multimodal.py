"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-friendly
Arrow batching, mapInPandas signatures — and the codec layer is a RUNTIME
probe per modality (``codec_caps()``): when Pillow / soundfile / PyAV are
importable the real decoder runs, otherwise a deterministic digest fake
stands in so the distributed data flow is exercised end-to-end either way.
The probe runs lazily inside the executor-side UDF (module import order and
driver/executor environment splits don't matter); nothing about the
distributed plan moves when a codec appears.

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

_CODEC_CAPS: dict[str, bool] | None = None


def codec_caps() -> dict[str, bool]:
    """Runtime codec probe, one import-try per modality, cached per process
    (runs on each executor the first time a decode UDF batch arrives)."""
    global _CODEC_CAPS
    if _CODEC_CAPS is None:
        caps = {}
        try:
            from PIL import Image  # noqa: F401

            caps["image"] = True
        except Exception:
            caps["image"] = False
        try:
            import soundfile  # noqa: F401

            caps["audio"] = True
        except Exception:
            caps["audio"] = False
        try:
            import av  # noqa: F401

            caps["video"] = True
        except Exception:
            caps["video"] = False
        _CODEC_CAPS = caps
    return _CODEC_CAPS

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


def _decode_fake(payload: bytes) -> bytes:
    """Deterministic digest-expanded pseudo-raster (128 bytes) so downstream
    stages exercise real data flow when no codec is installed."""
    d = hashlib.sha256(payload).digest()
    return d * 4


def _decode(payload: bytes, mime: str, use_codecs: bool | None = None) -> bytes:
    """Decode to raw bytes: real codec when the modality's library is
    importable, deterministic fake otherwise. An installed codec that cannot
    decode the payload raises (corrupt media must surface, not silently
    degrade to the fake). ``use_codecs`` pins the path: False forces the
    fake (synthetic corpora), True demands a real codec, None probes."""
    modality = mime.split("/", 1)[0]
    enabled = codec_caps().get(modality, False) if use_codecs is None else use_codecs
    if not enabled:
        return _decode_fake(payload)
    if modality == "image":
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.convert("L").tobytes()
    if modality == "audio":
        import io

        import soundfile as sf

        data, _sr = sf.read(io.BytesIO(payload), dtype="int16")
        return data.tobytes()
    if modality == "video":  # pragma: no cover - av not in CI container
        import io

        import av

        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                return frame.to_ndarray(format="gray").tobytes()
        raise ValueError("video payload contains no decodable frame")
    return _decode_fake(payload)


def extract_features(
    media: DataFrame, dim: int = 32, use_codecs: bool | None = None
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched). Features are
    deterministic functions of the decoded bytes — unit-normalized float32.
    ``use_codecs``: None probes per executor, False forces the digest fake
    (synthetic corpora), True demands real codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                raw = _decode(bytes(payload), mime, use_codecs)
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


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64,
    use_codecs: bool | None = None,
) -> DataFrame:
    """Resize: filters to images and batches payloads through Pillow when it
    is installed (real LANCZOS resample → raw greyscale raster of exactly
    width×height bytes), else through the deterministic fake raster."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        has_pil = codec_caps()["image"] if use_codecs is None else use_codecs
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                if has_pil:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(bytes(payload))) as im:
                        out.append(
                            im.convert("L")
                            .resize((width, height), Image.LANCZOS)
                            .tobytes()
                        )
                else:
                    raw = _decode_fake(bytes(payload))
                    out.append(raw[: width * height // 64])  # fake "raster"
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
