"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension (BASELINE.json).  The container has no image/audio
codecs, so the *decode kernels are stubs* (deterministic fakes /
NotImplementedError, clearly marked below); the Spark-side plumbing —
schema (schemas.MEDIA_ASSETS), Arrow batch shape, ``mapInPandas``
signatures, partition strategy — is real and tested.

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; Arrow moves
them to Python zero-ish-copy in batches.  ``mapInPandas`` (iterator of
batches) rather than a scalar UDF so a real decoder can amortize model/
codec setup per partition, and so ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds peak memory when payloads are megabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Set True only in environments that actually ship codecs (PIL, ffmpeg...).
REAL_DECODERS_AVAILABLE = False

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, sha256 string, "
    "feature array<float>"
)

THUMBNAIL_SCHEMA = "asset_id long, thumb_width int, thumb_height int, thumbnail binary"

FRAME_SCHEMA = "asset_id long, frame_index int, frame_ms long, frame binary"


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode→embed kernel: a deterministic feature vector derived
    from the payload digest.  Replaces a real (image/audio) encoder —
    same signature, same batch shape, stable across runs/partitions."""
    d = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in d[:dim]]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract each asset via ``mapInPandas``.

    Input must carry (asset_id, modality, payload).  Batches stream
    through the Python worker; per-batch vectorized digesting stands in
    for a real encoder's batched forward pass.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Thumbnail images.  STUB: real codecs absent; raises unless
    :data:`REAL_DECODERS_AVAILABLE`.  The plumbing (filter to images,
    mapInPandas, binary-out schema) is the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not REAL_DECODERS_AVAILABLE:
            raise NotImplementedError(
                "image resize requires an image codec (PIL) not present in "
                "this container; plumbing is real, kernel is stubbed"
            )
        for pdf in batches:  # pragma: no cover - real-codec path
            yield pdf

    return (
        df.where(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=THUMBNAIL_SCHEMA)
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample video frames every ``every_ms``.  Deterministic fake: emits
    one stub 'frame' (payload digest) per sampled timestamp based on the
    duration_ms metadata — exercising the 1-in / N-out explode shape a
    real ffmpeg kernel would have."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_index": [],
                "frame_ms": [],
                "frame": [],
            }
            for _, row in pdf.iterrows():
                duration = int(row["duration_ms"] or 0)
                payload = row["payload"] or b""
                for i, ms in enumerate(range(0, max(duration, 1), every_ms)):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_index"].append(i)
                    out["frame_ms"].append(ms)
                    out["frame"].append(
                        hashlib.sha256(payload + str(ms).encode()).digest()
                    )
            yield pd.DataFrame(out)

    return (
        df.where(F.col("modality") == "video")
        .select("asset_id", "payload", "duration_ms")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )
