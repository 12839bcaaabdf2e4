"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference stores media as blobs and derives thumbnails/embeddings in a
GPU worker (smse_backend/services/thumbnail.py:100-150, tasks.py:195-259).
Spark-side, media is a ``binary`` column with a metadata struct; decode /
resize / frame-sample are Arrow-batched kernels over ``mapInPandas``.

The heavy codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is stubbed behind ``_decode_image`` (deterministic fake,
clearly marked); the Spark-side plumbing — schema, ingest from
``binaryFile``, batch shapes, partitioning, UDF signatures — is real and
tested. Swapping the stub for PIL is a one-function change on a cluster
that has it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.session import ensure_pyfiles

MEDIA_SCHEMA = (
    "path string, modality string, content binary, length long, sha256 string"
)

# extension -> modality map, verbatim semantics of
# smse_backend/utils/file_extensions.py:13-45
EXT_MODALITY = {
    ".jpg": "image", ".jpeg": "image", ".png": "image", ".gif": "image",
    ".webp": "image",
    ".mp3": "audio", ".wav": "audio", ".ogg": "audio", ".flac": "audio",
    ".txt": "text", ".md": "text", ".pdf": "text",
}


def modality_col(path_col) -> F.Column:
    """extension -> modality lookup (F5), unknown -> null (whitelist P6)."""
    ext = F.lower(F.regexp_extract(path_col, r"(\.[^./\\]+)$", 1))
    mapping = F.create_map(*[F.lit(x) for kv in EXT_MODALITY.items() for x in kv])
    return F.element_at(mapping, ext)


def ingest_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """``binaryFile`` ingest -> media table with modality + sha256 columns.

    Mirrors the reference upload path (routes/content.py:18-104): blob +
    typed row + integrity hash, as one scan. Unknown extensions are kept
    with null modality for a downstream quarantine filter.
    """
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.col("path"),
        modality_col(F.col("path")).alias("modality"),
        F.col("content"),
        F.col("length"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


def _decode_image(buf: bytes) -> np.ndarray:
    """STUB — deterministic fake decoder.

    Real implementation: ``PIL.Image.open(io.BytesIO(buf))``; PIL is not in
    this container. The fake derives a stable 8x8 grayscale "image" from
    the bytes' sha256 so downstream feature math is testable end-to-end.
    """
    h = hashlib.sha256(buf).digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).astype(np.float64)
    return arr.reshape(8, 8)


def image_features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary -> fixed-size feature vector + dims.

    Batch shape contract: one row per media object; the decode loop is
    per-object (images are not row-vectorizable) but everything after the
    decode (normalization, pooling) is batched numpy.
    """
    for pdf in batches:
        if pdf.empty:
            continue
        imgs = np.stack([_decode_image(b) for b in pdf["content"]])
        flat = imgs.reshape(len(pdf), -1)
        mean = flat.mean(axis=1)
        std = flat.std(axis=1)
        normed = (flat - mean[:, None]) / np.where(std > 0, std, 1.0)[:, None]
        yield pd.DataFrame(
            {
                "path": pdf["path"],
                "height": imgs.shape[1],
                "width": imgs.shape[2],
                "features": list(np.round(normed, 6)),
            }
        )


IMAGE_FEATURES_SCHEMA = "path string, height int, width int, features array<double>"


def extract_image_features(media: DataFrame) -> DataFrame:
    """image rows -> (path, height, width, features array<double>)."""
    ensure_pyfiles(media.sparkSession)
    return (
        media.filter(F.col("modality") == "image")
        .select("path", "content")
        .mapInPandas(image_features_kernel, IMAGE_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: (path, frame_no) rows fanned out from
    metadata, ready to drive a decode kernel; deterministic, no codec
    needed. Mirrors the reference's pipeline-config style (tasks.py:69-85)."""
    n_frames = (F.col("length") / 1024).cast("int") + 1  # stub: 1 frame/KiB
    return (
        media.filter(F.col("modality").isNull() | (F.col("modality") != "text"))
        .select(
            "path",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_no"),
        )
    )
