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


_SYNTH_EXTS = [".jpg", ".png", ".txt", ".wav", ".gif", ".xyz"]


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus: the
    text bytes stand in for the blob (no external data), a rotating
    extension exercises the whole modality map incl. the unknown (.xyz)
    quarantine path. Same shape ``ingest_binary_dir`` produces from a real
    ``binaryFile`` scan."""
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _SYNTH_EXTS]),
        (F.col("doc_id") % len(_SYNTH_EXTS) + 1).cast("int"),
    )
    path = F.concat(F.lit("mem://"), F.col("source"), F.lit("/doc_"),
                    F.col("doc_id"), ext)
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        path.alias("path"),
        modality_col(path).alias("modality"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("length"),
        F.sha2(content, 256).alias("sha256"),
    )


def synth_media_meta_sql() -> str:
    """DuckDB oracle for ``synth_media`` minus the blob column."""
    exts = ", ".join(f"'{e}'" for e in _SYNTH_EXTS)
    cases = " ".join(
        f"WHEN '{e}' THEN '{m}'" for e, m in EXT_MODALITY.items()
    )
    return f"""
WITH m AS (
  SELECT doc_id,
         'mem://' || source || '/doc_' || doc_id ||
           ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS path,
         ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS ext,
         octet_length(encode(text))::BIGINT AS length,
         sha256(text) AS sha256
  FROM documents
)
SELECT doc_id, path,
       CASE ext {cases} ELSE NULL END AS modality,
       length, sha256
FROM m
"""


def frame_sample_sql(every_n: int = 10) -> str:
    """DuckDB oracle for ``frame_sample_plan`` over ``synth_media``."""
    exts = ", ".join(f"'{e}'" for e in _SYNTH_EXTS)
    text_exts = ", ".join(
        f"'{e}'" for e, m in EXT_MODALITY.items() if m == "text"
    )
    return f"""
WITH m AS (
  SELECT 'mem://' || source || '/doc_' || doc_id ||
           ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS path,
         ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS ext,
         octet_length(encode(text)) AS length
  FROM documents
)
SELECT path, unnest(range(0, (length // 1024)::INT + 1, {every_n}))::INT AS frame_no
FROM m WHERE ext NOT IN ({text_exts})
"""


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
