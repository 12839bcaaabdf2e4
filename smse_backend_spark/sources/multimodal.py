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
    """Decode to a grayscale float64 array.

    PNG bytes get a REAL decode — the pure-stdlib codec in
    `sources/png.py` (zlib inflate + scanline defilter) — and JPEG/JFIF
    bytes get a REAL baseline decode — `sources/jpeg.py` (huffman +
    dequant + IDCT + YCbCr; the reference's DEFAULT image format,
    file_extensions.py:9) — channels averaged to luma in both cases.
    GIF bytes (LZW + palette, `sources/gif.py`) decode for real too.
    Everything else still hits the deterministic sha-fake (8x8 from the
    bytes' sha256): PIL is not in this container, so WebP/TIFF/... remain
    honestly stubbed while the plumbing — binaryFile source, mapInPandas
    batches, feature math — is identical for all branches (and the
    contract's synthetic media never starts with any real signature, so
    its oracle replay is unaffected).
    """
    from smse_backend_spark.sources.gif import GIF_MAGICS, decode_gif
    from smse_backend_spark.sources.jpeg import JPEG_MAGIC, decode_jpeg
    from smse_backend_spark.sources.png import PNG_SIG, decode_png

    if buf[:8] == PNG_SIG:
        img = decode_png(buf)
        return img.astype(np.float64).mean(axis=2)
    if buf[:3] == JPEG_MAGIC:
        img = decode_jpeg(buf)
        return img.astype(np.float64).mean(axis=2)
    if buf[:6] in GIF_MAGICS:
        img = decode_gif(buf)
        return img.astype(np.float64).mean(axis=2)
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
        heights, widths, feats = [], [], []
        # per-row decode + normalize: real images in one Arrow batch can
        # have different dims, so no np.stack across rows (the per-row
        # mean/std math is numerically identical to the old batched
        # axis=1 version — the stub oracle replay is unchanged)
        for b in pdf["content"]:
            img = _decode_image(b)
            flat = img.reshape(-1)
            mean = flat.mean()
            std = flat.std()
            normed = (flat - mean) / (std if std > 0 else 1.0)
            # deterministic half-up rounding (floor(x*1e6+0.5)/1e6): the
            # DuckDB oracle computes the identical formula, so the 6dp
            # values are bit-for-bit equal across engines (np.round's
            # banker's mode is not)
            feats.append(np.floor(normed * 1e6 + 0.5) / 1e6)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        yield pd.DataFrame(
            {
                "path": pdf["path"],
                "height": np.array(heights, dtype=np.int32),
                "width": np.array(widths, dtype=np.int32),
                "features": feats,
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


THUMBNAIL_SCHEMA = "path string, thumb binary, width int, height int"


def derive_thumbnails(media: DataFrame, size: int = 32) -> DataFrame:
    """REAL thumbnail derivation (S13, thumbnail.py:100-150) for PNG and
    JPEG blobs: decode -> PIL-exact fit-crop geometry -> nearest
    resample -> re-encode (JPEG inputs re-encode JPEG q85, the
    reference's output format; PNG inputs re-encode PNG), all inside one
    ``mapInPandas`` pass — the sink a media pipeline writes next to the
    original. Other image rows are passed over (no silent fake
    thumbnails).

    Scale shape: pure per-row map over the binaryFile scan — no shuffle,
    no driver involvement; thumbnail bytes are ~size² and write out as
    an ordinary binary column.
    """
    ensure_pyfiles(media.sparkSession)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smse_backend_spark.sources.gif import GIF_MAGICS, decode_gif
        from smse_backend_spark.sources.jpeg import (
            JPEG_MAGIC,
            encode_jpeg_rgb,
            thumbnail_jpeg,
        )
        from smse_backend_spark.sources.png import PNG_SIG, thumbnail_png

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for p, b in zip(pdf["path"], pdf["content"]):
                bb = bytes(b)
                if bb[:8] == PNG_SIG:
                    rows.append((p, thumbnail_png(bb, size)))
                elif bb[:3] == JPEG_MAGIC:
                    rows.append((p, thumbnail_jpeg(bb, size)))
                elif bb[:6] in GIF_MAGICS:
                    # GIF in -> JPEG q85 thumb out (the reference's
                    # thumbnail service always emits JPEG)
                    img = fit_resize_nearest(decode_gif(bb), size, size)
                    rows.append((p, encode_jpeg_rgb(
                        np.ascontiguousarray(img, dtype=np.uint8))))
            yield pd.DataFrame(
                {
                    "path": [r[0] for r in rows],
                    "thumb": [r[1] for r in rows],
                    "width": np.full(len(rows), size, dtype=np.int32),
                    "height": np.full(len(rows), size, dtype=np.int32),
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("path", "content")
        .mapInPandas(_kernel, THUMBNAIL_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "path string, sample_rate int, n_samples long, duration_s double, "
    "rms double, zcr double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio features for WAV/PCM blobs (`sources/wav.py` stdlib
    decode): (path, sample_rate, n_samples, duration_s, rms, zcr) —
    duration/energy/zero-crossing, each half-up 6 dp quantized. Non-RIFF
    audio rows are skipped loudly absent (no fake numbers).
    """
    ensure_pyfiles(media.sparkSession)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smse_backend_spark.sources.wav import RIFF_MAGIC, audio_features

        for pdf in batches:
            if pdf.empty:
                continue
            out = [
                dict(path=p, **audio_features(bytes(b)))
                for p, b in zip(pdf["path"], pdf["content"])
                if bytes(b)[:4] == RIFF_MAGIC
            ]
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "sample_rate", "n_samples", "duration_s",
                    "rms", "zcr",
                ],
            )

    return (
        media.filter(F.col("modality") == "audio")
        .select("path", "content")
        .mapInPandas(_kernel, AUDIO_FEATURES_SCHEMA)
    )


def extract_image_features_rows(media: DataFrame) -> DataFrame:
    """:func:`extract_image_features` flattened to scalar rows for the
    driver compare: (path, height, width, pos, value) — the harness
    canonicalizer cannot sort array cells."""
    feats = extract_image_features(media)
    return feats.select(
        "path", "height", "width", F.posexplode("features").alias("pos", "value")
    ).select("path", "height", "width", F.col("pos").cast("int").alias("pos"), "value")


_IMAGE_SYNTH_EXTS = [e for e in _SYNTH_EXTS if EXT_MODALITY.get(e) == "image"]


def image_features_rows_sql() -> str:
    """DuckDB oracle for ``extract_image_features_rows`` over ``synth_media``.

    Replays the stub decoder exactly: the fake 8x8 image's 64 bytes are the
    sha256 digest of the blob repeated twice, read here from the hex string
    two nibbles at a time. mean/std/normalize/round all use formulas whose
    double arithmetic is bit-identical to the numpy kernel (integer inputs,
    exact sums, correctly-rounded division/sqrt, explicit floor(x*1e6+0.5)).
    """
    exts = ", ".join(f"'{e}'" for e in _SYNTH_EXTS)
    img_exts = ", ".join(f"'{e}'" for e in _IMAGE_SYNTH_EXTS)
    return f"""
WITH m AS (
  SELECT 'mem://' || source || '/doc_' || doc_id ||
           ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS path,
         ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS ext,
         sha256(text) AS hx
  FROM documents
),
b AS (
  SELECT path, r.i,
         ((strpos('0123456789abcdef', substr(hx, ((r.i % 32) * 2) + 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(hx, ((r.i % 32) * 2) + 2, 1)) - 1))::DOUBLE AS v
  FROM m, range(0, 64) r(i)
  WHERE ext IN ({img_exts})
),
mu AS (SELECT path, avg(v) AS mean FROM b GROUP BY path),
sd AS (
  SELECT path, any_value(mean) AS mean,
         sqrt(avg((v - mean) * (v - mean))) AS std
  FROM (SELECT b.path, b.v, mu.mean FROM b JOIN mu USING (path))
  GROUP BY path
)
SELECT b.path, 8::INT AS height, 8::INT AS width, b.i::INT AS pos,
       floor(((b.v - sd.mean) / (CASE WHEN sd.std > 0 THEN sd.std ELSE 1 END))
             * 1000000.0 + 0.5) / 1000000.0 AS value
FROM b JOIN sd USING (path)
"""


# ---------------------------------------------------------------------------
# thumbnail derivation (S13): reference crop/resize geometry on the stub
# ---------------------------------------------------------------------------

# DEFAULT_THUMBNAIL_SIZE / quality of the reference's PIL worker
# (smse_backend/services/thumbnail.py:30-35, :135 ImageOps.fit LANCZOS)
THUMB_W, THUMB_H = 320, 180
_THUMB_RATIO = THUMB_W / THUMB_H


def fit_crop_box(
    in_w: float, in_h: float, out_w: int = THUMB_W, out_h: int = THUMB_H,
    centering: tuple[float, float] = (0.5, 0.5),
) -> tuple[float, float, float, float]:
    """PIL ``ImageOps.fit`` crop-box arithmetic, replicated exactly
    (thumbnail.py:135 calls it with centering (0.5, 0.5), bleed 0): crop the
    source to the output aspect ratio (centered), then resize to size.

    Returns the float crop box (left, top, right, bottom) that PIL would
    pass to ``Image.resize(size, box=...)``.
    """
    live_ratio = in_w / in_h
    output_ratio = out_w / out_h
    if live_ratio >= output_ratio:
        crop_w, crop_h = output_ratio * in_h, in_h
    else:
        crop_w, crop_h = in_w, in_w / output_ratio
    left = (in_w - crop_w) * centering[0]
    top = (in_h - crop_h) * centering[1]
    return (left, top, left + crop_w, top + crop_h)


def fit_resize_nearest(
    img: np.ndarray, out_w: int = THUMB_W, out_h: int = THUMB_H
) -> np.ndarray:
    """Aspect-preserving center-crop + resize on a decoded array.

    The crop geometry is PIL's (:func:`fit_crop_box`, reference-faithful);
    the resample is nearest-at-pixel-center standing in for LANCZOS — the
    codec-quality part of the stub, clearly substituted (PIL absent here).
    """
    in_h, in_w = img.shape[:2]
    left, top, right, bottom = fit_crop_box(in_w, in_h, out_w, out_h)
    xs = left + (np.arange(out_w) + 0.5) * (right - left) / out_w
    ys = top + (np.arange(out_h) + 0.5) * (bottom - top) / out_h
    xi = np.clip(np.floor(xs).astype(np.int64), 0, in_w - 1)
    yi = np.clip(np.floor(ys).astype(np.int64), 0, in_h - 1)
    return img[np.ix_(yi, xi)]


def media_thumbnail_plan(media: DataFrame) -> DataFrame:
    """Per-image thumbnail derivation plan: synthetic source dims (the stub
    decoder has no real header to read) + the exact PIL crop box + output
    size. Pure Column algebra — drives :func:`fit_resize_nearest` kernels
    without touching the blobs; mirrors thumbnail.py:120-150.
    """
    in_w = (F.lit(64) + F.col("length") % 193).cast("int")
    in_h = (F.lit(64) + F.col("length") % 121).cast("int")
    ratio = in_w / in_h
    crop_w = F.when(ratio >= F.lit(_THUMB_RATIO), F.lit(_THUMB_RATIO) * in_h).otherwise(
        in_w.cast("double")
    )
    crop_h = F.when(ratio >= F.lit(_THUMB_RATIO), in_h.cast("double")).otherwise(
        in_w / F.lit(_THUMB_RATIO)
    )
    left = (in_w - crop_w) * 0.5
    top = (in_h - crop_h) * 0.5
    return media.filter(F.col("modality") == "image").select(
        "path",
        in_w.alias("in_w"),
        in_h.alias("in_h"),
        left.alias("crop_left"),
        top.alias("crop_top"),
        (left + crop_w).alias("crop_right"),
        (top + crop_h).alias("crop_bottom"),
        F.lit(THUMB_W).alias("out_w"),
        F.lit(THUMB_H).alias("out_h"),
    )


def media_thumbnail_plan_sql() -> str:
    """DuckDB oracle for :func:`media_thumbnail_plan` over ``synth_media``
    (raw doubles, no rounding: every op is correctly-rounded IEEE on integer
    inputs, so both engines produce bit-identical values)."""
    exts = ", ".join(f"'{e}'" for e in _SYNTH_EXTS)
    img_exts = ", ".join(f"'{e}'" for e in _IMAGE_SYNTH_EXTS)
    # explicit ::DOUBLE — DuckDB parses a bare decimal literal as DECIMAL(18)
    r = f"({_THUMB_RATIO!r}::DOUBLE)"
    return f"""
WITH m AS (
  SELECT 'mem://' || source || '/doc_' || doc_id ||
           ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS path,
         ([{exts}])[(doc_id % {len(_SYNTH_EXTS)})::INT + 1] AS ext,
         octet_length(encode(text))::BIGINT AS length
  FROM documents
),
d AS (
  SELECT path, (64 + length % 193)::INT AS in_w, (64 + length % 121)::INT AS in_h
  FROM m WHERE ext IN ({img_exts})
),
c AS (
  SELECT path, in_w, in_h,
         CASE WHEN in_w / in_h >= {r} THEN {r} * in_h ELSE in_w::DOUBLE END AS crop_w,
         CASE WHEN in_w / in_h >= {r} THEN in_h::DOUBLE ELSE in_w / {r} END AS crop_h
  FROM d
)
SELECT path, in_w, in_h,
       (in_w - crop_w) * 0.5 AS crop_left,
       (in_h - crop_h) * 0.5 AS crop_top,
       (in_w - crop_w) * 0.5 + crop_w AS crop_right,
       (in_h - crop_h) * 0.5 + crop_h AS crop_bottom,
       {THUMB_W} AS out_w, {THUMB_H} AS out_h
FROM c
"""


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
