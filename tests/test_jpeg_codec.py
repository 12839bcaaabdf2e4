"""Pure-stdlib baseline JPEG codec + real decode through the Spark
media path (mirrors tests/test_png_codec.py for the reference's DEFAULT
image format — utils/file_extensions.py:9 allows jpg,jpeg)."""

from __future__ import annotations

import numpy as np
import pytest

from smse_backend_spark.sources.jpeg import (
    JPEG_SIG,
    decode_jpeg,
    encode_jpeg_rgb,
    thumbnail_jpeg,
)


def _det_rgb(h, w, seed=7):
    """Deterministic noisy 'image': gradients + hash-ish texture."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + seed) % 256
    g = (y * 11 + x // 3) % 256
    b = (x * y + seed * 13) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _smooth_rgb(h, w):
    """Low-frequency image — the content JPEG reconstructs accurately."""
    y, x = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(x / 15)).astype(np.uint8)
    g = (128 + 100 * np.cos(y / 12)).astype(np.uint8)
    b = (128 + 60 * np.sin((x + y) / 20)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


@pytest.mark.parametrize("quality,subsample,tol", [
    (95, False, 4), (85, False, 6), (85, True, 12),
])
def test_roundtrip_smooth_within_quantization(quality, subsample, tol):
    """Lossy but bounded: a smooth image survives encode->decode within
    a few grey levels (the quantization error of the scaled Annex K
    tables); dims exact including non-multiple-of-8 / of-16."""
    for h, w in [(40, 56), (21, 35), (16, 16)]:
        img = _smooth_rgb(h, w)
        dec = decode_jpeg(encode_jpeg_rgb(img, quality, subsample))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (h, w, err.max())


def test_flat_image_lossless_at_q100():
    img = np.full((24, 24, 3), 128, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_rgb(img, 100)), img)


def test_encode_deterministic():
    img = _det_rgb(32, 48)
    assert encode_jpeg_rgb(img, 85) == encode_jpeg_rgb(img, 85)
    assert encode_jpeg_rgb(img, 85)[:2] == JPEG_SIG


def test_subsampled_stream_declares_420_and_is_smaller():
    img = _det_rgb(32, 48)
    full = encode_jpeg_rgb(img, 85, subsample=False)
    sub = encode_jpeg_rgb(img, 85, subsample=True)
    assert len(sub) < len(full)
    # SOF0 sampling byte of component 1: 0x22 in the 4:2:0 stream
    i = sub.find(b"\xff\xc0")
    assert sub[i + 11] == 0x22 and full[i + 11] == 0x11


def test_decode_rejects_unsupported_loudly():
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"notajpeg")
    buf = bytearray(encode_jpeg_rgb(_det_rgb(8, 8), 85))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(buf))


def test_byte_stuffing_roundtrip():
    """An image tuned to emit 0xFF entropy bytes must unstuff cleanly —
    run many seeds so stuffed bytes certainly occur."""
    hit = False
    for seed in range(8):
        img = _det_rgb(24, 24, seed=seed)
        buf = encode_jpeg_rgb(img, 92)
        body = buf[buf.find(b"\xff\xda"):]
        hit = hit or b"\xff\x00" in body
        assert decode_jpeg(buf).shape == img.shape
    assert hit, "no stuffed byte exercised across seeds"


def test_thumbnail_real_geometry():
    img = _smooth_rgb(60, 90)  # landscape: crop then square resize
    out = decode_jpeg(thumbnail_jpeg(encode_jpeg_rgb(img, 95), 16))
    assert out.shape == (16, 16, 3)
    from smse_backend_spark.sources.multimodal import fit_resize_nearest

    want = fit_resize_nearest(img, 16, 16)
    # two lossy hops (q95 + q85): bounded, not exact
    assert np.abs(out.astype(int) - want.astype(int)).mean() < 8


def test_real_jpeg_through_spark_media_path(spark, tmp_path):
    """JPEG files on disk -> binaryFile source -> mapInPandas feature
    kernel: dims are the REAL image dims (not the stub's 8x8) and the
    features equal the numpy ground truth of the decoded luma."""
    from smse_backend_spark.sources.multimodal import (
        extract_image_features,
        ingest_binary_dir,
    )

    bufs = {f"img{i}.jpg": encode_jpeg_rgb(
        _smooth_rgb(12 + i, 20 + i), 90, subsample=bool(i % 2))
        for i in range(3)}
    for name, buf in bufs.items():
        (tmp_path / name).write_bytes(buf)
    media = ingest_binary_dir(spark, str(tmp_path)).filter(
        "modality = 'image'"
    )
    rows = {r["path"].split("/")[-1]: r
            for r in extract_image_features(media).collect()}
    assert set(rows) == set(bufs)
    for name, buf in bufs.items():
        r = rows[name]
        arr = decode_jpeg(buf)
        assert (r["height"], r["width"]) == arr.shape[:2]
        luma = arr.astype(np.float64).mean(axis=2).reshape(-1)
        normed = (luma - luma.mean()) / (luma.std() if luma.std() > 0 else 1.0)
        want = np.floor(normed * 1e6 + 0.5) / 1e6
        assert np.array_equal(np.array(r["features"]), want)


def test_mixed_png_jpeg_thumbnails_through_spark(spark, tmp_path):
    """One ingest dir with both formats: each gets a real thumbnail in
    its own format (JPEG in, JPEG q85 out — the reference's flow)."""
    from smse_backend_spark.sources.multimodal import (
        derive_thumbnails,
        ingest_binary_dir,
    )
    from smse_backend_spark.sources.png import decode_png, encode_png_rgb

    (tmp_path / "a.png").write_bytes(encode_png_rgb(_det_rgb(24, 40)))
    (tmp_path / "b.jpg").write_bytes(encode_jpeg_rgb(_smooth_rgb(30, 44), 90))
    media = ingest_binary_dir(spark, str(tmp_path))
    thumbs = {r["path"].split("/")[-1]: bytes(r["thumb"])
              for r in derive_thumbnails(media, 16).collect()}
    assert set(thumbs) == {"a.png", "b.jpg"}
    assert decode_png(thumbs["a.png"]).shape == (16, 16, 3)
    assert thumbs["b.jpg"][:2] == JPEG_SIG
    assert decode_jpeg(thumbs["b.jpg"]).shape == (16, 16, 3)
