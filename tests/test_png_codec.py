"""Pure-stdlib PNG codec + real decode through the Spark media path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from smse_backend_spark.sources.png import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png_rgb,
    thumbnail_png,
)


def _det_rgb(h, w, seed=7):
    """Deterministic 'image': structured gradients + hash noise."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + seed) % 256
    g = (y * 11 + x // 3) % 256
    b = (x * y + seed * 13) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_roundtrip_exact():
    img = _det_rgb(33, 47)
    assert np.array_equal(decode_png(encode_png_rgb(img)), img)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter ftypes[y % len] — forward
    filtering per the spec, so the decoder's defilter of EVERY type is
    exercised against ground truth."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    raw = b""
    for y in range(h):
        line = flat[y]
        ft = ftypes[y % len(ftypes)]
        enc = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            left = int(line[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (
                    up if pb <= pc else ul
                )
            enc[i] = (line[i] - pred) % 256
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filter_types(ftypes):
    img = _det_rgb(17, 23, seed=len(ftypes))
    assert np.array_equal(decode_png(_encode_with_filters(img, ftypes)), img)


def test_decode_rejects_unsupported_loudly():
    img = _det_rgb(4, 4)
    buf = bytearray(encode_png_rgb(img))
    with pytest.raises(ValueError):
        decode_png(b"notapng" + bytes(buf))
    # corrupt the bit depth field inside IHDR (offset: 8 sig + 8 hdr + 8)
    buf[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="bit depth|crc|IHDR"):
        decode_png(bytes(buf))


def test_thumbnail_real_geometry():
    img = _det_rgb(60, 90)  # landscape: crop then square resize
    out = decode_png(thumbnail_png(encode_png_rgb(img), 16))
    assert out.shape == (16, 16, 3)
    # center crop of a landscape keeps full height, trims width evenly:
    # pixel (0,0) of the thumb samples near column (90-60)/2 = 15
    from smse_backend_spark.sources.multimodal import fit_resize_nearest

    assert np.array_equal(out, fit_resize_nearest(img, 16, 16))


def test_real_png_through_spark_media_path(spark, tmp_path):
    """PNG files on disk -> binaryFile source -> mapInPandas feature
    kernel: dims are the REAL image dims (not the stub's 8x8) and the
    features equal the numpy ground truth of the decoded luma."""
    from smse_backend_spark.sources.multimodal import (
        extract_image_features,
        ingest_binary_dir,
    )

    imgs = {f"img{i}.png": _det_rgb(12 + i, 20 + i, seed=i) for i in range(3)}
    for name, arr in imgs.items():
        (tmp_path / name).write_bytes(encode_png_rgb(arr))
    media = ingest_binary_dir(spark, str(tmp_path)).filter(
        "modality = 'image'"
    )
    rows = {r["path"].split("/")[-1]: r
            for r in extract_image_features(media).collect()}
    assert set(rows) == set(imgs)
    for name, arr in imgs.items():
        r = rows[name]
        assert (r["height"], r["width"]) == arr.shape[:2]
        luma = arr.astype(np.float64).mean(axis=2).reshape(-1)
        normed = (luma - luma.mean()) / (luma.std() if luma.std() > 0 else 1.0)
        want = np.floor(normed * 1e6 + 0.5) / 1e6
        assert np.array_equal(np.array(r["features"]), want)


def test_wav_roundtrip_and_features():
    from smse_backend_spark.sources.wav import (
        audio_features,
        decode_wav,
        encode_wav_pcm16,
    )

    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    buf = encode_wav_pcm16(8000, sig)
    rate, x = decode_wav(buf)
    assert rate == 8000 and len(x) == 8000
    assert np.max(np.abs(x - sig)) < 1.0 / 32000  # 16-bit quantization
    f = audio_features(buf)
    assert f["duration_s"] == 1.0
    # RMS of a 0.5-amp sine is 0.5/sqrt(2) ~ 0.353553
    assert abs(f["rms"] - 0.353553) < 1e-3
    # 440 Hz crosses zero 880 times/s -> zcr ~ 880/8000 = 0.11
    assert abs(f["zcr"] - 0.11) < 5e-3


def test_wav_rejects_non_pcm_loudly():
    from smse_backend_spark.sources.wav import decode_wav, encode_wav_pcm16

    with pytest.raises(ValueError):
        decode_wav(b"nope" * 4)
    buf = bytearray(encode_wav_pcm16(8000, np.zeros(10)))
    buf[20] = 3  # audio format -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(buf))


def test_real_thumbnails_and_audio_through_spark(spark, tmp_path):
    """Mixed media dir: PNGs get real thumbnails, WAVs get real audio
    features, through one binaryFile ingest."""
    from smse_backend_spark.sources.multimodal import (
        derive_thumbnails,
        extract_audio_features,
        ingest_binary_dir,
    )
    from smse_backend_spark.sources.png import decode_png, encode_png_rgb
    from smse_backend_spark.sources.wav import encode_wav_pcm16

    for i in range(2):
        (tmp_path / f"pic{i}.png").write_bytes(
            encode_png_rgb(_det_rgb(24 + i, 40, seed=i))
        )
        t = np.arange(4000) / 8000.0
        (tmp_path / f"clip{i}.wav").write_bytes(
            encode_wav_pcm16(8000, 0.25 * np.sin(2 * np.pi * (220 + i * 110) * t))
        )
    media = ingest_binary_dir(spark, str(tmp_path))
    thumbs = {r["path"].split("/")[-1]: r
              for r in derive_thumbnails(media, 16).collect()}
    assert set(thumbs) == {"pic0.png", "pic1.png"}
    for r in thumbs.values():
        assert decode_png(bytes(r["thumb"])).shape == (16, 16, 3)
    audio = {r["path"].split("/")[-1]: r
             for r in extract_audio_features(media).collect()}
    assert set(audio) == {"clip0.wav", "clip1.wav"}
    assert all(r["duration_s"] == 0.5 for r in audio.values())
    assert audio["clip0.wav"]["zcr"] < audio["clip1.wav"]["zcr"]
