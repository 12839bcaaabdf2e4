"""Pure-stdlib GIF codec (LZW + palette) + real decode through the
Spark media path (.gif is in the reference's image extension map)."""

from __future__ import annotations

import numpy as np
import pytest

from smse_backend_spark.sources.gif import (
    decode_gif,
    encode_gif_indexed,
)


def _pal(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, 3)).astype(np.uint8)


def test_roundtrip_lossless_small_and_large_palettes():
    rng = np.random.RandomState(1)
    for h, w, ncol in [(13, 17, 4), (32, 48, 16), (64, 100, 256)]:
        pal = _pal(ncol, seed=ncol)
        base = (np.add.outer(np.arange(h), np.arange(w)) // 3
                % ncol).astype(np.uint8)
        noise = rng.randint(0, ncol, (h, w)).astype(np.uint8)
        for idx in (base, noise):
            assert np.array_equal(
                decode_gif(encode_gif_indexed(idx, pal)), pal[idx]
            )


def test_lzw_table_overflow_clear():
    """Noise over a 200-color palette forces the LZW table past 12 bits
    -> the encoder's CLEAR/reset path and the decoder's matching reset
    both run."""
    rng = np.random.RandomState(3)
    pal = _pal(200, seed=9)
    idx = rng.randint(0, 200, (120, 90)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif_indexed(idx, pal)), pal[idx])


def test_deterministic_and_rejects():
    pal = _pal(8)
    idx = np.zeros((4, 4), np.uint8)
    assert encode_gif_indexed(idx, pal) == encode_gif_indexed(idx, pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"notagif")
    with pytest.raises(ValueError, match="palette"):
        encode_gif_indexed(np.full((2, 2), 9, np.uint8), _pal(4))


def test_interlaced_gif_decodes():
    """Hand-flag an interlaced image: rows arrive in pass order and the
    decoder must de-weave them."""
    pal = _pal(16, seed=5)
    idx = (np.arange(16)[:, None] % 16 * np.ones((1, 8), int)).astype(np.uint8)
    buf = bytearray(encode_gif_indexed(idx, pal))
    # image descriptor flag byte: 6 magic + 7 lsd + 3*16 palette
    #   + 1 (0x2C) + 8 (lx,ty,w,h) = offset of the flags byte
    flags_at = 6 + 7 + 3 * 16 + 1 + 8
    assert buf[flags_at] == 0
    # re-encode the pixel rows in interlace pass order, set the flag
    h = 16
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    woven = idx[order]
    buf2 = bytearray(encode_gif_indexed(woven, pal))
    buf2[flags_at] = 0x40
    assert np.array_equal(decode_gif(bytes(buf2)), pal[idx])


def test_gif_through_spark_media_path(spark, tmp_path):
    """GIF files -> binaryFile -> feature kernel: real dims + features
    equal the decoded-luma ground truth; thumbnails come out JPEG."""
    from smse_backend_spark.sources.jpeg import JPEG_SIG, decode_jpeg
    from smse_backend_spark.sources.multimodal import (
        derive_thumbnails,
        extract_image_features,
        ingest_binary_dir,
    )

    pal = _pal(32, seed=2)
    imgs = {}
    for i in range(2):
        idx = (np.add.outer(np.arange(20 + i), np.arange(30 + i))
               % 32).astype(np.uint8)
        imgs[f"anim{i}.gif"] = (idx, pal)
        (tmp_path / f"anim{i}.gif").write_bytes(
            encode_gif_indexed(idx, pal)
        )
    media = ingest_binary_dir(spark, str(tmp_path))
    rows = {r["path"].split("/")[-1]: r
            for r in extract_image_features(media).collect()}
    assert set(rows) == set(imgs)
    for name, (idx, pal_) in imgs.items():
        r = rows[name]
        rgb = pal_[idx]
        assert (r["height"], r["width"]) == rgb.shape[:2]
        luma = rgb.astype(np.float64).mean(axis=2).reshape(-1)
        normed = (luma - luma.mean()) / (luma.std() if luma.std() > 0 else 1.0)
        want = np.floor(normed * 1e6 + 0.5) / 1e6
        assert np.array_equal(np.array(r["features"]), want)
    thumbs = {r["path"].split("/")[-1]: bytes(r["thumb"])
              for r in derive_thumbnails(media, 12).collect()}
    assert set(thumbs) == set(imgs)
    for t in thumbs.values():
        assert t[:2] == JPEG_SIG and decode_jpeg(t).shape == (12, 12, 3)
