"""Pure-stdlib PNG codec (zlib + struct + numpy): real image decode
without PIL.

The container has no imaging library, so `multimodal._decode_image` has
been an honest sha-fake. PNG, however, is just zlib-compressed filtered
scanlines — fully decodable with the standard library. This module
implements the non-interlaced 8-bit subset (grayscale / RGB / RGBA —
what thumbnails and ML ingest actually see) both ways:

* :func:`decode_png` — chunk walk, IDAT concat, zlib inflate, scanline
  defilter (all five PNG filter types per the spec's recursive
  definitions) -> ``uint8 (h, w, channels)``.
* :func:`encode_png_rgb` — filter-0 scanlines, one IDAT, CRC'd chunks.

Determinism: byte-exact by construction (zlib inflate is bit-exact;
defiltering is integer arithmetic mod 256), so decoded pixels are
identical on every executor — the property the feature/oracle
discipline needs.

Reference analog: `smse_backend/services/thumbnail.py:100-150` decodes
via PIL; the crop/resize geometry that follows the decode was already
replicated exactly in `multimodal.fit_crop_box` / `fit_resize_nearest`
— this closes the decode step itself for PNG inputs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> ``uint8 (h, w, channels)``. Supports bit depth 8,
    color types 0/2/4/6, no interlace (the ML-ingest subset); anything
    else raises ``ValueError`` loudly — never a silent fake."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: prefix sum per channel lane, mod 256
            px = line.reshape(w, ch)
            rec = np.cumsum(px, axis=0, dtype=np.int64).reshape(stride) % 256
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype == 3:  # Average (sequential in-scanline dependency)
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (line[i] + ((left + int(prev[i])) >> 1)) % 256
        elif ftype == 4:  # Paeth (sequential)
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                rec[i] = (line[i] + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_rgb(arr: np.ndarray) -> bytes:
    """``uint8 (h, w, 3)`` -> PNG bytes (filter 0, one IDAT chunk)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected uint8 (h, w, 3)")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def thumbnail_png(buf: bytes, size: int) -> bytes:
    """Real end-to-end thumbnail for PNG inputs: decode -> the exact
    PIL ``ImageOps.fit`` center-crop geometry (`multimodal.fit_crop_box`)
    -> nearest-neighbor resample -> re-encode. Grayscale/alpha inputs
    are expanded/truncated to RGB first."""
    from smse_backend_spark.sources.multimodal import fit_resize_nearest

    img = decode_png(buf)
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 2:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    out = fit_resize_nearest(img, size, size)
    return encode_png_rgb(np.ascontiguousarray(out, dtype=np.uint8))
