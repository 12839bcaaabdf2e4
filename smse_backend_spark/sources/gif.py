"""Pure-stdlib GIF codec (LZW + palette): real decode for the third
image format in the reference's extension map (`smse_backend/utils/
file_extensions.py` maps ``.gif`` -> image).

GIF is a palette image with LZW-compressed index streams — fully
decodable with bit arithmetic alone:

* :func:`decode_gif` — header + logical screen descriptor, global/local
  color tables, the FIRST image descriptor (animation frames beyond the
  first are out of scope for feature extraction), variable-width LZW
  with CLEAR/EOI handling, interlace de-weaving, palette lookup ->
  ``uint8 (h, w, 3)``.
* :func:`encode_gif_indexed` — real LZW compression (dict-based,
  width growth to 12 bits, CLEAR on table overflow) of an indexed
  image + palette, so fixtures and round-trip tests can build actual
  GIFs in-container. GIF is lossless for palette images: decode ∘
  encode is byte-exact on the pixels.

Determinism: integer-only; identical bytes on every build.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class _LZWReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        # GIF packs codes LSB-first
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.n += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW output short of pixel count")
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF bytes -> ``uint8 (h, w, 3)`` RGB of the first frame. Any
    structural problem raises ``ValueError`` loudly."""
    if buf[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF signature")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            buf[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        b = buf[pos]
        if b == 0x21:               # extension: introducer, label, subblocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x2C:             # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack(
                "<HHHHB", buf[pos + 1:pos + 10]
            )
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    buf[pos:pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            min_code_size = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                data += buf[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code_size, w * h),
                dtype=np.uint8,
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max()) >= pal.shape[0]:
                raise ValueError("palette index out of range")
            return pal[idx]
        elif b == 0x3B:             # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("no image descriptor found")


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    run = b""
    for ch in indices:
        cand = run + bytes([ch])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # widen when the NEXT code to assign no longer fits — the
            # decoder widens at the same boundary
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([ch])
    if run:
        put(table[run], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_indexed(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """``uint8 (h, w)`` palette indices + ``uint8 (n, 3)`` palette ->
    GIF89a bytes (one frame, real LZW)."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("expected uint8 (h, w) indices")
    n = palette.shape[0]
    if int(indices.max(initial=0)) >= n:
        raise ValueError("index exceeds palette")
    bits = max(2, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    h, w = indices.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(bits)
    data = _lzw_encode(indices.tobytes(), bits)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
