"""Pure-stdlib baseline JPEG (JFIF) codec: real decode of the
reference's DEFAULT image format without PIL.

The reference's allowed image extensions default to ``jpg,jpeg``
(`smse_backend/utils/file_extensions.py:9`) and its thumbnail service
emits 320x180 JPEG q85 (`smse_backend/services/thumbnail.py:100-150`),
so a JPEG decode is the single most-hit media path. Baseline sequential
JPEG is mechanical: huffman-coded quantized DCT blocks — fully
decodable with struct + numpy. This module implements both directions
for the baseline subset:

* :func:`decode_jpeg` — marker walk (DQT/DHT/SOF0/DRI/SOS), canonical
  huffman decode with 0xFF00 unstuffing + RSTn handling, dequantize,
  dezigzag, float64 matrix IDCT, nearest chroma upsampling for any
  sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr->RGB.
  Progressive (SOF2) / arithmetic / 12-bit inputs raise ``ValueError``
  loudly — never a silent fake.
* :func:`encode_jpeg_rgb` — the ITU T.81 Annex K tables scaled by the
  IJG quality formula, 4:4:4 or 4:2:0, FDCT + huffman with byte
  stuffing. Exists so tests and fixtures can build real JPEGs in a
  container with no imaging library.

Determinism: both directions are integer + float64 matrix arithmetic
with fixed operation order — byte-exact across executors, the property
the feature/oracle discipline needs.

Reference analog: `smse_backend/services/thumbnail.py:100-150` decodes
via PIL and re-encodes JPEG q85; :func:`thumbnail_jpeg` mirrors that
flow end-to-end (decode -> PIL-exact fit-crop geometry -> nearest
resample -> re-encode q85).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIG = b"\xff\xd8"
# sniffing magic: a real JPEG's SOI is always followed by another marker
# (0xFF), so 3 bytes distinguish actual streams from chance 0xFFD8 prefixes
JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag index: zigzag_order[k] = (row, col) flattened index of the k-th
# coefficient in scan order (ITU T.81 Figure A.6)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 base quantization tables (natural order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard huffman specs: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: FDCT = T B T^t, IDCT = T^t C T."""
    t = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            t[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return t


_T = _dct_matrix()


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (jcparam.c): 1..100 -> scaled table, clamped
    to [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


# --- canonical huffman ------------------------------------------------------

def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical T.81 assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value — the inverse canonical map."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-coded-segment reader: 0xFF00 unstuffs to 0xFF; RSTn
    markers reset huffman state (handled by the caller via
    :meth:`at_marker`); any other marker ends the scan."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerReached(self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Discard pending bits and consume a marker (for RSTn)."""
        self.acc = 0
        self.n = 0
        while self.buf[self.pos] != 0xFF:
            self.pos += 1
        marker = self.buf[self.pos + 1]
        self.pos += 2
        return marker


class _MarkerReached(Exception):
    def __init__(self, pos: int) -> None:
        self.pos = pos


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code")


# --- encoder ----------------------------------------------------------------

def _rgb_to_ycbcr(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _pad_to(arr: np.ndarray, mult: int) -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    return arr


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(H, W) float64 plane (multiple of 8) -> (H//8, W//8, 64) int zigzag
    quantized coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    shifted = blocks - 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", _T, shifted, _T)
    q = qtbl.reshape(8, 8).astype(np.float64)
    scaled = coef / q
    # round half away from zero (IJG's DESCALE discipline)
    quant = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    flat = quant.reshape(h // 8, w // 8, 64)
    return flat[:, :, _ZIGZAG].astype(np.int64)


def _emit_block(wtr: _BitWriter, zz: np.ndarray, pred: int,
                dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    if diff < 0:
        s = (-diff).bit_length()
        diff_bits = diff + (1 << s) - 1
    else:
        s = diff.bit_length()
        diff_bits = diff
    code, ln = dc_codes[s]
    wtr.put(code, ln)
    if s:
        wtr.put(diff_bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]    # ZRL
            wtr.put(zc, zl)
            run -= 16
        sz = abs(v).bit_length()
        vb = v + (1 << sz) - 1 if v < 0 else v
        code, ln = ac_codes[(run << 4) | sz]
        wtr.put(code, ln)
        wtr.put(vb, sz)
        run = 0
    if run:
        ec, el = ac_codes[0x00]        # EOB
        wtr.put(ec, el)
    return dc


def encode_jpeg_rgb(arr: np.ndarray, quality: int = 85,
                    subsample: bool = False) -> bytes:
    """``uint8 (h, w, 3)`` -> baseline JFIF bytes. ``subsample=True``
    writes 4:2:0 (2x2 luma sampling, box-averaged chroma); default is
    4:4:4."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected uint8 (h, w, 3)")
    h, w = arr.shape[:2]
    qy = _scale_quant(_Q_LUM, quality)
    qc = _scale_quant(_Q_CHR, quality)
    y, cb, cr = _rgb_to_ycbcr(arr)

    dc_l = _build_codes(*_DC_LUM)
    ac_l = _build_codes(*_AC_LUM)
    dc_c = _build_codes(*_DC_CHR)
    ac_c = _build_codes(*_AC_CHR)

    if subsample:
        y_p = _pad_to(y, 16)

        def _half(p: np.ndarray) -> np.ndarray:
            p = _pad_to(p, 2)
            hh, ww = p.shape
            return p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

        cb_p = _pad_to(_half(cb), 8)
        cr_p = _pad_to(_half(cr), 8)
        samp = ((2, 2), (1, 1), (1, 1))
    else:
        y_p = _pad_to(y, 8)
        cb_p = _pad_to(cb, 8)
        cr_p = _pad_to(cr, 8)
        samp = ((1, 1), (1, 1), (1, 1))

    zy = _fdct_quant(y_p, qy)
    zcb = _fdct_quant(cb_p, qc)
    zcr = _fdct_quant(cr_p, qc)

    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcu_rows = zy.shape[0] // samp[0][1]
    mcu_cols = zy.shape[1] // samp[0][0]
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (zz, (sh, sv)) in enumerate(
                zip((zy, zcb, zcr), samp)
            ):
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(sv):
                    for bx in range(sh):
                        blk = zz[my * sv + by, mx * sh + bx]
                        preds[ci] = _emit_block(
                            wtr, blk, preds[ci], dc_codes, ac_codes
                        )
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(JPEG_SIG)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payload is in ZIGZAG order (the tables above are natural order)
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in qy[_ZIGZAG]))
    out += seg(0xDB, b"\x01" + bytes(int(v) for v in qc[_ZIGZAG]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 3))
    for cid, ((sh, sv), tq) in enumerate(zip(samp, (0, 1, 1)), start=1):
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += seg(0xC0, bytes(sof))
    for tc_th, (bits, vals) in ((0x00, _DC_LUM), (0x10, _AC_LUM),
                                (0x01, _DC_CHR), (0x11, _AC_CHR)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytearray([3])
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tdta])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> ``uint8 (h, w, 3)`` RGB (grayscale JPEGs
    expand to 3 identical channels). Supports SOF0, 8-bit, 1 or 3
    components, sampling factors up to 2x2, DRI/RSTn; everything else
    raises ``ValueError``."""
    if buf[:2] != JPEG_SIG:
        raise ValueError("not a JPEG signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                # standalone
        (ln,) = struct.unpack(">H", buf[pos:pos + 2])
        payload = buf[pos + 2:pos + ln]
        if marker == 0xDB:          # DQT (possibly several per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(
                    payload[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl   # zigzag -> natural order
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:        # DHT (possibly several)
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                htables[tc_th] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:        # SOF0 baseline
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(baseline sequential only)"
            )
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                buf, pos + ln, frame, scan_sel, qtables, htables,
                restart_interval,
            )
        pos += ln
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, frame, scan_sel, qtables, htables,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError("1 or 3 components only")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors up to 2x2 only")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component decoded plane (at its own resolution)
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8),
                               dtype=np.float64)
    sel = {cs: (td, ta) for cs, td, ta in scan_sel}

    r = _BitReader(buf, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                marker = r.align_to_marker()
                if not 0xD0 <= marker <= 0xD7:
                    raise ValueError(f"expected RST, got 0xFF{marker:02X}")
                preds = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, tq in comps:
                td, ta = sel[cid]
                dc_tab = htables[td]            # tc=0 -> key 0x0t
                ac_tab = htables[0x10 | ta]
                q = qtables[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _decode_huff(r, dc_tab)
                        diff = _receive_extend(r, s)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_tab)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16     # ZRL
                                    continue
                                break           # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _receive_extend(r, ss)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[_ZIGZAG] = zz
                        coef = (nat * q).reshape(8, 8)
                        blk = _T.T @ coef @ _T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1

    # upsample each component to full MCU-grid resolution, crop, stack
    full = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        yp = np.clip(full[0], 0.0, 255.0)
        g = np.floor(yp + 0.5)
        out = np.stack([g, g, g], axis=2)
        return np.clip(out, 0, 255).astype(np.uint8)
    y, cb, cr = full
    cb = cb - 128.0
    cr = cr - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136286 * cb - 0.714136286 * cr
    b_ = y + 1.772 * cb
    out = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def thumbnail_jpeg(buf: bytes, size: int, quality: int = 85) -> bytes:
    """Real end-to-end thumbnail for JPEG inputs, mirroring the
    reference's thumbnail service: decode -> the exact PIL
    ``ImageOps.fit`` center-crop geometry (`multimodal.fit_crop_box`) ->
    nearest resample -> re-encode JPEG q85 (thumbnail.py:100-150)."""
    from smse_backend_spark.sources.multimodal import fit_resize_nearest

    img = decode_jpeg(buf)
    out = fit_resize_nearest(img, size, size)
    return encode_jpeg_rgb(
        np.ascontiguousarray(out, dtype=np.uint8), quality=quality
    )
