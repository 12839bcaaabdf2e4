"""Pure-stdlib WAV (PCM) codec: real audio decode without librosa.

Same motive as `sources/png.py`: the container has no audio library, but
RIFF/WAVE PCM is just struct-framed integers — fully decodable with the
standard library. Supports 16-bit and 8-bit PCM, any channel count
(channels are averaged to mono for features). Anything else (float,
ADPCM, extensible) raises loudly — never a silent fake.

Reference analog: smse_backend routes audio uploads by extension only
(`services/file_storage.py` whitelist); the embedding worker decodes
with torchaudio. Here the decode feeds deterministic feature math
(duration, RMS, zero-crossing rate) through the same binaryFile →
mapInPandas plumbing the image path uses.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float64 mono samples in [-1, 1])."""
    if buf[:4] != RIFF_MAGIC or buf[8:12] != WAVE_MAGIC:
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported (non-PCM) format {audio_fmt}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return rate, x


def encode_wav_pcm16(rate: int, samples: np.ndarray) -> bytes:
    """float mono in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.floor(pcm * 32767.0 + 0.5).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm16)) + pcm16
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def audio_features(buf: bytes) -> dict:
    """Deterministic per-clip features from a real decode: duration,
    RMS energy, zero-crossing rate — all half-up quantized to 6 dp so
    every engine/executor agrees."""
    rate, x = decode_wav(buf)
    n = len(x)
    dur = n / float(rate)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    q = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_s": q(dur),
        "rms": q(rms),
        "zcr": q(zc),
    }
