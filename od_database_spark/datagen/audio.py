"""Deterministic audio synthesis + a REAL pure-numpy WAV (RIFF PCM) codec.

Same contract as datagen.images: everything is a pure function of
``media_id`` so generator and verifier agree bit-for-bit.  RIFF/PCM needs no
codec library — 16-bit mono little-endian PCM in a canonical RIFF container —
so unlike the (honestly stubbed) compressed-audio path, WAV decode is fully
implementable here and turns extract_audio_features into a real operator.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_RATES = (8000, 16000, 22050, 44100)


def _h(media_id: str, salt: int) -> int:
    d = hashlib.sha256(f"{media_id}\x00{salt}".encode()).digest()
    return int.from_bytes(d[:8], "little")


def rate_for(media_id: str) -> int:
    return _RATES[_h(media_id, 21) % len(_RATES)]


def n_samples_for(media_id: str) -> int:
    return 400 + _h(media_id, 22) % 4000


def samples_for(media_id: str) -> np.ndarray:
    """Deterministic int16 mono PCM: two seeded sines + seeded noise."""
    n = n_samples_for(media_id)
    rate = rate_for(media_id)
    rng = np.random.default_rng(_h(media_id, 23) % (2**32))
    f1 = 100 + _h(media_id, 24) % 1800
    f2 = 100 + _h(media_id, 25) % 1800
    t = np.arange(n, dtype=np.float64) / rate
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    x = x + rng.normal(scale=0.05, size=n)
    return np.clip(x * 20000, -32768, 32767).astype(np.int16)


# --- RIFF/WAV codec (16-bit mono PCM) --------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    assert samples.dtype == np.int16
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, rate, byte_rate, 2, 16)  # PCM, mono
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a RIFF/WAVE"
    pos, rate, out = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            assert audio_fmt == 1 and channels == 1 and bits == 16, (
                "only 16-bit mono PCM supported"
            )
        elif tag == b"data":
            out = np.frombuffer(payload, dtype="<i2").astype(np.int16)
        pos += 8 + length + (length & 1)  # RIFF chunks are 2-byte aligned
    assert rate is not None and out is not None, "missing fmt/data chunk"
    return rate, out


def make_audio_row(media_id: str) -> dict:
    rate = rate_for(media_id)
    samples = samples_for(media_id)
    return {
        "media_id": media_id,
        "modality": "audio",
        "payload": encode_wav(samples, rate),
        "meta": {"fmt": "wav", "rate": str(rate)},
    }


def rms_of(samples: np.ndarray) -> float:
    x = samples.astype(np.float64) / 32768.0
    return float(np.sqrt(np.mean(x * x)))
