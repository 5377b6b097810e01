"""Deterministic image synthesis + pure-numpy codecs (BASELINE.json input_hint).

Everything is a pure function of ``image_id`` so the generator and the
verifier can be run independently (different processes, different rounds) and
must agree bit-for-bit (lossless) or within PSNR >= 40 dB (lossy).

Codecs:
- ``png``  — real PNG (zlib + CRC chunks, filter 0), lossless.
- ``bmp``  — real 24-bit bottom-up BMP, lossless.
- ``jpeg`` — DETERMINISTIC STAND-IN: this container has no libjpeg (no PIL /
  cv2), so "jpeg" here is a clearly-marked fake lossy codec (uniform
  quantization step 4 + zlib, magic header ``ODDBJPGF``).  Quantization error
  is <= 2 per channel → PSNR ≈ 47 dB, satisfying the >= 40 dB invariant the
  same way a real q≈90 JPEG would.  If Pillow is installed the real codec is
  used instead (import-try below).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

try:  # real JPEG if available (not in this container)
    from PIL import Image as _PILImage  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FORMATS = ("png", "jpeg", "bmp")
_JPEG_MAGIC = b"ODDBJPGF"
_JPEG_Q = 4  # quantization step → max error 2/channel → PSNR ≈ 47 dB

_WORDS = (
    "ancient amber blue bright broken calm coastal crimson distant dusty "
    "empty frozen golden green hidden lonely misty narrow northern old "
    "quiet red rustic shallow silent silver small steep stone sunny tall "
    "weathered white wide wild wooden yellow"
).split()
_NOUNS = (
    "archway beach bridge canyon castle cabin cliff desert dune farmhouse "
    "field forest garden glacier harbor hill island lake lighthouse meadow "
    "mountain orchard pier plain pond ridge river road ruin shore summit "
    "tower trail valley village waterfall"
).split()
_TAILS = (
    "at dawn", "at dusk", "after rain", "in fog", "in autumn",
    "in winter", "under clouds", "under stars", "in sunlight", "in moonlight",
)


def _h(image_id: str, salt: int) -> int:
    """Stable 64-bit hash of (image_id, salt) — sha256-based, not xxhash,
    because generator and verifier only need to agree with each other."""
    d = hashlib.sha256(f"{image_id}\x00{salt}".encode()).digest()
    return int.from_bytes(d[:8], "little")


def dims_for(image_id: str) -> tuple[int, int]:
    """FIXTURES.md §1: w,h = 32 + (hash % 7) * 16."""
    return 32 + (_h(image_id, 1) % 7) * 16, 32 + (_h(image_id, 2) % 7) * 16


def fmt_for(image_id: str) -> str:
    return FORMATS[_h(image_id, 3) % 3]


def caption_for(image_id: str) -> str:
    h = _h(image_id, 4)
    a = _WORDS[h % len(_WORDS)]
    b = _NOUNS[(h >> 8) % len(_NOUNS)]
    c = _WORDS[(h >> 16) % len(_WORDS)]
    d = _NOUNS[(h >> 24) % len(_NOUNS)]
    tail = _TAILS[(h >> 32) % len(_TAILS)]
    return f"a photo of a {a} {b} near a {c} {d} {tail}"


def pixels_for(image_id: str, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Deterministic RGB uint8 array (h, w, 3): two-axis gradient + seeded noise."""
    if w is None or h is None:
        w, h = dims_for(image_id)
    seed = _h(image_id, 5) % (2**32)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8)
    base = np.stack([r, g, b], axis=-1).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# --- PNG (real) -----------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + px[row].tobytes() for row in range(h))  # filter 0
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for row in range(h):
        line = raw[row * stride : (row + 1) * stride]
        filt, body = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        if filt == 0:
            pass
        elif filt == 2:  # Up
            body = (body.astype(np.int16) + prev).astype(np.uint8)
        else:  # our encoder only writes filter 0; Up handled for robustness
            raise NotImplementedError(f"PNG filter {filt} not supported")
        out[row] = body.reshape(w, 3)
        prev = body
    return out


# --- BMP (real, 24-bit bottom-up) ----------------------------------------


def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(px[row, :, ::-1].tobytes() + pad for row in range(h - 1, -1, -1))
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    assert bpp == 24, "only 24-bit BMP supported"
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        line = data[offset + row * row_size : offset + row * row_size + w * 3]
        out[h - 1 - row] = np.frombuffer(line, dtype=np.uint8).reshape(w, 3)[:, ::-1]
    return out


# --- "jpeg" (deterministic lossy stand-in; real JPEG iff Pillow exists) ---


def encode_jpeg(px: np.ndarray) -> bytes:
    # The stand-in is used even when Pillow is present: generator/verifier
    # agreement must be exact, and libjpeg output varies across builds.  A
    # real-JPEG codec would slot in here once pinned to one libjpeg version.
    h, w, _ = px.shape
    q = (px.astype(np.uint16) + _JPEG_Q // 2) // _JPEG_Q
    q = np.clip(q, 0, 255 // _JPEG_Q).astype(np.uint8)
    return _JPEG_MAGIC + struct.pack("<HHB", w, h, _JPEG_Q) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    assert data[: len(_JPEG_MAGIC)] == _JPEG_MAGIC, "not an ODDB fake-jpeg"
    w, h, q = struct.unpack("<HHB", data[8:13])
    body = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return np.clip(body.reshape(h, w, 3).astype(np.uint16) * q, 0, 255).astype(np.uint8)


_CODECS = {
    "png": (encode_png, decode_png),
    "bmp": (encode_bmp, decode_bmp),
    "jpeg": (encode_jpeg, decode_jpeg),
}


def encode(fmt: str, px: np.ndarray) -> bytes:
    return _CODECS[fmt][0](px)


def decode(fmt: str, data: bytes) -> np.ndarray:
    return _CODECS[fmt][1](data)


# --- perceptual hash + PSNR ----------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT32 = _dct_matrix(32)


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash (box-resample to 32x32 → 2-D DCT → top-left
    8x8 sans DC → median threshold).  Signed int64 for Spark LongType."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).astype(int)
    xs = (np.arange(32) * w // 32).astype(int)
    small = gray[np.ix_(ys, xs)]
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].flatten()[1:]
    med = np.median(block)
    bits = 0
    for i, v in enumerate(block >= med):
        if v:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def make_image_row(image_id: str) -> dict:
    """Full deterministic row for the ``images`` table (input_hint schema)."""
    w, h = dims_for(image_id)
    fmt = fmt_for(image_id)
    px = pixels_for(image_id, w, h)
    return {
        "image_id": image_id,
        "bytes": encode(fmt, px),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(image_id),
        "phash": phash64(decode(fmt, encode(fmt, px))),
    }
