"""Deterministic video synthesis + a real pure-numpy frame container.

There is no ffmpeg/pyav in this container, so compressed video stays an
honest stub (operators/multimodal.py).  But a FRAME CONTAINER needs no codec
library: ``odv`` is a length-prefixed sequence of real PNG frames (the same
pure-numpy PNG codec images.py uses), so the frame-sampling operator gets a
fully real decode path — container walk, frame decode, per-frame features —
with the same plumbing a compressed codec would slot into.

Layout: b"ODDBVID1" | u16 n_frames | u16 w | u16 h | n_frames × (u32 len, PNG).
Everything is a pure function of ``media_id`` (generator/verifier agree).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np

from . import images as im

MAGIC = b"ODDBVID1"


def _h(media_id: str, salt: int) -> int:
    d = hashlib.sha256(f"{media_id}\x00{salt}".encode()).digest()
    return int.from_bytes(d[:8], "little")


def n_frames_for(media_id: str) -> int:
    return 8 + _h(media_id, 31) % 17  # 8..24 frames


def dims_for(media_id: str) -> tuple[int, int]:
    return 32 + (_h(media_id, 32) % 3) * 16, 32 + (_h(media_id, 33) % 3) * 16


def frame_pixels(media_id: str, idx: int) -> np.ndarray:
    w, h = dims_for(media_id)
    return im.pixels_for(f"{media_id}:frame{idx}", w, h)


def encode_video(media_id: str) -> bytes:
    n = n_frames_for(media_id)
    w, h = dims_for(media_id)
    parts = [MAGIC, struct.pack("<HHH", n, w, h)]
    for i in range(n):
        png = im.encode_png(frame_pixels(media_id, i))
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def decode_frames(data: bytes) -> Iterator[tuple[int, np.ndarray]]:
    assert data[:8] == MAGIC, "not an ODDB video container"
    n, _w, _h = struct.unpack("<HHH", data[8:14])
    pos = 14
    for i in range(n):
        (length,) = struct.unpack("<I", data[pos : pos + 4])
        yield i, im.decode_png(data[pos + 4 : pos + 4 + length])
        pos += 4 + length


def frame_count(data: bytes) -> int:
    assert data[:8] == MAGIC, "not an ODDB video container"
    return struct.unpack("<HHH", data[8:14])[0]


def make_video_row(media_id: str) -> dict:
    return {
        "media_id": media_id,
        "modality": "video",
        "payload": encode_video(media_id),
        "meta": {"fmt": "odv", "n_frames": str(n_frames_for(media_id))},
    }
