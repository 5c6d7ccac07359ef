"""Minimal PNG writer (no external deps).

Replaces the reference's libpng path (``src/imwrite.cpp:14-79``), keeping its
speed-over-size stance: the reference sets compression level 0 with
Z_HUFFMAN_ONLY because "PNG writing is a huge bottleneck" (README.md:127);
we default to zlib level 1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["write_png", "rgba_to_bytes"]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def rgba_to_bytes(img: np.ndarray) -> np.ndarray:
    """float [H,W,3|4] in [0,1] or uint8 -> uint8 array unchanged shape."""
    if img.dtype == np.uint8:
        return img
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def write_png(path: str, img: np.ndarray, level: int = 1) -> None:
    """Write an (H, W, {1,3,4}) uint8/float image as PNG."""
    img = rgba_to_bytes(np.asarray(img))
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = np.empty((h, w * c + 1), np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = img.reshape(h, w * c)
    data = zlib.compress(raw.tobytes(), level)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_chunk(b"IHDR", struct.pack(
            ">IIBBBBB", w, h, 8, color_type, 0, 0, 0)))
        f.write(_chunk(b"IDAT", data))
        f.write(_chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Tiny PNG reader for round-trip tests (8-bit, non-interlaced only)."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = c = None
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            assert depth == 8 and interlace == 0
            c = {0: 1, 2: 3, 6: 4}[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    raw = raw.reshape(h, w * c + 1)
    assert np.all(raw[:, 0] == 0), "only filter-None rows supported"
    return raw[:, 1:].reshape(h, w, c)
