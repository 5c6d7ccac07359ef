"""PNG writer: native parallel encoder with a pure-Python fallback.

Replaces the reference's libpng path (``src/imwrite.cpp:14-79``). The
reference tunes libpng to compression 0 + Z_HUFFMAN_ONLY because "PNG
writing is a huge bottleneck" (README.md:127) but stays single-threaded;
``native/png_writer.cpp`` splits scanlines across threads (pigz-style
chunked deflate, one IDAT per chunk) — ~10x the pure-Python writer at
800x800. The Python implementation remains as the no-toolchain fallback
and the reference semantics for tests.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import zlib
from typing import Optional

import numpy as np

__all__ = ["write_png", "write_png_bytes", "rgba_to_bytes"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "png_writer.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libvolrend_png.so")


def _build() -> Optional[str]:
    if os.path.isfile(_SO):
        # a prebuilt .so without the source alongside is still usable
        if not os.path.isfile(_SRC):
            return _SO
        if os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO, "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.png_write.restype = ctypes.c_int
        lib.png_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return _LIB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def rgba_to_bytes(img: np.ndarray) -> np.ndarray:
    """float [H,W,3|4] in [0,1] or uint8 -> uint8 array unchanged shape."""
    if img.dtype == np.uint8:
        return img
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def write_png_bytes(fh, img) -> None:
    """Encode an (H, W, {1,3,4}) image as PNG into a file-like object —
    the in-memory single-shot variant of :func:`write_png` (viewer frame
    responses, offline HTML export). Compression level 1, one IDAT."""
    data = rgba_to_bytes(np.asarray(img))
    if data.ndim == 2:
        data = data[..., None]
    h, w, c = data.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = np.empty((h, w * c + 1), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = data.reshape(h, w * c)
    comp = zlib.compress(raw.tobytes(), 1)
    fh.write(b"\x89PNG\r\n\x1a\n")
    fh.write(_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                         0, 0, 0)))
    fh.write(_chunk(b"IDAT", comp))
    fh.write(_chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray, level: int = 1,
              native: bool = True) -> None:
    """Write an (H, W, {1,3,4}) uint8/float image as PNG.

    Uses the native parallel encoder when the toolchain is available
    (``native=False`` forces the pure-Python path, e.g. for tests)."""
    img = rgba_to_bytes(np.asarray(img))
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if native and c in (1, 3, 4):
        lib = _lib()
        if lib is not None:
            buf = np.ascontiguousarray(img)
            n_threads = min(os.cpu_count() or 1, 16)
            rc = lib.png_write(
                path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                h, w, c, int(level), n_threads)
            if rc == 0:
                return
            # fall through to the Python writer on any native failure
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
