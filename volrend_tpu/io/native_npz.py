"""ctypes bridge to the native npz loader (native/npz_loader.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source;
rebuilt when the source is newer). Falls back to ``numpy.load`` when the
toolchain or zlib is unavailable, so the package works everywhere.

``load_npz(path)`` returns a dict[str, np.ndarray] like ``dict(np.load(p))``
but decodes members with mmap + multithreaded memcpy (STORED) or native
zlib inflate (DEFLATED) — ~10-30x faster than numpy's zipfile path on
multi-GB trees.
"""

from __future__ import annotations

import ast
import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "npz_loader.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libvolrend_npz.so")


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
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
        lib.npz_open.restype = ctypes.c_void_p
        lib.npz_open.argtypes = [ctypes.c_char_p]
        lib.npz_error.restype = ctypes.c_char_p
        lib.npz_error.argtypes = [ctypes.c_void_p]
        lib.npz_count.restype = ctypes.c_int
        lib.npz_count.argtypes = [ctypes.c_void_p]
        lib.npz_name.restype = ctypes.c_char_p
        lib.npz_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.npz_member_info.restype = ctypes.c_int
        lib.npz_member_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
        lib.npz_read.restype = ctypes.c_int
        lib.npz_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_char_p, ctypes.c_int]
        lib.npz_close.restype = None
        lib.npz_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def _parse_npy_header(buf: bytes):
    """Parse an npy header prefix -> (dtype, shape, fortran, data_offset)."""
    if buf[:6] != b"\x93NUMPY":
        raise ValueError("not an npy member")
    major = buf[6]
    if major == 1:
        hlen = int.from_bytes(buf[8:10], "little")
        off = 10
    else:
        hlen = int.from_bytes(buf[8:12], "little")
        off = 12
    header = buf[off:off + hlen].decode("latin1")
    d = ast.literal_eval(header)
    dtype = np.dtype(d["descr"])
    return dtype, tuple(d["shape"]), bool(d["fortran_order"]), off + hlen


def available() -> bool:
    return _lib() is not None


def load_npz(path: str, n_threads: Optional[int] = None
             ) -> Dict[str, np.ndarray]:
    """Load all members of an npz archive into numpy arrays."""
    lib = _lib()
    if lib is None:
        with np.load(path, allow_pickle=False) as f:
            return dict(f.items())
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 4)

    h = lib.npz_open(path.encode())
    try:
        err = lib.npz_error(h)
        if err:
            raise IOError(f"npz_open({path}): {err.decode()}")
        out: Dict[str, np.ndarray] = {}
        n = lib.npz_count(h)
        for i in range(n):
            name = lib.npz_name(h, i).decode()
            if name.endswith(".npy"):
                name = name[:-4]
            raw = ctypes.c_uint64()
            comp = ctypes.c_uint64()
            method = ctypes.c_int()
            head = ctypes.create_string_buffer(4096)
            got = lib.npz_member_info(h, i, ctypes.byref(raw),
                                      ctypes.byref(comp),
                                      ctypes.byref(method), head, 4096)
            if got < 10:
                raise IOError(f"member {name}: cannot read header")
            dtype, shape, fortran, doff = _parse_npy_header(head.raw[:got])
            full = np.empty(raw.value, np.uint8)
            rc = lib.npz_read(
                h, i, full.ctypes.data_as(ctypes.c_char_p), n_threads)
            if rc != 0:
                raise IOError(f"member {name}: read failed rc={rc}")
            arr = np.frombuffer(full[doff:].data, dtype=dtype)
            arr = arr.reshape(shape, order="F" if fortran else "C")
            out[name] = arr
        return out
    finally:
        lib.npz_close(h)
