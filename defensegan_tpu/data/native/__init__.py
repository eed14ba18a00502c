"""Native host data plane: ctypes bindings for the C IDX loader.

Builds libidx_loader.so on first use with the system compiler (g++/cc are
baked into this image; pybind11 is not, hence ctypes). Falls back silently
to the numpy path when no toolchain is available — callers must treat
`load_native()` returning None as 'use Python'.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "idx_loader.c")
_SO = os.path.join(_DIR, "libidx_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    for cc in ("cc", "gcc", "g++"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-pthread", _SRC, "-o", _SO],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the loaded library, building it if needed; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.idx_normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_float, ctypes.c_int]
        lib.idx_normalize_u8.restype = ctypes.c_int
        lib.idx_parse_header.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
        lib.idx_parse_header.restype = ctypes.c_int
        _lib = lib
        return _lib


def parse_idx_u8(raw: bytes, nthreads: int = 8) -> Optional[np.ndarray]:
    """Parse an uncompressed uint8 IDX buffer into a float32 [0,1] array
    using the native loader. Returns None if the native path is unavailable
    or the buffer isn't uint8 IDX (caller falls back to numpy)."""
    lib = load_native()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8)
    dims = (ctypes.c_int64 * 8)()
    dtype_code = ctypes.c_int(0)
    ndim = lib.idx_parse_header(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size, dims,
        ctypes.byref(dtype_code))
    if ndim <= 0 or dtype_code.value != 0x08:
        return None
    shape = tuple(int(dims[i]) for i in range(ndim))
    n = int(np.prod(shape))
    payload_off = 4 + 4 * ndim
    if buf.size < payload_off + n:
        return None
    out = np.empty(n, np.float32)
    rc = lib.idx_normalize_u8(
        buf[payload_off:payload_off + n].ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, 1.0 / 255.0, nthreads)
    if rc != 0:
        return None
    return out.reshape(shape)
