"""ctypes bridge to the native C++ runtime (native/*.cpp).

The native library provides the CRC32C open-addressing registry (the
internal_find_code table analog) and the fast .mtx parser.  It is built on
demand with g++ (no pybind11 in this environment; plain C ABI + ctypes).
Pure-Python fallbacks exist for both consumers, so a missing compiler only
costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libxsmm_tpu_native.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_SO_PATH) and not _build():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib = False
            return None
        lib.xsmm_reg_create.restype = ctypes.c_void_p
        lib.xsmm_reg_create.argtypes = [ctypes.c_uint32]
        lib.xsmm_reg_destroy.argtypes = [ctypes.c_void_p]
        lib.xsmm_reg_find.restype = ctypes.c_int32
        lib.xsmm_reg_find.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int32]
        lib.xsmm_reg_insert.restype = ctypes.c_int32
        lib.xsmm_reg_insert.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int32, ctypes.c_int32]
        lib.xsmm_reg_size.restype = ctypes.c_int64
        lib.xsmm_reg_size.argtypes = [ctypes.c_void_p]
        lib.xsmm_reg_clear.argtypes = [ctypes.c_void_p]
        lib.xsmm_crc32.restype = ctypes.c_uint32
        lib.xsmm_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                   ctypes.c_uint32]
        lib.xsmm_mtx_parse.restype = ctypes.c_void_p
        lib.xsmm_mtx_parse.argtypes = [ctypes.c_char_p]
        for fn in ("xsmm_mtx_rows", "xsmm_mtx_cols", "xsmm_mtx_nnz"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.xsmm_mtx_symmetric.restype = ctypes.c_int
        lib.xsmm_mtx_symmetric.argtypes = [ctypes.c_void_p]
        lib.xsmm_mtx_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_void_p]
        lib.xsmm_mtx_free.argtypes = [ctypes.c_void_p]
        try:  # present when the .so includes spmdm.cpp (rebuilt libs)
            lib.xsmm_ell_rowmax.restype = ctypes.c_int64
            lib.xsmm_ell_rowmax.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                            ctypes.c_int64, ctypes.c_float]
            lib.xsmm_ell_pack.restype = ctypes.c_int64
            lib.xsmm_ell_pack.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_float,
                                          ctypes.c_int64, ctypes.c_void_p,
                                          ctypes.c_void_p]
            lib.xsmm_has_ell = True
        except AttributeError:
            lib.xsmm_has_ell = False
        _lib = lib
    return _lib


def ell_pack_native(a: np.ndarray, tol: float, round_to: int = 8,
                    r: Optional[int] = None):
    """Single-pass C++ ELL pack: (vals, cols, nnz, r) or None.

    a must be float32 row-major [m, k]; r is the max row population rounded
    up to ``round_to`` — pass a precomputed r (MUST be >= the true rowmax
    for the same tol, or rows are silently truncated) to skip the rowmax
    probe pass.
    """
    lib = get_lib()
    if lib is None or not getattr(lib, "xsmm_has_ell", False):
        return None
    a = np.ascontiguousarray(a, np.float32)
    m, k = a.shape
    if r is not None and r < 1:
        raise ValueError(f"ell_pack_native: r must be >= 1, got {r}")
    if r is None:
        rmax = lib.xsmm_ell_rowmax(a.ctypes.data_as(ctypes.c_void_p),
                                   m, k, tol)
        r = max(1, -(-max(int(rmax), 1) // round_to) * round_to)
    vals = np.empty((m, r), np.float32)
    cols = np.empty((m, r), np.int32)
    nnz = lib.xsmm_ell_pack(a.ctypes.data_as(ctypes.c_void_p), m, k, tol, r,
                            vals.ctypes.data_as(ctypes.c_void_p),
                            cols.ctypes.data_as(ctypes.c_void_p))
    return vals, cols, int(nnz), r


class NativeRegistry:
    """The interface core/registry.py expects from the native backend."""

    def __init__(self, capacity: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.xsmm_reg_create(capacity)
        if not self._h:
            raise MemoryError("xsmm_reg_create failed")

    def find(self, key: bytes) -> int:
        return self._lib.xsmm_reg_find(self._h, key, len(key))

    def insert(self, key: bytes, value: int) -> int:
        slot = self._lib.xsmm_reg_insert(self._h, key, len(key), value)
        if slot == -2:
            raise RuntimeError("native registry full")
        return slot

    def clear(self):
        self._lib.xsmm_reg_clear(self._h)

    def __len__(self):
        return int(self._lib.xsmm_reg_size(self._h))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.xsmm_reg_destroy(self._h)
        except Exception:
            pass


def load(capacity: int = 131072) -> NativeRegistry:
    """Entry point used by core.registry._load_native."""
    return NativeRegistry(capacity)


def crc32(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is None:
        import zlib
        return zlib.crc32(data, seed)  # not crc32c, fallback only
    return lib.xsmm_crc32(data, len(data), seed)


def read_mtx_native(path: str):
    """Parse a coordinate .mtx natively -> dense numpy array, or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.xsmm_mtx_parse(path.encode())
    if not h:
        return None
    try:
        m = lib.xsmm_mtx_rows(h)
        n = lib.xsmm_mtx_cols(h)
        nnz = lib.xsmm_mtx_nnz(h)
        ri = np.empty(nnz, np.int32)
        ci = np.empty(nnz, np.int32)
        v = np.empty(nnz, np.float64)
        lib.xsmm_mtx_copy(h, ri.ctypes.data_as(ctypes.c_void_p),
                          ci.ctypes.data_as(ctypes.c_void_p),
                          v.ctypes.data_as(ctypes.c_void_p))
        sym = bool(lib.xsmm_mtx_symmetric(h))
    finally:
        lib.xsmm_mtx_free(h)
    a = np.zeros((m, n))
    a[ri, ci] = v
    if sym:
        off = ri != ci
        a[ci[off], ri[off]] = v[off]
    return a
