"""Native (C++) host-runtime components, built on demand with g++ and
loaded through ctypes — no pybind11 dependency. Falls back to the numpy
implementations transparently when no compiler is available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None when unavailable
    or MANDO_TPU_NO_NATIVE is set."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MANDO_TPU_NO_NATIVE"):
        return None
    src = os.path.join(os.path.dirname(__file__), "minimizers.cpp")
    so = os.path.join(_build_dir(), "libmando_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.minimizers_c.restype = ctypes.c_int64
        lib.minimizers_c.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
        lib.encode_seq.restype = None
        lib.encode_seq.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p]
        lib.lookup_ranges_c.restype = None
        lib.lookup_ranges_c.argtypes = [ctypes.c_void_p] * 3 + [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
    except (subprocess.SubprocessError, OSError,
            AttributeError) as exc:
        sys.stderr.write(f"native build unavailable ({exc}); "
                         f"using numpy fallback\n")
        _LIB = None
    return _LIB


def native_minimizers(codes: np.ndarray, k: int, w: int
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(positions, hashes) via the C++ path, or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    m = max(len(codes) - k + 1, 0)
    if m == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    pos = np.empty(m, np.int64)
    hsh = np.empty(m, np.uint64)
    n = lib.minimizers_c(codes.ctypes.data, len(codes), k, w,
                         pos.ctypes.data, hsh.ctypes.data)
    return pos[:n].copy(), hsh[:n].copy()


def native_lookup_ranges(sorted_hashes: np.ndarray, bucket_lo: np.ndarray,
                         queries: np.ndarray):
    """Per-query [lo, hi) ranges in the sorted hash array, or None."""
    lib = load_native()
    if lib is None:
        return None
    queries = np.ascontiguousarray(queries, np.uint64)
    lo = np.empty(len(queries), np.int64)
    hi = np.empty(len(queries), np.int64)
    lib.lookup_ranges_c(sorted_hashes.ctypes.data, bucket_lo.ctypes.data,
                        queries.ctypes.data, len(queries),
                        lo.ctypes.data, hi.ctypes.data)
    return lo, hi
