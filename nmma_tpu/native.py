"""ctypes bindings for the native C++ IO library (graceful fallback).

Builds ``native/libnmma_native.so`` on demand (make) and exposes
``parse_table`` / ``parse_many`` — the fast mmap + thread-pool ASCII-table
loader used for training-grid and EOS-table ingestion. Every call degrades
to ``np.loadtxt`` when the toolchain or library is unavailable, so the
Python path never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnmma_native.so")
_lib = None
_tried = False


def _load_library():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.nmma_parse_table.restype = ctypes.POINTER(ctypes.c_double)
    lib.nmma_parse_table.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.nmma_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.nmma_parse_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def parse_table(path) -> np.ndarray:
    """Parse one whitespace numeric table -> [rows, cols] float64 array."""
    lib = _load_library()
    if lib is None:
        return np.atleast_2d(np.loadtxt(path))
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.nmma_parse_table(str(path).encode(), ctypes.byref(rows),
                               ctypes.byref(cols))
    if not ptr or rows.value == 0:
        return np.atleast_2d(np.loadtxt(path))
    arr = np.ctypeslib.as_array(ptr, shape=(rows.value, cols.value)).copy()
    lib.nmma_free(ptr)
    return arr


def parse_many(paths, n_threads=0) -> list:
    """Parse many tables concurrently -> list of float64 arrays."""
    lib = _load_library()
    paths = [str(p) for p in paths]
    if lib is None:
        return [np.atleast_2d(np.loadtxt(p)) for p in paths]
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out_data = (ctypes.POINTER(ctypes.c_double) * n)()
    out_rows = (ctypes.c_int64 * n)()
    out_cols = (ctypes.c_int64 * n)()
    lib.nmma_parse_many(c_paths, n, out_data, out_rows, out_cols,
                        int(n_threads))
    results = []
    for i in range(n):
        if out_data[i] and out_rows[i] > 0:
            arr = np.ctypeslib.as_array(
                out_data[i], shape=(out_rows[i], out_cols[i])).copy()
            lib.nmma_free(out_data[i])
            results.append(arr)
        else:
            results.append(np.atleast_2d(np.loadtxt(paths[i])))
    return results
