"""ctypes bindings for the native AWQ repacker (_repack.c).

Builds the shared library on first use (gcc -O3); falls back transparently to the
numpy implementation in awq.py when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "_repack.c")
_LIB_PATH = os.path.join(_HERE, "_repack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["gcc", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.awq_repack_weights.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.awq_unpack_zeros.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def repack_weights_native(qweight: np.ndarray) -> Optional[np.ndarray]:
    """qweight int32 [K, N/8] -> split-halves uint8 [K/2, N]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    K, n_words = qweight.shape
    N = n_words * 8
    q = np.ascontiguousarray(qweight.view(np.uint32))
    out = np.empty((K // 2, N), np.uint8)
    scratch = np.empty(2 * N, np.uint8)
    lib.awq_repack_weights(
        q.ctypes.data_as(ctypes.c_void_p), K, N,
        out.ctypes.data_as(ctypes.c_void_p),
        scratch.ctypes.data_as(ctypes.c_void_p))
    return out


def unpack_zeros_native(qzeros: np.ndarray) -> Optional[np.ndarray]:
    """qzeros int32 [G, N/8] -> float32 [G, N]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    G, n_words = qzeros.shape
    N = n_words * 8
    q = np.ascontiguousarray(qzeros.view(np.uint32))
    out = np.empty((G, N), np.float32)
    scratch = np.empty(N, np.uint8)
    lib.awq_unpack_zeros(
        q.ctypes.data_as(ctypes.c_void_p), G, N,
        out.ctypes.data_as(ctypes.c_void_p),
        scratch.ctypes.data_as(ctypes.c_void_p))
    return out
