"""ctypes bindings for the native host-side kernels (``native/``).

Builds the shared library on first use (plain ``g++``; seconds) and caches
it next to the sources. Every entry point has a pure-Python fallback, so
environments without a toolchain lose speed, not functionality.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdetikzify_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DETIKZIFY_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.eed_distance.restype = ctypes.c_double
        lib.eed_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int32]
        lib.resize_normalize.restype = None
        lib.resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_float]
        lib.count_ngrams.restype = ctypes.c_int64
        lib.count_ngrams.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def eed_distance_ids(hyp: Sequence[int], ref: Sequence[int],
                     blank_id: int) -> Optional[float]:
    """Native EED over token-id sequences; None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(hyp, np.int32)
    r = np.ascontiguousarray(ref, np.int32)
    return float(lib.eed_distance(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        np.int32(blank_id)))


def count_ngrams_ids(ids: Sequence[int], max_n: int):
    """Hashed n-gram counts (FNV-1a over int32 token ids, n in the seed)
    for one text; returns (hashes u64, counts i64) or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(ids, np.int32)
    cap = max(len(arr) * max_n, 1)
    hashes = np.empty((cap,), np.uint64)
    counts = np.empty((cap,), np.int64)
    n = lib.count_ngrams(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr),
        int(max_n),
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
    return hashes[:n], counts[:n]


def resize_normalize(image: np.ndarray, size: int, mean: float = 0.5,
                     std: float = 0.5) -> Optional[np.ndarray]:
    """uint8 HWC RGB -> normalized float32 [size, size, 3]; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, np.uint8)
    h, w = src.shape[:2]
    dst = np.empty((size, size, 3), np.float32)
    lib.resize_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        np.float32(mean), np.float32(std))
    return dst
