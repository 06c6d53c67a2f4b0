"""Native (C++) host components, loaded via ctypes with transparent
build-on-first-use and pure-Python fallbacks.

The TPU compute path is JAX/XLA/pallas; these cover host-side work the
Python interpreter is slow at — currently the batched MT19937 parity
stream generator (gym_soccer_tpu/core/parity.py uses it when available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mt19937_stream.cc")
_SO = os.path.join(_HERE, "_mt19937.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.mt19937_gen_streams.argtypes = [
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int]
            lib.mt19937_gen_streams.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def mt19937_streams(seeds, n_draws: int,
                    n_threads: int | None = None) -> np.ndarray | None:
    """[B, n_draws] float64 streams identical to numpy's
    RandomState(seed).random_sample(n_draws) per row, or None if the
    native library is unavailable (callers fall back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    seeds = np.ascontiguousarray(np.asarray(seeds, dtype=np.uint64))
    out = np.empty((len(seeds), n_draws), dtype=np.float64)
    if n_threads is None:
        # oversubscribe a little: bursty/stolen vCPUs (common on shared
        # hosts) schedule better with more runnable threads
        n_threads = min(2 * (os.cpu_count() or 1), 16)
    lib.mt19937_gen_streams(
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(seeds), n_draws,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads))
    return out
