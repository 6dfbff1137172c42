"""ctypes loader for the native pair-quantisation kernel (zebra_quant.cpp).

Same lazy-build pattern as the blob store (``native/__init__.py``): compiled
with g++ on first use, cached next to the source keyed by mtime, and every
consumer degrades to the numpy fallback (``index/ivf.quantise_pair_host``'s
f64 path) when no toolchain exists. ``-O3 -march=native`` first (the fmaf
must be a hardware FMA to be fast; it is correctly rounded either way), plain
``-O2`` as the portable retry.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zebra_quant.cpp")
_LIB = os.path.join(_DIR, "libzebra_quant.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    base = ["g++", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB + ".tmp"]
    for extra in (["-O3", "-march=native"], ["-O2"]):
        try:
            subprocess.run(
                base[:1] + extra + base[1:],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(_LIB + ".tmp", _LIB)
            return _LIB
        except Exception:
            continue
    return None


def get_lib():
    """The loaded CDLL, or None when native support is unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.zq_quantise_pair.restype = ctypes.c_int
        lib.zq_quantise_pair.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
