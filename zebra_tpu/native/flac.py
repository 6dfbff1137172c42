"""ctypes binding for the native FLAC decoder (``zebra_flac.cpp``).

Built lazily with g++ on first use, like the blob-log library — the audio
model calls :func:`decode_flac` for ``fLaC``-magic payloads and falls back
to ``soundfile`` when the toolchain is missing or the stream is corrupt.
Reference parity: symphonia's FLAC support in ``src/model/audio.rs:35-75``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zebra_flac.cpp")
_LIB = os.path.join(_DIR, "libzebra_flac.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB + ".tmp"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return _LIB
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.zf_decode.restype = ctypes.c_int
        lib.zf_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.zf_free.restype = None
        lib.zf_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_flac_raw(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode FLAC bytes to raw integer PCM.

    Returns ``(samples [n, channels] int32, rate, channels, bps)``. Raises
    ValueError on non-FLAC input, corrupt streams (CRC failures included),
    or when the native toolchain is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise ValueError("native FLAC decoder unavailable (no g++ toolchain)")
    out = ctypes.POINTER(ctypes.c_int32)()
    nsamples = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    bps = ctypes.c_uint32()
    rc = lib.zf_decode(
        data,
        len(data),
        ctypes.byref(out),
        ctypes.byref(nsamples),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed (rc={rc})")
    try:
        n = int(nsamples.value) * int(channels.value)
        arr = np.ctypeslib.as_array(out, shape=(n,)).astype(np.int32)
    finally:
        lib.zf_free(out)
    return (
        arr.reshape(-1, int(channels.value)),
        int(rate.value),
        int(channels.value),
        int(bps.value),
    )


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode FLAC bytes to (mono float32 samples in [-1, 1], sample rate)."""
    pcm, rate, _channels, bps = decode_flac_raw(data)
    arr = pcm.astype(np.float32) / float(2 ** (bps - 1))
    return arr.mean(axis=1), rate
