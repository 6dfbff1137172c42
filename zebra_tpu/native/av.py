"""ctypes binding for the ffmpeg catch-all decoder (``zebra_av.cpp``).

Built lazily with g++ against the system ffmpeg 5.x dev libraries
(libavformat/libavcodec/libswresample); :func:`decode_any` is the last
native stop in the audio decode chain — aac/m4a, opus, wma, alac, and
anything else ffmpeg demuxes — before the soundfile/SDL_mixer fallbacks in
``models/audio.py``. Reference scope: symphonia's codec coverage in
``/root/reference/src/model/audio.rs:35-75``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zebra_av.cpp")
_LIB = os.path.join(_DIR, "libzebra_av.so")
_FFLIBS = ["-lavformat", "-lavcodec", "-lswresample", "-lavutil"]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB + ".tmp", *_FFLIBS],
            check=True,
            capture_output=True,
            timeout=180,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return _LIB
    except Exception:  # no toolchain or no ffmpeg dev libs — caller falls back
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
        try:
            lib = ctypes.CDLL(path)
        except OSError:  # built elsewhere, runtime libs missing here
            return None
        lib.za_decode.restype = ctypes.c_int
        lib.za_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.za_free.restype = None
        lib.za_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.za_encode_test.restype = ctypes.c_int
        lib.za_encode_test.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_any(data: bytes) -> tuple[np.ndarray, int] | None:
    """Audio bytes (any ffmpeg-supported codec) -> (mono float32 samples,
    native sample rate), or None when ffmpeg is unavailable or the bytes
    aren't decodable audio."""
    lib = get_lib()
    if lib is None:
        return None
    tmp = None
    try:
        with tempfile.NamedTemporaryFile(delete=False) as f:
            f.write(data)
            tmp = f.name
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_longlong(0)
        rate = ctypes.c_int(0)
        rc = lib.za_decode(tmp.encode(), ctypes.byref(out),
                           ctypes.byref(n), ctypes.byref(rate))
        if rc != 0 or n.value <= 0 or rate.value <= 0:
            return None
        try:
            samples = np.ctypeslib.as_array(out, shape=(n.value,)).astype(
                np.float32, copy=True
            )
        finally:
            lib.za_free(out)
        return samples, int(rate.value)
    finally:
        if tmp is not None:
            os.unlink(tmp)


def encode_test_tone(codec: str, container: str, rate: int = 44100,
                     n: int = 44100, freq: float = 440.0) -> bytes | None:
    """TEST-ONLY: encode a sine with the named ffmpeg codec/container and
    return the file bytes (None if that encoder isn't available). Lets the
    suite exercise decode paths for codecs with no sample files on disk."""
    lib = get_lib()
    if lib is None:
        return None
    with tempfile.NamedTemporaryFile(delete=False) as f:
        tmp = f.name
    try:
        rc = lib.za_encode_test(tmp.encode(), codec.encode(),
                                container.encode(), rate, n, freq)
        if rc != 0:
            return None
        with open(tmp, "rb") as f:
            return f.read()
    finally:
        os.unlink(tmp)
