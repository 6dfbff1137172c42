"""Native host-runtime components (C++): packed blob log + flat id map.

Built lazily with g++ on first import (cached next to the source, keyed by
source mtime); everything degrades gracefully to the pure-Python fallbacks
when no toolchain is present. See ``zebra_store.cpp`` for the design notes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zebra_store.cpp")
_LIB = os.path.join(_DIR, "libzebra_store.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-lz", "-o", _LIB + ".tmp"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return _LIB
    except Exception:
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
        lib.zs_open.restype = ctypes.c_void_p
        lib.zs_open.argtypes = [ctypes.c_char_p]
        lib.zs_put.restype = ctypes.c_int
        lib.zs_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                               ctypes.c_uint32, ctypes.c_int]
        lib.zs_get_len.restype = ctypes.c_int64
        lib.zs_get_len.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zs_get.restype = ctypes.c_int64
        lib.zs_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_char_p, ctypes.c_uint32]
        lib.zs_del.restype = ctypes.c_int
        lib.zs_del.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zs_flush.restype = ctypes.c_int
        lib.zs_flush.argtypes = [ctypes.c_void_p]
        lib.zs_count.restype = ctypes.c_int64
        lib.zs_count.argtypes = [ctypes.c_void_p]
        lib.zs_compact.restype = ctypes.c_int
        lib.zs_compact.argtypes = [ctypes.c_void_p]
        lib.zs_close.restype = None
        lib.zs_close.argtypes = [ctypes.c_void_p]
        lib.zim_new.restype = ctypes.c_void_p
        lib.zim_new.argtypes = [ctypes.c_uint64]
        lib.zim_free.restype = None
        lib.zim_free.argtypes = [ctypes.c_void_p]
        lib.zim_put.restype = ctypes.c_int
        lib.zim_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.zim_get.restype = ctypes.c_int64
        lib.zim_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zim_del.restype = ctypes.c_int
        lib.zim_del.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zim_size.restype = ctypes.c_int64
        lib.zim_size.argtypes = [ctypes.c_void_p]
        lib.zim_put_many.restype = ctypes.c_int
        lib.zim_put_many.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64), ctypes.c_uint64]
        lib.zim_get_many.restype = ctypes.c_int
        lib.zim_get_many.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64), ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeBlobStore:
    """Packed append-only blob log (see zebra_store.cpp)."""

    def __init__(self, directory: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.zs_open(directory.encode())
        if not self._h:
            raise RuntimeError(f"failed to open blob log in {directory}")

    def put(self, key: bytes, data: bytes, compress: bool = True) -> None:
        assert len(key) == 16
        rc = self._lib.zs_put(self._h, key, data, len(data), 1 if compress else 0)
        if rc != 0:
            raise IOError("blob append failed")

    def get(self, key: bytes) -> bytes | None:
        n = self._lib.zs_get_len(self._h, key)
        if n < 0:
            return None
        buf = ctypes.create_string_buffer(max(int(n), 1))
        got = self._lib.zs_get(self._h, key, buf, max(int(n), 1))
        if got < 0:
            return None
        return buf.raw[:got]

    def delete(self, key: bytes) -> None:
        self._lib.zs_del(self._h, key)

    def flush(self) -> None:
        self._lib.zs_flush(self._h)

    def compact(self) -> None:
        self._lib.zs_compact(self._h)

    def __len__(self) -> int:
        return int(self._lib.zs_count(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.zs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeIdMap:
    """Flat open-addressing 16-byte-key -> int64 map (24B/entry)."""

    def __init__(self, initial_cap: int = 1024):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.zim_new(initial_cap)

    def put(self, key: bytes, value: int) -> None:
        self._lib.zim_put(self._h, key, value)

    def get(self, key: bytes) -> int | None:
        v = self._lib.zim_get(self._h, key)
        return None if v < 0 else int(v)

    def delete(self, key: bytes) -> bool:
        return self._lib.zim_del(self._h, key) == 0

    def put_many(self, keys: bytes, values) -> None:
        """keys: concatenated 16-byte ids; values: int64 array."""
        import numpy as np

        v = np.ascontiguousarray(values, dtype=np.int64)
        n = len(keys) // 16
        self._lib.zim_put_many(
            self._h, keys, v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
        )

    def get_many(self, keys: bytes):
        import numpy as np

        n = len(keys) // 16
        out = np.empty(n, dtype=np.int64)
        self._lib.zim_get_many(
            self._h, keys, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
        )
        return out

    def __len__(self) -> int:
        return int(self._lib.zim_size(self._h))

    def __del__(self):
        try:
            if self._h:
                self._lib.zim_free(self._h)
                self._h = None
        except Exception:
            pass
