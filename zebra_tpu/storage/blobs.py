"""Compressed per-record document blob store.

Reference behaviour: each document is LZ4-frame-compressed into
``{uuid}/{vec_id}.lz4`` next to the database file and read back on query
(``src/database/core.rs:322-380``). Same layout here; the codec is lz4 when
the ``lz4`` package is importable and zlib otherwise (both recorded in the
file extension so stores stay self-describing). Writes fsync per batch — the
reference fsyncs per record (``lsh.rs:87-89``); batch-granular durability is
the deliberate TPU-era tradeoff (1000x fewer fsyncs, same crash consistency
per insert call).

A native C++ packed blob-log backend (``zebra_tpu/native``) replaces the
one-file-per-doc layout for large stores when available.
"""

from __future__ import annotations

import os
import zlib
from concurrent.futures import ThreadPoolExecutor

try:  # optional, not in the base image
    import lz4.frame as _lz4  # type: ignore

    _HAVE_LZ4 = True
except Exception:  # pragma: no cover
    _lz4 = None
    _HAVE_LZ4 = False

_WORKERS = min(32, (os.cpu_count() or 8))


class DocumentStore:
    """Directory of compressed document blobs keyed by vector id."""

    def __init__(self, directory: str, codec: str | None = None):
        self.directory = directory
        if codec is None:
            codec = "lz4" if _HAVE_LZ4 else "zlib"
        if codec == "lz4" and not _HAVE_LZ4:
            raise RuntimeError("store was written with lz4 but lz4 is unavailable")
        self.codec = codec
        self.ext = "lz4" if codec == "lz4" else "z"

    def _path(self, doc_id: bytes) -> str:
        return os.path.join(self.directory, f"{doc_id.hex()}.{self.ext}")

    def _compress(self, data: bytes) -> bytes:
        if self.codec == "lz4":
            return _lz4.compress(data)
        return zlib.compress(data, level=1)

    def _decompress(self, data: bytes) -> bytes:
        if self.codec == "lz4":
            return _lz4.decompress(data)
        return zlib.decompress(data)

    def save_many(self, ids: list[bytes], docs: list[bytes]) -> None:
        """Parallel compressed writes (reference: rayon loop,
        ``core.rs:329-345``), one fsync pass at the end."""
        os.makedirs(self.directory, exist_ok=True)

        def _write(pair):
            doc_id, doc = pair
            path = self._path(doc_id)
            with open(path, "wb") as f:
                f.write(self._compress(doc))
                f.flush()
                os.fsync(f.fileno())

        with ThreadPoolExecutor(max_workers=_WORKERS) as ex:
            list(ex.map(_write, zip(ids, docs)))

    def read_many(self, ids: list[bytes]) -> dict[bytes, bytes]:
        """Parallel reads; missing blobs are skipped (reference:
        ``core.rs:358-380`` returns only found documents)."""

        def _read(doc_id):
            try:
                with open(self._path(doc_id), "rb") as f:
                    return doc_id, self._decompress(f.read())
            except FileNotFoundError:
                return doc_id, None

        with ThreadPoolExecutor(max_workers=_WORKERS) as ex:
            out = dict(ex.map(_read, ids))
        return {k: v for k, v in out.items() if v is not None}

    def remove_many(self, ids: list[bytes]) -> None:
        for doc_id in ids:
            try:
                os.remove(self._path(doc_id))
            except FileNotFoundError:
                pass

    def clear(self) -> None:
        if not os.path.isdir(self.directory):
            return
        for name in os.listdir(self.directory):
            try:
                os.remove(os.path.join(self.directory, name))
            except OSError:
                pass
        try:
            os.rmdir(self.directory)
        except OSError:
            pass


class PackedDocumentStore:
    """Documents in the native C++ packed blob log (one file, batch fsync)
    instead of one compressed file per record. Preferred for new databases
    when the native library builds; same API as :class:`DocumentStore`."""

    codec = "packed-zlib"

    def __init__(self, directory: str):
        self.directory = directory
        # Opened lazily so constructing a store (e.g. right after
        # ``clear_database``) does not recreate the on-disk directory until
        # the first actual read/write.
        self._store = None
        if os.path.isdir(directory):
            self._open()

    def _open(self):
        from zebra_tpu.native import NativeBlobStore

        os.makedirs(self.directory, exist_ok=True)
        self._store = NativeBlobStore(self.directory)
        return self._store

    def save_many(self, ids: list[bytes], docs: list[bytes]) -> None:
        store = self._store or self._open()
        for doc_id, doc in zip(ids, docs):
            store.put(doc_id, doc)
        store.flush()

    def read_many(self, ids: list[bytes]) -> dict[bytes, bytes]:
        if self._store is None:
            return {}
        out = {}
        for doc_id in ids:
            doc = self._store.get(doc_id)
            if doc is not None:
                out[doc_id] = doc
        return out

    def remove_many(self, ids: list[bytes]) -> None:
        if self._store is None:
            return
        for doc_id in ids:
            self._store.delete(doc_id)
        self._store.flush()

    def compact(self) -> None:
        if self._store is not None:
            self._store.compact()

    def clear(self) -> None:
        if self._store is not None:
            self._store.close()
            self._store = None
        import shutil

        shutil.rmtree(self.directory, ignore_errors=True)


def make_document_store(directory: str, backend: str | None = None, codec: str | None = None):
    """Pick a blob backend: explicit > native packed log > per-file."""
    if backend == "files":
        return DocumentStore(directory, codec=codec)
    if backend == "packed":
        return PackedDocumentStore(directory)
    try:
        from zebra_tpu import native

        if native.available():
            return PackedDocumentStore(directory)
    except Exception:
        pass
    return DocumentStore(directory, codec=codec)
