"""Streaming, np.load-compatible snapshot writer.

``np.savez`` into one ``io.BytesIO`` buffers the ENTIRE snapshot in host RAM
before a single byte reaches disk — at 10M x 768 f32 that is a ~30GB spike on
every ``save()`` and every delta-log checkpoint fold. This module writes the
same ``.npz`` container (a ZIP_STORED archive of ``.npy`` members, readable
by plain ``np.load``) but streams every array to disk in bounded chunks.

Device (jax) arrays are first-class inputs: they are fetched slab-chunk by
slab-chunk (device slice -> host -> zip member), so the full slab never
materialises host-side either — the transient is one chunk (default 64MB),
not the multi-GB slab. bfloat16 device arrays ship as raw uint16 bit
patterns (half the readback bytes AND half the snapshot bytes — the format
contract of :func:`zebra_tpu.index.base.slab_from_np`).

The reference's analogue is fjall's LSM segment streaming
(``src/database/index/lsh.rs:71-89``): it never holds a whole partition in
memory to persist it; neither should we.
"""

from __future__ import annotations

import contextlib
import os
import zipfile

import numpy as np

#: per-chunk byte budget for streamed members (device fetch + zip write)
CHUNK_BYTES = 64 << 20


class CaptureAborted(RuntimeError):
    """Raised by a :class:`ChunkedSource` fetch when the capture's
    consistency premise broke mid-stream (structural rebuild, explicit
    save, shape growth) — the writer unwinds and the caller discards the
    partial file."""


class ChunkedSource:
    """Snapshot member whose data is produced chunk-by-chunk by a callback.

    The background log fold uses this for device arrays too large to clone
    whole (HBM budget): each chunk is sliced on device under a BRIEF read
    lock (donation-safe — the slice dispatch precedes any later donating
    insert) and fetched to host off-lock, so neither a full device-side
    clone nor a write-locked readback ever exists. Chunks from different
    lock windows may interleave with mutations (a FUZZY capture); the WAL
    suffix replay repairs the mixture at load (see
    ``Database._fold_chunked_capture`` for the correctness argument).

    ``fetch(prefix, s, e) -> np.ndarray`` returns rows ``[s:e)`` of the
    member (``prefix=()``), or of member row ``prefix[0]`` when one axis-0
    row alone exceeds the chunk budget (stacked per-shard slabs). It may
    raise :class:`CaptureAborted`.
    """

    def __init__(self, shape: tuple, dtype: np.dtype, fetch):
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self.fetch = fetch


def _is_device_array(arr) -> bool:
    import jax

    return isinstance(arr, jax.Array) and not isinstance(arr, np.ndarray)


def _encode_np(arr: np.ndarray) -> np.ndarray:
    """Host-side snapshot encoding: ml_dtypes bf16 -> raw uint16 bits."""
    import ml_dtypes

    if arr.dtype == ml_dtypes.bfloat16:  # np reports kind "V" for ml_dtypes
        return arr.view(np.uint16)
    if arr.dtype.kind == "V" or arr.dtype.names:
        raise ValueError("structured arrays are not snapshot members")
    return arr


def _member_meta(arr):
    """(shape, np dtype of the ENCODED stream) for any input array."""
    if isinstance(arr, ChunkedSource):
        return arr.shape, arr.dtype
    if _is_device_array(arr):
        import jax.numpy as jnp

        if arr.dtype == jnp.bfloat16:
            return tuple(arr.shape), np.dtype(np.uint16)
        return tuple(arr.shape), np.dtype(arr.dtype)
    a = _encode_np(np.asarray(arr))
    return tuple(a.shape), a.dtype


def _iter_source_chunks(src: ChunkedSource):
    """Yield encoded chunks of a :class:`ChunkedSource` in C order."""
    shape, dtype = src.shape, src.dtype
    if len(shape) == 0:
        yield _encode_np(np.asarray(src.fetch((), 0, 1))).reshape(())
        return
    n = shape[0]
    row_bytes = dtype.itemsize * int(np.prod(shape[1:], dtype=np.int64))
    if n == 0:
        yield np.zeros((0, *shape[1:]), dtype=dtype)
        return
    if row_bytes > CHUNK_BYTES and len(shape) > 1:
        # one axis-0 row already over budget (stacked per-shard slab
        # [S, cap, D]): chunk each row along ITS axis 0 instead
        sub = shape[1]
        sub_row = dtype.itemsize * int(np.prod(shape[2:], dtype=np.int64))
        rows = max(1, CHUNK_BYTES // max(sub_row, 1))
        for i in range(n):
            for s in range(0, sub, rows):
                e = min(sub, s + rows)
                yield np.ascontiguousarray(
                    _encode_np(np.asarray(src.fetch((i,), s, e)))
                )
        return
    rows = max(1, CHUNK_BYTES // max(row_bytes, 1))
    for s in range(0, n, rows):
        e = min(n, s + rows)
        yield np.ascontiguousarray(_encode_np(np.asarray(src.fetch((), s, e))))


def _iter_chunks(arr, shape, dtype):
    """Yield C-contiguous np chunks of ``arr`` along axis 0 (whole array for
    0-d), each <= CHUNK_BYTES; device arrays fetch per chunk."""
    if isinstance(arr, ChunkedSource):
        yield from _iter_source_chunks(arr)
        return
    if len(shape) == 0:
        yield _encode_np(np.asarray(arr)).reshape(())
        return
    n = shape[0]
    row_bytes = dtype.itemsize * int(np.prod(shape[1:], dtype=np.int64))
    if row_bytes > CHUNK_BYTES and len(shape) > 1:
        # one axis-0 row is already over budget (e.g. a stacked per-shard
        # slab [S, cap, D]): stream the flattened view instead — reshape is
        # free for C-contiguous arrays on host and device alike
        flat = arr.reshape(-1) if _is_device_array(arr) else np.asarray(arr).reshape(-1)
        yield from _iter_chunks(flat, (int(np.prod(shape, dtype=np.int64)),), dtype)
        return
    rows = max(1, CHUNK_BYTES // max(row_bytes, 1))
    for s in range(0, n, rows):
        e = min(n, s + rows)
        chunk = arr[s:e]
        if _is_device_array(chunk):
            chunk = np.asarray(chunk)  # device slice -> host, one chunk
        yield np.ascontiguousarray(_encode_np(np.asarray(chunk)))
    if n == 0:
        yield np.zeros((0, *shape[1:]), dtype=dtype)


def _member_data_offset(f, header_offset: int) -> int:
    """File offset of a zip member's raw data (local header parsed by hand —
    the zip local header is 30 fixed bytes + name + extra)."""
    f.seek(header_offset)
    hdr = f.read(30)
    if hdr[:4] != b"PK\x03\x04":
        raise ValueError("corrupt zip local header")
    name_len = int.from_bytes(hdr[26:28], "little")
    extra_len = int.from_bytes(hdr[28:30], "little")
    return header_offset + 30 + name_len + extra_len


def npz_member_memmap(path: str, name: str) -> np.ndarray:
    """Read-only ``np.memmap`` view of one member of an UNCOMPRESSED
    ``.npz`` (every snapshot this package writes is ZIP_STORED).

    This is the load-side mirror of :func:`write_npz_streamed` (round-3
    verdict #3): ``NpzFile.__getitem__`` materialises the WHOLE member in
    anonymous host memory (a 10M x 768 f32 slab is ~30GB), while a memmap
    view reads only the pages a consumer touches — and those live in the
    evictable page cache, not process RSS. ``jax.device_put`` /
    ``jnp.asarray`` of the view streams file -> device with no full
    host-side copy; fancy-indexed gathers (the reshard path) touch only the
    gathered rows' pages.

    Raises ``ValueError`` for compressed or Fortran-ordered members (the
    caller falls back to the eager ``NpzFile`` read).
    """
    with zipfile.ZipFile(path) as zf:
        info = zf.getinfo(f"{name}.npy")
        if info.compress_type != zipfile.ZIP_STORED:
            raise ValueError(f"member {name} is compressed; cannot memmap")
        header_offset = info.header_offset
    with open(path, "rb") as f:
        data_off = _member_data_offset(f, header_offset)
        f.seek(data_off)
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        if fortran:
            raise ValueError(f"member {name} is Fortran-ordered")
        array_off = f.tell()
    if len(shape) == 0:  # np.memmap cannot express 0-d; tiny anyway
        raise ValueError(f"member {name} is 0-d")
    return np.memmap(path, dtype=dtype, mode="r", offset=array_off,
                     shape=shape, order="C")


class SnapshotReader:
    """Mapping view over a snapshot's arrays with bounded-memory reads.

    ``reader[name]`` returns a read-only ``np.memmap`` of the member when
    possible (uncompressed npz, ndim >= 1), else the eager ``NpzFile``
    decode (0-d members, compressed legacy files). Consumers that MUTATE a
    member must copy it first (``np.ascontiguousarray`` of a read-only
    memmap copies).
    """

    def __init__(self, path: str, npz):
        self._path = path
        self._npz = npz

    @property
    def files(self):
        return self._npz.files

    def __contains__(self, name: str) -> bool:
        return name in self._npz

    def __getitem__(self, name: str):
        try:
            return npz_member_memmap(self._path, name)
        except Exception:
            return self._npz[name]


@contextlib.contextmanager
def open_snapshot_arrays(directory: str, meta: dict):
    """Yield the snapshot's array mapping, whichever container wrote it.

    Dispatches on ``meta["snapshot_format"]`` (recorded by ``save()``;
    absent in pre-round-3 snapshots, which are always npz). npz yields a
    :class:`SnapshotReader` (members are read-only memmap views — the
    restore path's peak anonymous host memory is ~zero; the device slab is
    fed straight from the page cache); orbax yields an eager
    ``{name: np.ndarray}`` dict
    (:func:`zebra_tpu.storage.orbax_snap.load_arrays_orbax`).
    """
    if meta.get("snapshot_format", "npz") == "orbax":
        from zebra_tpu.storage.orbax_snap import load_arrays_orbax

        yield load_arrays_orbax(os.path.join(directory, "arrays.orbax"))
        return
    path = os.path.join(directory, "arrays.npz")
    with np.load(path) as z:
        yield SnapshotReader(path, z)


def write_npz_streamed(path: str, arrays: dict, fsync: bool = True) -> None:
    """Write ``arrays`` as an uncompressed ``.npz`` with bounded memory.

    Atomic: writes to a sibling tmp file, fsyncs, then renames over ``path``
    (same crash contract as :func:`zebra_tpu.utils.fsync_write`).

    Values may be np arrays, np scalars, or jax device arrays (fetched in
    chunks; bf16 encoded as uint16 bits per the slab snapshot contract).
    """
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        with zipfile.ZipFile(f, "w", zipfile.ZIP_STORED, allowZip64=True) as zf:
            for name, arr in arrays.items():
                shape, dtype = _member_meta(arr)
                with zf.open(f"{name}.npy", "w", force_zip64=True) as fp:
                    np.lib.format.write_array_header_2_0(
                        fp,
                        {
                            "descr": np.lib.format.dtype_to_descr(dtype),
                            "fortran_order": False,
                            "shape": shape,
                        },
                    )
                    for chunk in _iter_chunks(arr, shape, dtype):
                        if chunk.size == 0:
                            continue
                        # flat byte view without copying (0-d arrays can't
                        # cast; their .data view is already the raw bytes)
                        mv = memoryview(chunk)
                        fp.write(mv.cast("B") if chunk.ndim else mv)
        f.flush()
        if fsync:
            os.fsync(f.fileno())
    os.replace(tmp, path)
    if fsync:
        dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
