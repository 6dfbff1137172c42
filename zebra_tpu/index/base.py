"""Shared host orchestration for every index backend.

Owns what XLA's static-shape world can't: id<->slot maps, batch staging,
growth/rebuild policy hooks, and snapshot scaffolding. Backends (LSH bucket
tables, IVF cluster blocks, flat scan) plug in via a small set of device
hooks. The reference's counterpart is the single ``LSHIndex`` facade over
fjall partitions (``src/database/index/lsh.rs:144-172``); here the facade is
split host/device so the device half stays a pure jit pytree.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import IndexOptions
from zebra_tpu.utils import fsync_write, next_pow2, uuid7_batch

_MIN_BATCH = 256
#: insert batch width (vectors per device dispatch)
BATCH = 65536


class IdSlotMap:
    """id (16 bytes) -> slot map backed by the native C++ open-addressing
    table when available (24B/entry, bulk put/get — ``native/zebra_store.cpp``)
    with a plain dict fallback. Iteration is deliberately NOT offered: the
    live set is always recoverable from ``_slot_ids`` (non-empty == live)."""

    def __init__(self):
        self._native = None
        self._dict: dict[bytes, int] | None = None
        try:
            from zebra_tpu import native

            if native.available():
                self._native = native.NativeIdMap(4096)
        except Exception:
            self._native = None
        if self._native is None:
            self._dict = {}

    def __len__(self) -> int:
        return len(self._native) if self._native is not None else len(self._dict)

    def __contains__(self, key: bytes) -> bool:
        if self._native is not None:
            return self._native.get(bytes(key)) is not None
        return key in self._dict

    def get(self, key: bytes):
        if self._native is not None:
            return self._native.get(bytes(key))
        return self._dict.get(key)

    def put_many(self, ids: list[bytes], slots) -> None:
        if self._native is not None:
            self._native.put_many(b"".join(ids), slots)
        else:
            for i, s in zip(ids, slots):
                self._dict[i] = int(s)

    def pop(self, key: bytes, default=None):
        if self._native is not None:
            v = self._native.get(bytes(key))
            if v is not None:
                self._native.delete(bytes(key))
                return v
            return default
        return self._dict.pop(key, default)


@jax.jit
def _pack_results(d, s, v):
    """Pack (dists f32, slots i32, valid bool) into ONE int32 array so results
    come back in a single device->host transfer (the slow direction).

    The float distances travel as bit patterns inside the int array — the
    reverse (ints as f32 bit patterns) would flush small slot ids to zero on
    TPU, which treats denormal floats as 0.
    """
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(d, jnp.int32), s, v.astype(jnp.int32)],
        axis=1,
    )


def slab_to_np(vectors) -> np.ndarray:
    """Snapshot encoding of the slab: bf16 ships as raw uint16 bit patterns
    (half the snapshot bytes AND half the device->host readback vs upcasting
    to f32); f32 stays f32."""
    if vectors.dtype == jnp.bfloat16:
        import ml_dtypes

        return np.asarray(vectors).view(np.uint16)
    return np.asarray(vectors, dtype=np.float32)


def slab_from_np(arr: np.ndarray, dtype):
    """Inverse of :func:`slab_to_np` (handles legacy f32 snapshots too)."""
    if arr.dtype == np.uint16:
        import ml_dtypes

        return jnp.asarray(arr.view(ml_dtypes.bfloat16)).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def _unpack_results(packed: np.ndarray, nq: int, k: int):
    d = packed[:nq, :k].view(np.float32)
    s = packed[:nq, k : 2 * k]
    v = packed[:nq, 2 * k :] > 0
    return d, s, v


class BaseVectorIndex:
    """Host-side index facade: id maps + batching + persistence scaffolding.

    Subclasses implement the device hooks:
      ``_fresh_state(n_hint, data)``      build device state for ~n vectors
      ``_before_batches(n)``              pre-insert capacity work (optional)
      ``_insert_batch(batch, count)``     device insert; returns slots [count]
      ``_delete_slots_device(arr)``       tombstone an int32 slot array
      ``_query_device(qj, k, exact)``     device search -> (d, s, v)
      ``_maybe_rebuild()``                growth policy (optional)
      ``_snapshot_arrays()``              dict of np arrays for save()
      ``_restore_arrays(z)``              rebuild device state from snapshot

    API parity with the reference (``lsh.rs``): add(:440-466),
    remove(:473-503), search(:544-565), deduplicate(:270-288),
    clear(:506-529), is_empty/no_vectors/no_trees(:389-409), save(:170-172).
    """

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        options: IndexOptions | None = None,
        metric_power: float = 3.0,
    ):
        self.dim = int(dim)
        self.metric = metric
        self.metric_power = float(metric_power)
        self.options = options or IndexOptions()
        #: stored (device) dimension — subclasses may pad for kernel alignment
        self._dev_dim = self.dim
        self.state = None
        #: slab-slot -> 16-byte id (b"" for never-used / dead slots; this is
        #: THE live-set iteration source — non-empty means live)
        self._slot_ids: list[bytes] = []
        self._id_to_slot = IdSlotMap()
        self._built_n = 0
        self._rng = np.random.default_rng(self.options.seed)

    # -- introspection (reference lsh.rs:389-409) ---------------------------

    def __len__(self) -> int:
        return len(self._id_to_slot)

    def __contains__(self, doc_id: bytes) -> bool:
        return doc_id in self._id_to_slot

    def no_vectors(self) -> bool:
        return len(self._id_to_slot) == 0

    def no_tables(self) -> bool:
        return self.state is None

    def is_empty(self) -> bool:
        return self.no_vectors() or self.no_tables()

    @property
    def dtype(self):
        return jnp.bfloat16 if self.options.dtype == "bfloat16" else jnp.float32

    # -- device hooks --------------------------------------------------------

    def _fresh_state(self, n_hint: int, data: np.ndarray | None):
        raise NotImplementedError

    def _before_batches(self, n: int) -> None:
        """Reserve capacity for an incoming batch run (optional)."""

    def _insert_batch_dev(self, batch: jnp.ndarray, count: int):
        """Insert a staged device batch; return its slots — either an np
        array (host-mirrored allocators) or a device array resolved later
        (data-dependent placement)."""
        raise NotImplementedError

    def _resolve_failed(self, rows: np.ndarray) -> np.ndarray:
        """Place rows whose deferred slots came back negative (backend grew
        some capacity); returns their final slots. Default: never happens."""
        raise RuntimeError(f"{type(self).__name__} reported failed inserts")

    def _delete_slots_device(self, slots: np.ndarray) -> None:
        raise NotImplementedError

    def _query_device(self, qj: jnp.ndarray, k: int, exact: bool):
        raise NotImplementedError

    def _maybe_rebuild(self) -> None:
        """Growth / compaction policy after a mutation (optional)."""

    def _snapshot_arrays(self) -> dict:
        raise NotImplementedError

    def _restore_arrays(self, z) -> None:
        raise NotImplementedError

    # -- build ---------------------------------------------------------------

    def _pad_dim(self, arr: np.ndarray) -> np.ndarray:
        if arr.shape[-1] == self._dev_dim:
            return arr
        out = np.zeros((*arr.shape[:-1], self._dev_dim), dtype=np.float32)
        out[..., : arr.shape[-1]] = arr
        return out

    # -- insert ----------------------------------------------------------------

    def add(self, vectors: np.ndarray, ids: list[bytes] | None = None) -> list[bytes]:
        """Insert vectors; returns their new ids (reference ``add``,
        ``lsh.rs:440-466``: first call builds the index, later calls are
        incremental — same here)."""
        vectors = np.asarray(vectors)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vectors.shape[-1]}")
        n = vectors.shape[0]
        if n == 0:
            return []
        if ids is None:
            ids = uuid7_batch(n)
        else:
            if len(ids) != n:
                raise ValueError("ids/vectors length mismatch")
            # The snapshot format stores ids as fixed [n,16] bytes with the
            # all-zero row meaning "empty slot" — enforce that contract here
            # rather than crash in save()/silently drop on load().
            seen = set()
            for i in ids:
                if not isinstance(i, (bytes, bytearray)) or len(i) != 16:
                    raise ValueError("ids must be 16-byte bytes values")
                if i == b"\x00" * 16:
                    raise ValueError("the all-zero id is reserved")
                if i in seen or i in self._id_to_slot:
                    raise ValueError(f"duplicate id: {bytes(i).hex()}")
                seen.add(bytes(i))

        if self.state is None:
            self.state = self._fresh_state(n, vectors)
            self._built_n = n
        self._before_batches(n)
        self._insert_batches(vectors, ids)
        self._maybe_rebuild()
        return ids

    @property
    def _wire_dtype(self):
        """Host->device staging dtype: bf16 slabs ship bf16 (half the wire
        bytes on slow links); f32 slabs must ship exact f32."""
        if self.options.dtype == "bfloat16":
            import ml_dtypes

            return ml_dtypes.bfloat16
        return np.float32

    def _insert_batches(self, vectors, ids: list[bytes]) -> None:
        """Pipelined insert: stage batch t+1 (async device_put) while batch t
        executes; slot readbacks resolve two batches behind so host<->device
        transfers overlap device compute instead of serialising it.

        ``vectors`` may be a host np array (padded + staged per batch) or a
        DEVICE array already at ``_dev_dim`` width (rebuild path: batches are
        dynamic slices — the slab never round-trips to the host)."""
        n = vectors.shape[0]
        spans = [(s, min(n - s, BATCH)) for s in range(0, n, BATCH)]
        on_device = isinstance(vectors, jnp.ndarray)
        wire = self._wire_dtype
        if on_device:
            pad_rows = next_pow2(max(spans[-1][1], _MIN_BATCH)) - spans[-1][1]
            src = jnp.pad(vectors, ((0, pad_rows), (0, 0))) if pad_rows else vectors

        def stage(span):
            start, count = span
            padded = next_pow2(max(count, _MIN_BATCH))
            if on_device:
                return jax.lax.dynamic_slice_in_dim(src, start, padded, axis=0)
            batch = np.zeros((padded, self._dev_dim), dtype=np.float32)
            batch[:count, : vectors.shape[1]] = vectors[start : start + count]
            return jax.device_put(batch.astype(wire, copy=False))

        def resolve(span, handle):
            start, count = span
            slots = np.asarray(handle)[:count].astype(np.int64)
            failed = slots < 0
            if failed.any():
                rows = np.asarray(vectors[start : start + count][failed], np.float32)
                slots[failed] = self._resolve_failed(np.ascontiguousarray(rows))
            self._register_slots(ids[start : start + count], slots)

        inflight: list = []
        nxt = stage(spans[0])
        for i, span in enumerate(spans):
            cur = nxt
            if i + 1 < len(spans):
                nxt = stage(spans[i + 1])  # transfer overlaps this insert
            inflight.append((span, self._insert_batch_dev(cur, span[1])))
            if len(inflight) > 2:
                resolve(*inflight.pop(0))
        for item in inflight:
            resolve(*item)

    def _register_slots(self, ids: list[bytes], slots: np.ndarray) -> None:
        top = int(slots.max()) + 1 if len(slots) else 0
        if top > len(self._slot_ids):
            self._slot_ids.extend(b"" for _ in range(top - len(self._slot_ids)))
        for i, s in zip(ids, slots.tolist()):
            self._slot_ids[s] = i
        self._id_to_slot.put_many(ids, np.asarray(slots, dtype=np.int64))

    # -- delete / dedup / clear ----------------------------------------------

    def remove(self, ids: list[bytes]) -> list[bytes]:
        """Tombstone ids; returns those actually removed (reference
        ``remove``, ``lsh.rs:473-503`` — minus its root-leaf-only bug)."""
        if self.state is None:
            return []
        slots, removed = [], []
        for i in ids:
            s = self._id_to_slot.pop(i, None)
            if s is not None:
                slots.append(s)
                self._slot_ids[s] = b""
                removed.append(i)
        if slots:
            arr = np.full(next_pow2(max(len(slots), 8)), -1, np.int32)
            arr[: len(slots)] = slots
            self._delete_slots_device(arr)
            self._maybe_rebuild()
        return removed

    def deduplicate(self) -> list[bytes]:
        """Remove exact-bit-pattern duplicate vectors, keeping the earliest id
        (reference ``deduplicate``, ``lsh.rs:270-288``: hashes f32 bit
        patterns). TPU-shaped: rows hash ON DEVICE (64-bit keys, 8B/row read
        back instead of the multi-GB slab), then only colliding groups gather
        their actual bytes for host confirmation."""
        if self.state is None or not self._id_to_slot:
            return []
        from zebra_tpu.ops.rowhash import row_hashes

        slots = np.asarray(
            [s for s, i in enumerate(self._slot_ids) if i], dtype=np.int64
        )
        hashes = np.asarray(row_hashes(self.state.vectors))  # [S, 2] i32
        keys = hashes[slots].astype(np.int64)
        keys = (keys[:, 0] << 32) ^ (keys[:, 1] & 0xFFFFFFFF)
        order = np.argsort(keys, kind="stable")  # slots ascending within ties
        ks = keys[order]
        group_start = np.concatenate([[True], ks[1:] != ks[:-1]])
        gid = np.cumsum(group_start) - 1
        sizes = np.bincount(gid)
        in_collision = sizes[gid] > 1
        if not in_collision.any():
            return []
        # confirm actual bytes for colliding rows only (device gather of the
        # few suspect rows, not the whole slab)
        sus = slots[order[in_collision]]  # ascending within each hash group
        sus_rows = np.asarray(
            jnp.take(self.state.vectors, jnp.asarray(sus), axis=0), np.float32
        )
        view = np.ascontiguousarray(sus_rows).view(np.uint32).reshape(len(sus), -1)
        _, first_idx = np.unique(view, axis=0, return_index=True)
        keep = np.zeros(len(sus), dtype=bool)
        keep[first_idx] = True
        dup_ids = [self._slot_ids[s] for s in sus[~keep].tolist()]
        return self.remove(dup_ids)

    def clear(self) -> None:
        """Drop all vectors and device state (reference ``clear``,
        ``lsh.rs:506-529``; the next add() rebuilds)."""
        self.state = None
        self._slot_ids = []
        self._id_to_slot = IdSlotMap()
        self._built_n = 0

    # -- search ----------------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, exact: bool = False
    ) -> list[list[tuple[bytes, float]]]:
        """Batch top-k search; returns per-query ``[(id, distance), ...]``
        sorted ascending (reference ``search``, ``lsh.rs:544-565``)."""
        if self.state is None or not self._id_to_slot:
            q = np.asarray(queries)
            nq = 1 if q.ndim == 1 else q.shape[0]
            return [[] for _ in range(nq)]
        dists, slots, valid = self.search_arrays(queries, k, exact=exact)
        out: list[list[tuple[bytes, float]]] = []
        for b in range(dists.shape[0]):
            row = []
            for j in range(dists.shape[1]):
                if valid[b, j]:
                    row.append((self._slot_ids[int(slots[b, j])], float(dists[b, j])))
            out.append(row)
        return out

    def search_arrays(self, queries: np.ndarray, k: int, exact: bool = False):
        """Array-level search: ``(dists [B,k], slots [B,k], valid [B,k])``."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        padded = next_pow2(max(nq, 8))
        qp = np.zeros((padded, self._dev_dim), np.float32)
        qp[:nq, : q.shape[1]] = q
        d, s, v = self._query_device(jnp.asarray(qp), k, exact)
        return _unpack_results(np.asarray(_pack_results(d, s, v)), nq, k)

    # -- persistence ----------------------------------------------------------

    def save(self, directory: str) -> None:
        """Snapshot all device arrays + id maps to ``directory`` with fsync
        (reference persists via fjall ``PersistMode::SyncAll``,
        ``lsh.rs:87-89``)."""
        os.makedirs(directory, exist_ok=True)
        meta = {
            "dim": self.dim,
            "metric": self.metric,
            "metric_power": self.metric_power,
            "options": self.options.to_json(),
            "built_n": self._built_n,
            "has_state": self.state is not None,
            "backend": type(self).__name__,
        }
        fsync_write(os.path.join(directory, "index.json"), json.dumps(meta).encode())
        if self.state is None:
            return
        ids_arr = np.zeros((len(self._slot_ids), 16), dtype=np.uint8)
        for s, i in enumerate(self._slot_ids):
            if i:
                ids_arr[s] = np.frombuffer(i, dtype=np.uint8)
        import io

        buf = io.BytesIO()
        np.savez(buf, slot_ids=ids_arr, **self._snapshot_arrays())
        fsync_write(os.path.join(directory, "arrays.npz"), buf.getvalue())

    @classmethod
    def load(cls, directory: str):
        with open(os.path.join(directory, "index.json"), "rb") as f:
            meta = json.loads(f.read())
        idx = cls(
            dim=meta["dim"],
            metric=meta["metric"],
            options=IndexOptions.from_json(meta["options"]),
            metric_power=meta.get("metric_power", 3.0),
        )
        idx._built_n = meta.get("built_n", 0)
        if not meta.get("has_state"):
            return idx
        with np.load(os.path.join(directory, "arrays.npz")) as z:
            idx._restore_arrays(z)
            ids_arr = z["slot_ids"]
        idx._slot_ids = []
        for s in range(ids_arr.shape[0]):
            raw = ids_arr[s].tobytes()
            idx._slot_ids.append(b"" if raw == b"\x00" * 16 else raw)
        valid = np.asarray(idx.state.valid)
        live_ids, live_slots = [], []
        for s, i in enumerate(idx._slot_ids):
            if i and s < len(valid) and valid[s]:
                live_ids.append(i)
                live_slots.append(s)
            elif i:  # id saved for a tombstoned slot: keep the invariant
                idx._slot_ids[s] = b""
        idx._id_to_slot.put_many(live_ids, np.asarray(live_slots, dtype=np.int64))
        idx._after_restore()
        return idx

    def _after_restore(self) -> None:
        """Post-load host-mirror fixups (optional)."""

    # -- maintenance stats ----------------------------------------------------

    def stats(self) -> dict:
        if self.state is None:
            return {"vectors": 0, "built": False}
        return {"vectors": len(self._id_to_slot), "built": True}
