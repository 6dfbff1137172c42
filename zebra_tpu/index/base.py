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
from zebra_tpu.utils import fsync_write, next_pow2, uuid7_bytes

_MIN_BATCH = 256
#: insert batch width (vectors per device dispatch)
BATCH = 65536


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
        #: slab-slot -> 16-byte id (b"" for never-used / compacted slots)
        self._slot_ids: list[bytes] = []
        self._id_to_slot: dict[bytes, int] = {}
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

    def _insert_batch(self, batch: np.ndarray, count: int) -> np.ndarray:
        """Insert ``batch[:count]`` (padded, dev-dim) and return their slots."""
        raise NotImplementedError

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
            ids = [uuid7_bytes() for _ in range(n)]
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

    def _insert_batches(self, vectors: np.ndarray, ids: list[bytes]) -> None:
        n = vectors.shape[0]
        start = 0
        while start < n:
            count = min(n - start, BATCH)
            padded = next_pow2(max(count, _MIN_BATCH))
            batch = np.zeros((padded, self._dev_dim), dtype=np.float32)
            batch[:count, : vectors.shape[1]] = vectors[start : start + count]
            slots = self._insert_batch(batch, count)
            self._register_slots(ids[start : start + count], slots)
            start += count

    def _register_slots(self, ids: list[bytes], slots: np.ndarray) -> None:
        top = int(slots.max()) + 1 if len(slots) else 0
        if top > len(self._slot_ids):
            self._slot_ids.extend(b"" for _ in range(top - len(self._slot_ids)))
        for i, s in zip(ids, slots.tolist()):
            self._slot_ids[s] = i
            self._id_to_slot[i] = s

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
        patterns; same here via a host-side unique over the raw bytes)."""
        if self.state is None or not self._id_to_slot:
            return []
        slots = np.asarray(sorted(self._id_to_slot.values()), dtype=np.int64)
        vecs = np.ascontiguousarray(
            np.asarray(self.state.vectors, dtype=np.float32)[slots]
        )
        view = vecs.view(np.uint32).reshape(len(slots), -1)
        _, first_idx = np.unique(view, axis=0, return_index=True)
        keep = np.zeros(len(slots), dtype=bool)
        keep[first_idx] = True
        dup_ids = [self._slot_ids[s] for s in slots[~keep].tolist()]
        return self.remove(dup_ids)

    def clear(self) -> None:
        """Drop all vectors and device state (reference ``clear``,
        ``lsh.rs:506-529``; the next add() rebuilds)."""
        self.state = None
        self._slot_ids = []
        self._id_to_slot = {}
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
        idx._id_to_slot = {
            i: s
            for s, i in enumerate(idx._slot_ids)
            if i and s < len(valid) and valid[s]
        }
        idx._after_restore()
        return idx

    def _after_restore(self) -> None:
        """Post-load host-mirror fixups (optional)."""

    # -- maintenance stats ----------------------------------------------------

    def stats(self) -> dict:
        if self.state is None:
            return {"vectors": 0, "built": False}
        return {"vectors": len(self._id_to_slot), "built": True}
