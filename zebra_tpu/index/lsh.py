"""Host orchestration for the device bucket index.

Owns everything XLA's static-shape world can't: id<->slot maps, slab growth,
bucket rebuilds, tombstone compaction, dedup, and snapshots. The reference's
counterpart is the ``LSHIndex`` facade over fjall KV partitions
(``src/database/index/lsh.rs:144-172``); here durable state is a directory of
array snapshots (see :meth:`LSHIndex.save` / :meth:`LSHIndex.load`).

API parity (reference methods at ``lsh.rs``):
  add(:440-466), remove(:473-503), search(:544-565), deduplicate(:270-288),
  clear(:506-529), is_empty/no_vectors/no_trees(:389-409), save(:170-172).
Two reference bugs are deliberately fixed, not copied: remove() here scrubs
every vector (tombstones), not just root-level leaves (``lsh.rs:487-492``),
and clear() empties the right structures (``lsh.rs:522`` clears tree keys from
the embeddings partition).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import buckets as B
from zebra_tpu.profiling import logger
from zebra_tpu.ops import hashing as H
from zebra_tpu.utils import fsync_write, next_pow2, uuid7_bytes

_MIN_SLAB = 4096
_MIN_BATCH = 256
#: rebuild when live vectors outgrow the built size by this factor
_REBUILD_GROWTH = 4.0
#: rebuild when bucket-append drops exceed this fraction of live vectors
_REBUILD_OVERFLOW = 0.02
#: compact when tombstones exceed this fraction of allocated slots
_COMPACT_TOMBSTONES = 0.5


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


class LSHIndex:
    """Single-shard ANN index: device bucket tables + host id maps."""

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
        # The pallas re-rank DMAs 1-D row segments of the slab, which TPU
        # tiling requires to be 1024-f32 (2048-bf16) aligned — pad the stored
        # dimension with zero columns (zero pads are identity for every
        # metric: |0-0| contributes nothing).
        if self.options.rerank == "pallas":
            unit = 2048 if self.options.dtype == "bfloat16" else 1024
            self._dev_dim = -(-self.dim // unit) * unit
        else:
            self._dev_dim = self.dim
        self.state: B.IndexState | None = None
        #: slab-slot -> 16-byte id (b"" for never-used / compacted slots)
        self._slot_ids: list[bytes] = []
        self._id_to_slot: dict[bytes, int] = {}
        self._built_n = 0
        #: host mirror of state.next_slot — slot assignment is a deterministic
        #: bump allocator, so the host never needs to read it back from the
        #: device (device->host readbacks are the expensive direction)
        self._next_slot = 0
        self._rng = np.random.default_rng(self.options.seed)

    # -- introspection (reference lsh.rs:389-409) ---------------------------

    def __len__(self) -> int:
        return len(self._id_to_slot)

    def no_vectors(self) -> bool:
        return len(self._id_to_slot) == 0

    def no_tables(self) -> bool:
        return self.state is None

    def is_empty(self) -> bool:
        return self.no_vectors() or self.no_tables()

    @property
    def dtype(self):
        return jnp.bfloat16 if self.options.dtype == "bfloat16" else jnp.float32

    # -- build ---------------------------------------------------------------

    def _pad_dim(self, arr: np.ndarray) -> np.ndarray:
        if arr.shape[-1] == self._dev_dim:
            return arr
        out = np.zeros((*arr.shape[:-1], self._dev_dim), dtype=np.float32)
        out[..., : arr.shape[-1]] = arr
        return out

    def _sample_planes(self, bits: int, data: np.ndarray | None):
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        T = self.options.num_tables
        if self.options.plane_mode == "data" and data is not None and data.shape[0] >= 2:
            return H.sample_planes_data(
                key, T, bits, jnp.asarray(self._pad_dim(np.asarray(data, np.float32)))
            )
        planes, consts = H.sample_planes_random(key, T, bits, self.dim)
        if self._dev_dim != self.dim:
            planes = jnp.pad(planes, ((0, 0), (0, 0), (0, self._dev_dim - self.dim)))
        return planes, consts

    def _fresh_state(self, n_hint: int, data: np.ndarray | None) -> B.IndexState:
        bits = self.options.resolved_bits(n_hint)
        cap = self.options.resolved_bucket_capacity()
        slab = next_pow2(max(self.options.slab_capacity, 2 * n_hint, _MIN_SLAB))
        planes, consts = self._sample_planes(bits, data)
        return B.empty_state(planes, consts, cap, slab, dtype=self.dtype)

    # -- insert --------------------------------------------------------------

    def add(self, vectors: np.ndarray, ids: list[bytes] | None = None) -> list[bytes]:
        """Insert vectors; returns their new ids (reference ``add``,
        ``lsh.rs:440-466``: first call builds the index, later calls are
        incremental — same here, with hash tables instead of trees)."""
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
            self._next_slot = 0
        # the last batch is padded to a power of two and written with one
        # dynamic_update_slice — reserve room for the padded tail too
        last = n % 65536 or n
        pad_tail = next_pow2(max(min(last, 65536), _MIN_BATCH)) - min(last, 65536)
        self._ensure_slab(n + pad_tail)
        self._insert_batches(vectors, ids)
        self._maybe_rebuild()
        return ids

    def _ensure_slab(self, incoming: int) -> None:
        st = self.state
        need = self._next_slot + incoming
        if need <= st.slab_capacity:
            return
        new_cap = next_pow2(max(2 * st.slab_capacity, need))
        vectors = jnp.zeros((new_cap, self._dev_dim), st.vectors.dtype).at[: st.slab_capacity].set(st.vectors)
        norms = jnp.zeros((new_cap,), jnp.float32).at[: st.slab_capacity].set(st.norms)
        valid = jnp.zeros((new_cap,), jnp.bool_).at[: st.slab_capacity].set(st.valid)
        self.state = st.replace(vectors=vectors, norms=norms, valid=valid)

    def _insert_batches(self, vectors: np.ndarray, ids: list[bytes]) -> None:
        n = vectors.shape[0]
        start = 0
        while start < n:
            count = min(n - start, 65536)
            padded = next_pow2(max(count, _MIN_BATCH))
            batch = np.zeros((padded, self._dev_dim), dtype=np.float32)
            batch[:count, : vectors.shape[1]] = vectors[start : start + count]
            self.state, _slots = B.insert(
                self.state, jnp.asarray(batch), jnp.int32(count)
            )
            # slots are next_slot..next_slot+count-1 by construction — mirror
            # them host-side instead of a device readback (buckets.insert)
            slots_np = np.arange(self._next_slot, self._next_slot + count)
            self._next_slot += count
            self._register_slots(ids[start : start + count], slots_np)
            start += count

    def _register_slots(self, ids: list[bytes], slots: np.ndarray) -> None:
        top = int(slots.max()) + 1 if len(slots) else 0
        if top > len(self._slot_ids):
            self._slot_ids.extend(b"" for _ in range(top - len(self._slot_ids)))
        for i, s in zip(ids, slots.tolist()):
            self._slot_ids[s] = i
            self._id_to_slot[i] = s

    # -- rebuild / compaction ------------------------------------------------

    def _maybe_rebuild(self) -> None:
        st = self.state
        n_live = len(self._id_to_slot)
        if n_live == 0:
            return
        overflow = int(st.overflow)  # one scalar readback per add()
        used = self._next_slot
        tombstones = used - n_live
        # Overflowed bucket writes are dropped entries; the multi-table
        # redundancy absorbs them (a vector dropped from one table is almost
        # surely present in the other 14), so overflow only justifies a
        # rebuild when wider hash codes would actually spread the load —
        # otherwise tight clusters re-overflow forever and every add() loops.
        overflow_fixable = (
            self.options.index_type != "flat"
            and overflow > _REBUILD_OVERFLOW * n_live
            and self.options.resolved_bits(n_live) > st.bits
        )
        if (
            n_live > _REBUILD_GROWTH * max(self._built_n, 1)
            or overflow_fixable
            or tombstones > _COMPACT_TOMBSTONES * max(used, 1)
        ):
            self.rebuild()

    def rebuild(self) -> None:
        """Re-hash all live vectors into fresh tables (new bit width sized to
        the current population) and compact tombstones out of the slab.

        The reference's analogue is the leaf-overflow subtree rebuild
        (``lsh.rs:368-377``) — here it is one global, batched re-insert: a
        single matmul re-hashes everything.
        """
        logger.info(
            "rebuild: %d live vectors (used=%d, overflow=%s)",
            len(self._id_to_slot), self._next_slot,
            int(self.state.overflow) if self.state is not None else 0,
        )
        live_slots = [s for i, s in self._id_to_slot.items()]
        if not live_slots:
            ids: list[bytes] = []
            data = np.zeros((0, self.dim), np.float32)
        else:
            order = np.asarray(sorted(live_slots), dtype=np.int64)
            data = np.asarray(self.state.vectors, dtype=np.float32)[order]
            slot_to_id = self._slot_ids
            ids = [slot_to_id[s] for s in order.tolist()]
        n = len(ids)
        self.state = self._fresh_state(max(n, 1), data if n else None)
        self._built_n = max(n, 1)
        self._slot_ids = []
        self._id_to_slot = {}
        self._next_slot = 0
        if n:
            self._insert_batches(data, ids)

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
            self.state = B.delete_slots(self.state, jnp.asarray(arr))
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
        """Drop all vectors and tables (reference ``clear``, ``lsh.rs:506-529``
        — which also forgets built trees; here the next add() rebuilds)."""
        self.state = None
        self._slot_ids = []
        self._id_to_slot = {}
        self._built_n = 0

    # -- search ---------------------------------------------------------------

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
        if self.options.index_type == "flat":
            exact = True  # flat index: exact MXU scan is THE query path
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        padded = next_pow2(max(nq, 8))
        qp = np.zeros((padded, self._dev_dim), np.float32)
        qp[:nq, : q.shape[1]] = q
        qj = jnp.asarray(qp)
        if exact:
            d, s, v = B.brute_force(
                self.state, qj, k, metric=self.metric, power=self.metric_power,
                precision=self.options.exact_precision,
                approx=self.options.approx_topk,
                chunk=131072 if self.options.approx_topk else 8192,
            )
        else:
            d, s, v = B.query(
                self.state,
                qj,
                k,
                metric=self.metric,
                num_probes=self.options.num_probes,
                power=self.metric_power,
                rerank=self.options.rerank,
                max_candidates=self.options.max_candidates,
            )
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
        np.savez(
            buf,
            planes=np.asarray(self.state.planes),
            consts=np.asarray(self.state.consts),
            buckets=np.asarray(self.state.buckets),
            counts=np.asarray(self.state.counts),
            vectors=np.asarray(self.state.vectors, dtype=np.float32),
            norms=np.asarray(self.state.norms),
            valid=np.asarray(self.state.valid),
            next_slot=np.asarray(self.state.next_slot),
            overflow=np.asarray(self.state.overflow),
            slot_ids=ids_arr,
        )
        fsync_write(os.path.join(directory, "arrays.npz"), buf.getvalue())

    @classmethod
    def load(cls, directory: str) -> "LSHIndex":
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
            dtype = idx.dtype
            idx.state = B.IndexState(
                planes=jnp.asarray(z["planes"]),
                consts=jnp.asarray(z["consts"]),
                buckets=jnp.asarray(z["buckets"]),
                counts=jnp.asarray(z["counts"]),
                vectors=jnp.asarray(z["vectors"]).astype(dtype),
                norms=jnp.asarray(z["norms"]),
                valid=jnp.asarray(z["valid"]),
                next_slot=jnp.asarray(z["next_slot"]),
                overflow=jnp.asarray(z["overflow"]),
            )
            ids_arr = z["slot_ids"]
        idx._slot_ids = []
        for s in range(ids_arr.shape[0]):
            raw = ids_arr[s].tobytes()
            idx._slot_ids.append(b"" if raw == b"\x00" * 16 else raw)
        valid = np.asarray(idx.state.valid)
        idx._id_to_slot = {
            i: s for s, i in enumerate(idx._slot_ids) if i and s < len(valid) and valid[s]
        }
        # restore the host bump-allocator mirror — without this, adds after a
        # reopen would overwrite slots from 0
        idx._next_slot = int(np.asarray(idx.state.next_slot))
        return idx

    # -- maintenance stats ----------------------------------------------------

    def stats(self) -> dict:
        if self.state is None:
            return {"vectors": 0, "built": False}
        st = self.state
        return {
            "vectors": len(self._id_to_slot),
            "built": True,
            "tables": st.num_tables,
            "bits": st.bits,
            "bucket_capacity": st.bucket_capacity,
            "slab_capacity": st.slab_capacity,
            "used_slots": self._next_slot,
            "overflow": int(st.overflow),
            "tombstones": self._next_slot - len(self._id_to_slot),
        }
