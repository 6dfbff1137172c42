"""Host orchestration for the LSH bucket-table backend.

Shared host logic (id maps, batching, search mapping, snapshots) lives in
:mod:`zebra_tpu.index.base`; this class adds what is LSH-specific: hyperplane
sampling, the bump-allocated slab with host-mirrored slot assignment (no
device->host readback on insert), bucket-overflow-driven rebuilds, and the
pallas re-rank's stored-dim padding. The reference's counterpart is the
``LSHIndex`` facade over fjall KV partitions
(``src/database/index/lsh.rs:144-172``).

Two reference bugs are deliberately fixed, not copied: remove() here scrubs
every vector (tombstones), not just root-level leaves (``lsh.rs:487-492``),
and clear() empties the right structures (``lsh.rs:522`` clears tree keys from
the embeddings partition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import buckets as B
from zebra_tpu.index.base import (
    BaseVectorIndex,
    _MIN_BATCH,
    BATCH,
    slab_from_np,
    _pack_results,  # noqa: F401  (re-export: parallel/sharded.py packs results too)
    _unpack_results,  # noqa: F401
)
from zebra_tpu.ops import hashing as H
from zebra_tpu.profiling import logger
from zebra_tpu.utils import next_pow2

_MIN_SLAB = 4096
#: rebuild when live vectors outgrow the built size by this factor
_REBUILD_GROWTH = 4.0
#: rebuild when bucket-append drops exceed this fraction of live vectors
_REBUILD_OVERFLOW = 0.02
#: compact when tombstones exceed this fraction of allocated slots
_COMPACT_TOMBSTONES = 0.5


class LSHIndex(BaseVectorIndex):
    """Single-shard ANN index: LSH bucket tables + host id maps."""

    _BACKEND = "lsh"

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        options: IndexOptions | None = None,
        metric_power: float = 3.0,
    ):
        super().__init__(dim, metric, options, metric_power)
        if self.options.dtype == "int8":
            raise ValueError(
                "dtype='int8' is supported by the ivf backend only (the "
                "quantised slab needs per-row scales the bucket layout "
                "doesn't carry); use dtype='bfloat16' or index_type='ivf'"
            )
        # The pallas re-rank DMAs 1-D row segments of the slab, which TPU
        # tiling requires to be 1024-f32 (2048-bf16) aligned — pad the stored
        # dimension with zero columns (zero pads are identity for every
        # metric: |0-0| contributes nothing).
        if self.options.rerank == "pallas":
            unit = 2048 if self.options.dtype == "bfloat16" else 1024
            self._dev_dim = -(-self.dim // unit) * unit
        self.state: B.IndexState | None = None
        #: host mirror of state.next_slot — slot assignment is a deterministic
        #: bump allocator, so the host never needs to read it back from the
        #: device (device->host readbacks are the expensive direction)
        self._next_slot = 0

    # -- build ---------------------------------------------------------------

    def _sample_planes(self, bits: int, data=None):
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        T = self.options.num_tables
        if self.options.plane_mode == "data" and data is not None and data.shape[0] >= 2:
            if isinstance(data, jnp.ndarray):  # rebuild path: already on device
                sample = data.astype(jnp.float32)
            else:
                sample = jnp.asarray(self._pad_dim(np.asarray(data, np.float32)))
            return H.sample_planes_data(key, T, bits, sample)
        planes, consts = H.sample_planes_random(key, T, bits, self.dim)
        if self._dev_dim != self.dim:
            planes = jnp.pad(planes, ((0, 0), (0, 0), (0, self._dev_dim - self.dim)))
        return planes, consts

    def _fresh_state(self, n_hint: int, data: np.ndarray | None) -> B.IndexState:
        bits = self.options.resolved_bits(n_hint)
        cap = self.options.resolved_bucket_capacity()
        slab = next_pow2(max(self.options.slab_capacity, 2 * n_hint, _MIN_SLAB))
        planes, consts = self._sample_planes(bits, data)
        self._next_slot = 0
        return B.empty_state(planes, consts, cap, slab, dtype=self.dtype)

    # -- insert --------------------------------------------------------------

    def _before_batches(self, n: int) -> None:
        # the last batch is padded to a power of two and written with one
        # dynamic_update_slice — reserve room for the padded tail too
        w = self._span_width()
        last = n % w or n
        pad_tail = next_pow2(max(min(last, w), _MIN_BATCH)) - min(last, w)
        self._ensure_slab(n + pad_tail)

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

    def _insert_batch_dev(self, batch: jnp.ndarray, count: int) -> np.ndarray:
        self.state, _slots = B.insert(self.state, batch, jnp.int32(count))
        # slots are next_slot..next_slot+count-1 by construction — mirror
        # them host-side instead of a device readback (buckets.insert)
        slots = np.arange(self._next_slot, self._next_slot + count)
        self._next_slot += count
        return slots

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
        self._wal_cb = None  # re-inserted rows are already logged
        logger.info(
            "rebuild: %d live vectors (used=%d, overflow=%s)",
            len(self._id_to_slot), self._next_slot,
            int(self.state.overflow) if self.state is not None else 0,
        )
        order = self._slot_ids.live_slots()  # ascending
        if not len(order):
            ids: list[bytes] = []
            data = None
        else:
            # compact ON DEVICE: a [n] permutation gather instead of reading
            # the multi-GB slab back through the slow device->host direction
            data = jnp.take(
                self.state.vectors, jnp.asarray(order.astype(np.int32)), axis=0
            )
            ids = self._slot_ids.take_list(order)
        n = len(ids)
        self.state = None  # free the old slab before allocating the new one
        self.state = self._fresh_state(max(n, 1), data)
        self._built_n = max(n, 1)
        from zebra_tpu.index.base import IdSlotMap, SlotIdArena

        self._slot_ids = SlotIdArena()
        self._id_to_slot = IdSlotMap()
        if n:
            self._before_batches(n)
            self._insert_batches(data, ids)

    # -- delete / search -------------------------------------------------------

    def _delete_slots_device(self, slots: np.ndarray) -> None:
        self.state = B.delete_slots(self.state, jnp.asarray(slots))

    def _query_device(self, qj: jnp.ndarray, k: int, exact: bool):
        if self.options.index_type == "flat":
            exact = True  # flat index: exact MXU scan is THE query path
        if exact:
            return B.brute_force(
                self.state, qj, k, metric=self.metric, power=self.metric_power,
                precision=self.options.exact_precision,
                approx=self.options.approx_topk,
                chunk=131072 if self.options.approx_topk else 8192,
            )
        rerank = self.options.rerank
        if rerank.startswith("pallas") and jax.default_backend() == "cpu":
            rerank = "xla"  # Mosaic kernels need a real TPU; same results
        return B.query(
            self.state,
            qj,
            k,
            metric=self.metric,
            num_probes=self.options.resolved_probes(),
            power=self.metric_power,
            rerank=rerank,
            max_candidates=self.options.max_candidates,
        )

    # -- persistence ------------------------------------------------------------

    def _snapshot_arrays(self) -> dict:
        # raw device arrays: the streamed snapshot writer fetches them in
        # bounded chunks (bf16 slab ships as uint16 bits)
        st = self.state
        return {
            "planes": st.planes,
            "consts": st.consts,
            "buckets": st.buckets,
            "counts": st.counts,
            "vectors": st.vectors,
            "norms": st.norms,
            "valid": st.valid,
            "next_slot": st.next_slot,
            "overflow": st.overflow,
        }

    def _restore_arrays(self, z) -> None:
        self.state = B.IndexState(
            planes=jnp.asarray(z["planes"]),
            consts=jnp.asarray(z["consts"]),
            buckets=jnp.asarray(z["buckets"]),
            counts=jnp.asarray(z["counts"]),
            vectors=slab_from_np(z["vectors"], self.dtype),
            norms=jnp.asarray(z["norms"]),
            valid=jnp.asarray(z["valid"]),
            next_slot=jnp.asarray(z["next_slot"]),
            overflow=jnp.asarray(z["overflow"]),
        )

    def _after_restore(self) -> None:
        # restore the host bump-allocator mirror — without this, adds after a
        # reopen would overwrite slots from 0
        self._next_slot = int(np.asarray(self.state.next_slot))

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
