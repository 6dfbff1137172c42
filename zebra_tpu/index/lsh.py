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
        #: bucket-capacity multiplier grown by overflow-driven rebuilds once
        #: the hash width is at its budget cap (round-4 verdict #4: the
        #: parity tier silently dropped 75% of placements at 1M because
        #: neither lever could move — the reference's adaptive depth never
        #: drops entries, its leaves split instead, ``lsh.rs:250-267``).
        self._cap_boost = 1

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
        cap0 = self.options.resolved_bucket_capacity()
        cap = cap0 * self._cap_boost
        bits = self.options.resolved_bits(n_hint, capacity=cap)
        slab = next_pow2(max(self.options.slab_capacity, 2 * n_hint, _MIN_SLAB))
        planes, consts = self._sample_planes(bits, data)
        if data is not None and self._cap_boost == 1 and n_hint >= 16 * _MIN_SLAB:
            # ADAPTIVE DEPTH, sized BEFORE allocation: hash a sample and
            # deepen buckets for genuinely hot codes in one shot. Tightly
            # clustered data collapses whole clusters onto single codes
            # (wider hashes cannot separate points on the same side of
            # every plane), and the overflow-driven ladder this replaces
            # re-built the full index per doubling — each rebuild a
            # multi-GB old+new HBM transient that OOMed the round-5 1M x
            # 768 parity run. The reference never drops entries either;
            # its tree leaves split adaptively (``lsh.rs:250-267``).
            est = self._estimate_hot_load(planes, consts, data, n_hint)
            want = int(1.25 * est)
            if want > cap:
                self._cap_boost = min(-(-want // cap0), 1024)
                cap = cap0 * self._cap_boost
                nb = self.options.resolved_bits(n_hint, capacity=cap)
                if nb != bits:  # deeper buckets shrink the bit budget
                    bits = nb
                    planes, consts = self._sample_planes(bits, data)
                logger.info(
                    "lsh: sample predicts hot-bucket load ~%d at %d rows; "
                    "pre-boosting bucket depth to %d (bits %d)",
                    est, n_hint, cap, bits,
                )
        self._next_slot = 0
        return B.empty_state(planes, consts, cap, slab, dtype=self.dtype)

    def _estimate_hot_load(self, planes, consts, data, n_hint: int) -> int:
        """Predicted max bucket load at ``n_hint`` rows, from one hashed
        sample (<=65536 rows, strided). Only SIGNIFICANT sample buckets
        (>=8 hits) extrapolate — near-uniform data keeps its max at noise
        level and must not trigger a boost."""
        if isinstance(data, jnp.ndarray):
            # rebuild path: rows already on device (and already _dev_dim
            # wide) — subsample there; only the small [S, T] codes come
            # back over the (slow) down-tunnel
            stride = max(data.shape[0] // 65536, 1)
            xs = data[::stride][:65536].astype(jnp.float32)
        else:
            x = np.asarray(data, np.float32)
            stride = max(x.shape[0] // 65536, 1)
            xs = jnp.asarray(
                self._pad_dim(np.ascontiguousarray(x[::stride][:65536]))
            )
        codes = np.asarray(H.hash_codes(xs, planes, consts))  # [S, T]
        hot = 0
        for t in range(codes.shape[1]):
            counts = np.bincount(codes[:, t])
            m = int(counts.max()) if counts.size else 0
            if m >= 8:
                hot = max(hot, m)
        return int(hot * (n_hint / max(codes.shape[0], 1)))

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
        from zebra_tpu.profiling import timed

        with timed("insert.grow", items=need):  # build stage accounting
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

    # A rebuild here is one global, batched re-insert (a single matmul
    # re-hashes everything); the reference's analogue is the leaf-overflow
    # subtree rebuild (``lsh.rs:368-377``). The capture is a DEVICE
    # permutation gather — the multi-GB slab never reads back through the
    # slow device->host direction. Driver: ``BaseVectorIndex.rebuild``.

    _ADOPT_EXTRA = ("_next_slot", "_cap_boost")

    def _rebuild_reason(self) -> str | None:
        st = self.state
        n_live = len(self._id_to_slot)
        if n_live == 0 or st is None:
            return None
        if n_live > _REBUILD_GROWTH * max(self._built_n, 1):
            return "growth"
        # Overflowed bucket writes are dropped entries; the multi-table
        # redundancy absorbs a few (a vector dropped from one table is almost
        # surely present in the others), so overflow justifies a rebuild only
        # when a LEVER exists: wider hash codes spread the load, and once
        # those hit their HBM-budget cap, doubled bucket capacity absorbs it
        # (bounded at 64x — past that, tight clusters re-overflow forever
        # and every add() would loop).
        overflow = int(st.overflow)  # one scalar readback per add()
        if (
            self.options.index_type != "flat"
            and overflow > _REBUILD_OVERFLOW * n_live
        ):
            if self.options.resolved_bits(
                n_live, capacity=st.bucket_capacity
            ) > st.bits:
                return "overflow-bits"
            if self._cap_boost < 64:
                return "overflow-capacity"
        used = self._next_slot
        if used - n_live > _COMPACT_TOMBSTONES * max(used, 1):
            return "tombstones"
        return None

    def _pre_rebuild(self, reason: str | None) -> None:
        if reason == "overflow-capacity":
            self._cap_boost *= 2
        logger.info(
            "rebuild (%s): %d live vectors (used=%d, overflow=%s, cap_boost=%d)",
            reason, len(self._id_to_slot), self._next_slot,
            int(self.state.overflow) if self.state is not None else 0,
            self._cap_boost,
        )

    def _prepare_shadow(self, shadow, reason: str | None) -> None:
        shadow._cap_boost = self._cap_boost * (
            2 if reason == "overflow-capacity" else 1
        )

    def _retrain_bg_peak_bytes(self, n_live: int, chunk_rows: int) -> int:
        """Worst-case extra HBM of a background LSH retrain: the shadow's
        fresh slab + bucket tables plus one f32 capture chunk, all while
        the old state keeps serving (at 1M x 768 f32 / b=21 that is ~8.5GB
        on top of ~8.3GB live — the facade's HBM admission must see it,
        the base-class 0 meant 'no concern' and a capacity-scale retrain
        would OOM exactly like the round-5 inline rebuild did)."""
        import numpy as _np

        cap = self.options.resolved_bucket_capacity() * self._cap_boost
        bits = self.options.resolved_bits(n_live, capacity=cap)
        slab = next_pow2(max(self.options.slab_capacity, 2 * n_live, _MIN_SLAB))
        dt = _np.dtype(self.dtype).itemsize
        slab_b = slab * (self._dev_dim * dt + 5)  # vectors + norms + valid
        tables_b = max(self.options.num_tables, 1) * (1 << bits) * (cap + 1) * 4
        return slab_b + tables_b + chunk_rows * self._dev_dim * 4

    def _reset_alloc_mirrors(self) -> None:
        self._next_slot = 0

    def _meta_extra(self) -> dict:
        return {"cap_boost": self._cap_boost}

    def _apply_meta_extra(self, meta: dict) -> None:
        self._cap_boost = int(meta.get("cap_boost", 1))

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
        mc = self.options.max_candidates
        probes = self.options.resolved_probes()
        full = self.state.num_tables * probes * self.state.bucket_capacity
        if mc == 0 and full > 65536:
            # Deep (adaptively boosted) buckets make the untruncated
            # candidate width T*P*C explode — at capacity 3880 a 16384-row
            # batch's rerank faulted the TPU worker outright. The unique
            # candidate count is far smaller (duplicated cluster members
            # across tables), so compacting to 64k loses nothing; the
            # no-truncation default stays for normal (shallow) tables where
            # the compaction pass measured slower than the dup gathers.
            mc = 65536
        return B.query(
            self.state,
            qj,
            k,
            metric=self.metric,
            num_probes=probes,
            power=self.metric_power,
            rerank=rerank,
            max_candidates=mc,
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
