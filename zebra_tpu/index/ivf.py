"""Device-resident IVF index: cluster-contiguous slab, pure jit ops.

This is the TPU-first redesign of the reference's LSH forest for the hot
path (``src/database/index/lsh.rs:333-345,544-565``). Where LSH stores slot
*indirection* (buckets of int32 ids into an insert-ordered slab, so every
probe is a random row gather), IVF makes the slab itself partition-ordered:

  coarse quantizer   -> K learned centroids (ops/kmeans.py); scoring a query
                        against ALL partitions is one [B, D] x [D, K] MXU
                        matmul — the analogue of descending T trees at once
  bucket             -> a CONTIGUOUS block of ``C`` slab rows per cluster
                        (cluster c owns rows [c*C, (c+1)*C)); probing a
                        cluster is a block read, not C row gathers
  multiprobe         -> top-P nearest centroids per query
  re-rank            -> exact distances over the P gathered blocks + top-k

Clusters are disjoint, so — unlike multi-table LSH — candidates never need
deduplication, and a vector lives in exactly one place.

Inserts assign each vector to its nearest centroid with free capacity
(``spill`` attempts over the next-nearest centroids, FAISS-style), using the
same sort + segmented-rank scan as the LSH bucket append: deterministic,
atomics-free, one scatter. Vectors whose ``spill`` nearest clusters are ALL
full land in a shared SPARE region at the slab tail — scanned for every
query as one batched matmul (the [G, D] block is shared by the whole query
batch, so it costs compute, not per-query gathers) — which keeps them
exactly searchable without growing the multi-GB slab in place. Only a full
spare counts into ``overflow`` and triggers a host rebuild; no data is ever
lost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from zebra_tpu.ops import distances as D
from zebra_tpu.ops import topk as TK

#: Out-of-bounds sentinel used to make scatter writes drop.
OOB = np.int32(2**30)  # np scalar — see note in ops/topk.py
#: f32 reciprocal of 127 — int8 quantisation multiplies by this on BOTH the
#: host (quantise_pair_host) and device (insert) paths so the two stay
#: bitwise identical (XLA folds /127.0 to this multiply regardless).
_INV127 = np.float32(1.0 / 127.0)


@struct.dataclass
class IVFState:
    """All device arrays of one IVF shard (a pytree)."""

    centroids: jnp.ndarray  # [K, D] f32 coarse quantizer
    counts: jnp.ndarray  # [K+1]  int32 allocated slots per cluster (<= C;
    #                       monotone until compaction — tombstoned rows keep
    #                       their slot, `valid` masks them). Entry K counts
    #                       the shared spare region.
    vectors: jnp.ndarray  # [K*C + G, D] slab: cluster blocks then the spare
    norms: jnp.ndarray  # [K*C + G]  f32 squared L2 norms of stored rows
    valid: jnp.ndarray  # [K*C + G]  bool liveness
    overflow: jnp.ndarray  # []  int32 vectors dropped (spare also full)
    #: [K*C + G] f32 per-row dequant scales — present ONLY for int8 slabs
    #: (symmetric per-row quantisation: value = int8 * scale). Halves HBM
    #: probe traffic again vs bf16; distances dequantise AFTER the dot
    #: (dot(q, s*v) = s * dot(q, v)) so the MXU pass stays dense.
    scales: jnp.ndarray | None = None
    #: [K*C + G, D] int8 RESIDUAL slab + [K*C + G] f32 residual scales —
    #: present only when the index was built with ``IndexOptions.refine > 0``
    #: on an int8 slab. A stored row then reconstructs to
    #: ``scale*vectors + rscale*residual`` (~15-bit mantissa — BETTER than
    #: bf16's 8): the coarse probe scan still touches only the 1-byte int8
    #: slab (the bandwidth win), and :func:`query` re-ranks an oversampled
    #: candidate set against the reconstruction — int8 scan speed with
    #: ~f32-grade true recall. The residual rides cold HBM except for the
    #: [B, refine_k, D] top-candidate gather.
    residual: jnp.ndarray | None = None
    rscales: jnp.ndarray | None = None
    #: per-cluster block width (static metadata, not a traced leaf)
    ccap: int = struct.field(pytree_node=False, default=0)

    @property
    def num_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def cluster_capacity(self) -> int:
        return self.ccap

    @property
    def spare_capacity(self) -> int:
        return self.vectors.shape[0] - self.num_clusters * self.ccap

    @property
    def spare_start(self) -> int:
        return self.num_clusters * self.ccap

    @property
    def slab_capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def empty_state(
    centroids: jnp.ndarray,
    cluster_capacity: int,
    spare_capacity: int = 0,
    dtype=jnp.float32,
    refine: bool = False,
) -> IVFState:
    """Fresh state for trained centroids, per-cluster and spare capacities.

    ``refine=True`` (int8 slabs only) additionally allocates the int8
    residual slab used by :func:`query`'s exact re-rank pass.
    """
    K, dim = centroids.shape
    S = K * cluster_capacity + spare_capacity
    with_res = refine and dtype == jnp.int8
    return IVFState(
        centroids=centroids.astype(jnp.float32),
        counts=jnp.zeros((K + 1,), dtype=jnp.int32),
        vectors=jnp.zeros((S, dim), dtype=dtype),
        norms=jnp.zeros((S,), dtype=jnp.float32),
        valid=jnp.zeros((S,), dtype=jnp.bool_),
        overflow=jnp.zeros((), dtype=jnp.int32),
        scales=jnp.ones((S,), dtype=jnp.float32) if dtype == jnp.int8 else None,
        residual=jnp.zeros((S, dim), dtype=jnp.int8) if with_res else None,
        rscales=jnp.ones((S,), dtype=jnp.float32) if with_res else None,
        ccap=cluster_capacity,
    )


def _segmented_ranks(c: jnp.ndarray) -> jnp.ndarray:
    """Rank of each row among same-valued entries of ``c`` (original order).

    Sort + cummax segment-start scan + inverse scatter — the contention-free
    TPU substitute for an atomic fetch-and-add per bucket.
    """
    n = c.shape[0]
    order = jnp.argsort(c)
    cs = c[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), cs[1:] != cs[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, ar, jnp.int32(0))
    )
    rank_sorted = ar - seg_start
    return jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)


#: chunk the insert-time cell scoring only past this many [n, K] score
#: elements (the 1M-x-768 flagship shape, 65536 x 16384 = 1.07G, stays a
#: single fused tile — its 1.44M/s device insert rate is a recorded
#: headline); beyond it, row-chunks keep each score tile ~1GB. At
#: K = 131072 (the 10M auto sizing) an unchunked batch tile would be
#: 65536 x 131072 x 4B = 34GB — far past HBM.
_CHOICE_TRIGGER_ELEMS = 1 << 31
_CHOICE_TILE_ELEMS = 1 << 28


def _cell_choice(x32: jnp.ndarray, centroids: jnp.ndarray, metric: str,
                 A: int) -> jnp.ndarray:
    """Per-row top-``A`` nearest cells ``[n, A]`` (insert placement).

    DEFAULT matmul precision: partition assignment tolerates bf16-grade
    error. approx_max_k instead of top_k: a full sort over [65536, 16384]
    is multi-GB/seconds per batch, and the partial reduction's ~0.5% miss
    just means a vector lands in a neighbouring cell — queries probe
    several anyway.
    """
    n = x32.shape[0]
    K = centroids.shape[0]

    def score_of(xc):
        dot = jnp.dot(xc, centroids.T, preferred_element_type=jnp.float32)
        if metric == "cosine":
            # per-row |x| is constant in the argmax — centroid norms only
            cn = jnp.sqrt(jnp.sum(centroids * centroids, axis=-1))
            return dot / jnp.maximum(cn, 1e-30)[None, :]
        # sql2 geometry (||x||^2 constant per row — omit)
        cn2 = jnp.sum(centroids * centroids, axis=-1)
        return -(cn2[None, :] - 2.0 * dot)

    def choice_of(xc):
        s = score_of(xc)
        if K >= 128:
            _, ch = jax.lax.approx_max_k(s, A)
        else:
            _, ch = jax.lax.top_k(s, A)
        return ch.astype(jnp.int32)

    if n * K <= _CHOICE_TRIGGER_ELEMS:
        return choice_of(x32)
    c = max(256, _CHOICE_TILE_ELEMS // K)
    while n % c:  # n and c are powers of two in practice; guard anyway
        c //= 2
    return jax.lax.map(
        choice_of, x32.reshape(n // c, c, x32.shape[1])
    ).reshape(n, A)


def _place_rows(state: IVFState, x32: jnp.ndarray, real: jnp.ndarray,
                spill: int, metric: str):
    """Assign each real row a slab slot: nearest cell with room, ``spill``
    jittered fallbacks, then the shared spare region.

    Shared by :func:`insert` (f32/bf16 wire) and :func:`insert_quant`
    (host-quantised wire) so the placement policy can never diverge between
    the two.

    Returns ``(slots [n] int32, counts [K+1], dropped scalar int32)``.
    """
    n = x32.shape[0]
    K = state.num_clusters
    C = state.cluster_capacity
    choice = _cell_choice(x32, state.centroids, metric, min(spill, K))

    slots = jnp.full((n,), -1, jnp.int32)
    counts = state.counts
    assigned = ~real  # pads never write
    A = min(spill, K)
    # Attempt 0 is always the nearest cell. FALLBACK attempts rotate by a
    # per-row jitter: members of one tight blob share an identical choice
    # list, and without jitter a saturated cell's whole blob cascades into
    # the same 2nd cell, saturating the neighbourhood one cell per batch
    # until even `spill` hops fail. Jittering only the fallbacks splits an
    # overflowing blob two ways without displacing anyone whose nearest
    # cell has room.
    h = jnp.arange(n, dtype=jnp.int32) * jnp.int32(-1640531527)
    h = jnp.bitwise_xor(h, jax.lax.shift_right_logical(h, 16)) * jnp.int32(-2048144789)
    r0 = jax.lax.rem(jnp.abs(h), jnp.int32(max(min(2, A - 1), 1)))
    for a in range(A):
        if a == 0 or A == 1:
            pick = jnp.full((n,), a, jnp.int32)
        else:
            pick = 1 + jax.lax.rem(r0 + (a - 1), jnp.int32(A - 1))
        cand = jnp.take_along_axis(choice, pick[:, None], axis=1)[:, 0]
        c = jnp.where(assigned, OOB, cand.astype(jnp.int32))
        rank = _segmented_ranks(c)
        base = counts[jnp.clip(c, 0, K - 1)]
        pos = base + rank
        ok = ~assigned & (pos < C)
        slots = jnp.where(ok, c * C + pos, slots)
        counts = counts.at[jnp.where(ok, c, OOB)].add(1, mode="drop")
        assigned = assigned | ok

    # final round: everything still unplaced goes to the shared spare region
    # (always scanned at query time, so these stay exactly searchable)
    G = state.spare_capacity
    spare_rank = jnp.cumsum((~assigned).astype(jnp.int32)) - 1
    spare_pos = counts[K] + spare_rank
    spare_ok = ~assigned & (spare_pos < G)
    slots = jnp.where(spare_ok, K * C + spare_pos, slots)
    counts = counts.at[K].add(jnp.sum(spare_ok.astype(jnp.int32)))
    assigned = assigned | spare_ok

    dropped = jnp.sum((real & (slots < 0)).astype(jnp.int32))
    return slots, counts, dropped


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("spill", "metric")
)
def insert(
    state: IVFState,
    x: jnp.ndarray,
    n_valid: jnp.ndarray,
    spill: int = 4,
    metric: str = "sql2",
):
    """Insert a (padded) batch; state donated.

    Args:
      state: IVF state.
      x: ``[n, D]`` batch; rows ``>= n_valid`` are padding.
      n_valid: scalar int32 count of real rows.
      spill: nearest-centroid fallback attempts before counting a drop.
      metric: cell-selection metric — MUST match what :func:`query` probes
        with (its ``sel_metric``): under varying vector norms the cosine and
        sql2 nearest-centroid ORDERINGS differ, and a vector spilled deep
        into its sql2 list can fall outside a cosine query's probe set
        (measured: self-retrieval 0.68 on churn waves before this matched).

    Returns:
      ``(new_state, slots [n] int32)`` — slab position per row; ``-1`` for
      rows dropped on overflow (host retries them after growing) and for pads.
    """
    n = x.shape[0]
    real = jnp.arange(n, dtype=jnp.int32) < n_valid
    x32 = x.astype(jnp.float32)
    slots, counts, dropped = _place_rows(state, x32, real, spill, metric)
    widx = jnp.where(slots >= 0, slots, OOB)
    residual, rscales = state.residual, state.rscales
    if state.vectors.dtype == jnp.int8:
        # symmetric per-row quantisation; norms/scales describe the STORED
        # (dequantised) values so re-rank math is exact w.r.t. the slab
        absmax = jnp.max(jnp.abs(x32), axis=-1)
        # multiply by the f32 reciprocal constant, NOT divide: XLA folds
        # /127.0 into *(1/127.0) anyway, and writing the fold explicitly is
        # what keeps quantise_pair_host bitwise-identical to this path
        scale = jnp.where(absmax > 0, absmax * _INV127, 1.0)
        xd = jnp.clip(jnp.round(x32 / scale[:, None]), -127, 127).astype(jnp.int8)
        xs32 = xd.astype(jnp.float32) * scale[:, None]
        scales = state.scales.at[widx].set(scale, mode="drop")
        if residual is not None:
            # second-stage int8 of the quantisation error: the reconstruction
            # scale*v8 + rscale*r8 carries ~15 mantissa bits. norms then
            # describe the RECONSTRUCTED value, so the refine re-rank is
            # exact w.r.t. what the slab pair stores.
            res = x32 - xs32
            rabs = jnp.max(jnp.abs(res), axis=-1)
            rscale = jnp.where(rabs > 0, rabs * _INV127, 1.0)
            rd = jnp.clip(
                jnp.round(res / rscale[:, None]), -127, 127
            ).astype(jnp.int8)
            xs32 = xs32 + rd.astype(jnp.float32) * rscale[:, None]
            residual = residual.at[widx].set(rd, mode="drop")
            rscales = rscales.at[widx].set(rscale, mode="drop")
    else:
        xd = x.astype(state.vectors.dtype)
        xs32 = xd.astype(jnp.float32)  # norms of the STORED (rounded) vector
        scales = state.scales
    return (
        state.replace(
            counts=counts,
            vectors=state.vectors.at[widx].set(xd, mode="drop"),
            norms=state.norms.at[widx].set(jnp.sum(xs32 * xs32, axis=-1), mode="drop"),
            valid=state.valid.at[widx].set(slots >= 0, mode="drop"),
            overflow=state.overflow + dropped,
            scales=scales,
            residual=residual,
            rscales=rscales,
        ),
        slots,
    )


def quantise_pair_host(x: np.ndarray):
    """Host-side mirror of :func:`insert`'s int8+residual quantisation.

    Returns ``(v8 [n, D] int8, r8 [n, D] int8, scale [n] f32, rscale [n]
    f32)`` — the exact arrays the device path stores: IEEE f32 elementwise
    math with round-half-even (``np.rint`` == ``jnp.round``), so the output
    is BITWISE identical to device quantisation (asserted by
    ``tests/test_refine.py::test_host_quant_matches_device``).

    This is what makes the refine tier's WIRE cheap (round-3 verdict #1):
    shipping the pair + scales is ~``2*D + 8`` bytes/row — bf16-tier wire
    volume at full ~15-bit stored precision — where the previous refined
    wire shipped exact f32 (``4*D``) because the residual can only capture
    precision the wire delivered. Quantising host-side delivers ALL the
    precision in half the bytes.

    The hot path is the native kernel (``native/zebra_quant.cpp``: each row
    streams through L1 with an fmaf residual — the fused rounding equals the
    f64 emulation below bitwise, asserted by
    ``test_refine.py::test_native_quant_matches_numpy``). The numpy fallback
    walks full-array f64 passes and is ~15-30x slower per batch; it exists
    for toolchain-less hosts.
    """
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    from zebra_tpu.native import quant as _nq

    lib = _nq.get_lib()
    if lib is not None and x32.ndim == 2:
        n, d = x32.shape
        v8 = np.empty((n, d), np.int8)
        r8 = np.empty((n, d), np.int8)
        scale = np.empty((n,), np.float32)
        rscale = np.empty((n,), np.float32)
        lib.zq_quantise_pair(
            x32.ctypes.data, n, d,
            v8.ctypes.data, r8.ctypes.data,
            scale.ctypes.data, rscale.ctypes.data, 0,
        )
        return v8, r8, scale, rscale
    return _quantise_pair_numpy(x32)


def _quantise_pair_numpy(x32: np.ndarray):
    """Toolchain-less fallback for :func:`quantise_pair_host` (bitwise the
    native kernel — asserted by test_native_quant_matches_numpy)."""
    absmax = np.max(np.abs(x32), axis=-1)
    one = np.float32(1.0)
    scale = np.where(absmax > 0, absmax * _INV127, one).astype(np.float32)
    v8 = np.clip(np.rint(x32 / scale[:, None]), -127, 127).astype(np.int8)
    # XLA contracts `x - v8*scale` into an FMA (exact product, ONE f32
    # rounding); numpy rounds twice. Emulate the FMA exactly: the f64
    # product (<= 32 significant bits) and difference (~40 bits) are both
    # exactly representable, so the single cast back to f32 IS the fused
    # rounding — bitwise the device residual (asserted on the CPU backend
    # by tests/test_refine.py::test_host_quant_matches_device) and bitwise
    # C++ fmaf (correctly rounded by IEEE 754).
    res = (
        x32.astype(np.float64)
        - v8.astype(np.float64) * scale.astype(np.float64)[:, None]
    ).astype(np.float32)
    rabs = np.max(np.abs(res), axis=-1)
    rscale = np.where(rabs > 0, rabs * _INV127, one).astype(np.float32)
    r8 = np.clip(np.rint(res / rscale[:, None]), -127, 127).astype(np.int8)
    return v8, r8, scale, rscale


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("spill", "metric")
)
def insert_quant(
    state: IVFState,
    v8: jnp.ndarray,
    r8: jnp.ndarray,
    qscales: jnp.ndarray,
    n_valid: jnp.ndarray,
    spill: int = 4,
    metric: str = "sql2",
):
    """Insert a HOST-quantised batch into a residual-bearing int8 state.

    Args:
      state: IVF state (must carry ``residual``/``rscales``); donated.
      v8: ``[n, D]`` int8 coarse codes (:func:`quantise_pair_host`).
      r8: ``[n, D]`` int8 residual codes.
      qscales: ``[n, 2]`` f32 — column 0 the coarse scale, column 1 the
        residual scale.
      n_valid / spill / metric: as :func:`insert`.

    The shipped codes scatter into the slab UNCHANGED (no requantisation —
    the WAL's record and the slab's content stay bitwise equal); cell
    placement and norms use the on-device reconstruction
    ``v8*scale + r8*rscale`` (int8 -> f32 casts are exact), preserving
    :func:`insert`'s contract that ``norms`` describe the reconstructed
    stored value exactly.
    """
    n = v8.shape[0]
    real = jnp.arange(n, dtype=jnp.int32) < n_valid
    scale = qscales[:, 0]
    rscale = qscales[:, 1]
    x32 = (
        v8.astype(jnp.float32) * scale[:, None]
        + r8.astype(jnp.float32) * rscale[:, None]
    )
    slots, counts, dropped = _place_rows(state, x32, real, spill, metric)
    widx = jnp.where(slots >= 0, slots, OOB)
    return (
        state.replace(
            counts=counts,
            vectors=state.vectors.at[widx].set(v8, mode="drop"),
            norms=state.norms.at[widx].set(jnp.sum(x32 * x32, axis=-1), mode="drop"),
            valid=state.valid.at[widx].set(slots >= 0, mode="drop"),
            overflow=state.overflow + dropped,
            scales=state.scales.at[widx].set(scale, mode="drop"),
            residual=state.residual.at[widx].set(r8, mode="drop"),
            rscales=state.rscales.at[widx].set(rscale, mode="drop"),
        ),
        slots,
    )


def grow_spare(state: IVFState) -> IVFState:
    """Double the spare region by appending zero rows at the slab tail.

    Existing slot numbering is untouched (clusters keep their offsets, spare
    rows keep theirs), so the host id maps need no remapping, and the HBM
    transient is old-slab + pad — never 2x slab like an in-place
    cluster-capacity doubling would be.
    """
    g = max(state.spare_capacity, 1024)
    return state.replace(
        vectors=jnp.pad(state.vectors, ((0, g), (0, 0))),
        norms=jnp.pad(state.norms, (0, g)),
        valid=jnp.pad(state.valid, (0, g)),
        scales=None if state.scales is None
        else jnp.pad(state.scales, (0, g), constant_values=1.0),
        residual=None if state.residual is None
        else jnp.pad(state.residual, ((0, g), (0, 0))),
        rscales=None if state.rscales is None
        else jnp.pad(state.rscales, (0, g), constant_values=1.0),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def delete_slots(state: IVFState, slots: jnp.ndarray) -> IVFState:
    """Tombstone slab slots (negative entries ignored); state donated.

    Cluster ``counts`` keep the allocated width — tombstoned rows stay masked
    until the host compacts (see lsh.rs:487-492 note in buckets.delete_slots).
    """
    s = jnp.where(slots >= 0, slots, OOB)
    return state.replace(valid=state.valid.at[s].set(False, mode="drop"))


def select_probes(state: IVFState, q32: jnp.ndarray, P: int,
                  sel_metric: str, probe_sel: str = "auto") -> jnp.ndarray:
    """Pick the ``P`` nearest clusters per query -> [B, P] int32.

    "auto"/"fast" (K >= 128, 2P < K): two-stage — stage 1 is one bf16 MXU
    pass over ALL centroids (exact products of bf16-rounded values; f32
    accumulate) with the scores cast bf16 so the partial top-k reduction
    runs on half the bytes, keeping a 2P-wide candidate set; stage 2
    rescores the 2P survivors in exact f32 (a tiny [B, 2P, D] gather +
    batched dots) and keeps the true top-P. More faithful than a direct
    f32 approx top-P (0.999 vs 0.988 probe overlap vs exact) and ~3x
    cheaper (tools/abl_centroid.py). "f32" = single-stage f32 score +
    approx_max_k (the round-2/3 path). Traced inline by ``query``;
    exposed for profiling (tools/profile_query_ivf.py).
    """
    K = state.num_clusters
    two_stage = probe_sel in ("auto", "fast") and K >= 128 and 2 * P < K
    if two_stage:
        cb = state.centroids.astype(jnp.bfloat16)
        dot = jnp.dot(
            q32.astype(jnp.bfloat16), cb.T, preferred_element_type=jnp.float32
        )
        cn2 = jnp.sum(state.centroids * state.centroids, axis=-1)
        if sel_metric == "cosine":
            s = dot * jax.lax.rsqrt(jnp.maximum(cn2, 1e-30))[None, :]
        else:  # l2 / sql2: same argmax ordering
            s = 2.0 * dot - cn2[None, :]
        _, cand = jax.lax.approx_max_k(s.astype(jnp.bfloat16), 2 * P)
        cand = cand.astype(jnp.int32)  # [B, 2P]
        cg = jnp.take(state.centroids, cand, axis=0)
        dots = jnp.einsum(
            "bd,bpd->bp", q32, cg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cn2c = jnp.take(cn2, cand, axis=0)
        if sel_metric == "cosine":
            fs = dots * jax.lax.rsqrt(jnp.maximum(cn2c, 1e-30))
        else:
            fs = 2.0 * dots - cn2c
        _, ix = jax.lax.top_k(fs, P)
        return jnp.take_along_axis(cand, ix, axis=1)
    score = D.pairwise(
        q32, state.centroids, metric=sel_metric, precision="default"
    )
    # approx_max_k: TPU-native partial reduction — probe selection
    # tolerates its ~0.3% miss rate (a missed 4th-nearest cell, not a
    # missed neighbour)
    if K >= 128:
        _, probes = jax.lax.approx_max_k(-score, P)
        return probes.astype(jnp.int32)
    _, probes = jax.lax.top_k(-score, P)  # [B, P] cluster ids
    return probes


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "num_probes", "rerank", "qchunk",
                     "rerank_dots", "probe_sel", "batch_chunk",
                     "rerank_fetch", "refine_k", "refine_scan"),
)
def query(
    state: IVFState,
    q: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    num_probes: int = 8,
    power: float = 3.0,
    rerank: str = "xla",
    qchunk: int = 256,
    rerank_dots: str = "auto",
    probe_sel: str = "auto",
    batch_chunk: int = 0,
    rerank_fetch: str = "auto",
    refine_k: int = 0,
    refine_scan: bool = False,
):
    """Approximate top-k: score centroids -> top-P blocks -> exact re-rank.

    Cluster *selection* uses the index metric for MXU metrics and sql2
    geometry otherwise (elementwise metrics over [B, K, D] would dwarf the
    re-rank; sql2 picks the same nearby regions). Re-rank always uses the
    true metric.

    probe_sel: "auto"/"fast" = 1-pass bf16 score + bf16 approx top-2P +
    exact f32 rescore of the 2P survivors (see tools/abl_centroid.py: the
    3-pass f32 score and the f32 approx_max_k were ~1.2ms/batch, ~45% of
    post-bf16x2 query time; the 2-stage select measures ~0.45ms and its
    top-P-of-2P refinement is MORE faithful than a direct f32 approx top-P).
    "f32" = the round-2/3 single-stage path.

    refine_k (> k, residual-bearing int8 slabs only): the probe scan keeps
    ``refine_k`` candidates on the 1-byte slab, then a final pass re-ranks
    them exactly against the int8+residual reconstruction (~15-bit values)
    and returns the true top-``k`` — int8 scan bandwidth, ~f32 recall.

    refine_scan (residual-bearing int8 slabs only; overrides refine_k):
    stream the RESIDUAL slab through the probe scan itself — every scanned
    row scores against the full reconstruction (2 bytes/element of probe
    traffic, a bf16 slab's bandwidth at better-than-bf16 precision), no
    oversample cutoff, no candidate gather pass.

    Returns:
      ``(dists [B, k], slots [B, k], valid [B, k])``.
    """
    B = q.shape[0]
    K = state.num_clusters
    C = state.cluster_capacity
    P = min(num_probes, K)
    scan_res = refine_scan and state.residual is not None
    if scan_res:
        refine_k = 0
    kk = refine_k if (state.residual is not None and refine_k > k) else k

    # Huge query batches: the centroid stage materialises [B, K] score
    # transients (measured OOM: B=65536, K=16384 on a 16GB chip with a
    # 1M x 768 slab). batch_chunk=0 (auto) splits B so the transient stays
    # ~<=5GB — ONE dispatch, lax.map loops chunks on-device (the whole
    # point of big batches here is amortising per-dispatch host overhead,
    # so a host-side loop would defeat it). Explicit batch_chunk forces a
    # chunk size; batch_chunk >= B disables.
    if batch_chunk == 0:
        Dd_ = state.dim
        # per-row transient bytes: the [B, K] score pair (8) plus, under
        # refine, the [B, kk, D] int8 candidate/residual gathers (x3 slack
        # for the fused-convert dot operands)
        per_row = K * 8 + (3 * kk * Dd_ if kk != k else 0)
        # transient budget: 5GB, shrunk by however far the RESIDENT state
        # exceeds a 1M-tier footprint — a capacity-scale slab (e.g. 4M x
        # 768 int8+residual = 12.5GB) leaves nowhere near 5GB of HBM free
        # on a 16GB chip (round-5 bigslab sizing; shapes are static so this
        # arithmetic folds at trace time)
        state_bytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in (state.centroids, state.vectors, state.norms,
                      state.valid, state.scales, state.residual,
                      state.rscales)
            if a is not None
        )
        budget = min(5_000_000_000, max(14_000_000_000 - state_bytes,
                                        1_000_000_000))
        nch = max(1, -(-(B * per_row) // budget))
        batch_chunk = -(-B // nch)
    if batch_chunk < B:
        nch = -(-B // batch_chunk)
        pad = nch * batch_chunk - B
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        qc = qp.reshape(nch, batch_chunk, q.shape[1])

        def _one(qi):
            return query(
                state, qi, k, metric=metric, num_probes=num_probes,
                power=power, rerank=rerank, qchunk=qchunk,
                rerank_dots=rerank_dots, probe_sel=probe_sel,
                batch_chunk=batch_chunk, rerank_fetch=rerank_fetch,
                refine_k=refine_k, refine_scan=refine_scan,
            )

        dc, sc_, vc = jax.lax.map(_one, qc)
        flat = lambda a: a.reshape(nch * batch_chunk, *a.shape[2:])[:B]
        return flat(dc), flat(sc_), flat(vc)
    q32 = q.astype(jnp.float32)

    sel_metric = metric if metric in D.MXU_METRICS else "sql2"
    probes = select_probes(state, q32, P, sel_metric, probe_sel)

    if (
        rerank in ("pallas", "pallas2")
        and metric in D.MXU_METRICS
        and kk <= 128
    ):
        # the wave kernel's top-k output is OUT_K=128 wide; larger k falls
        # back to the XLA path below (same results). "pallas2" selects the
        # one-matmul wave kernel (see ops/pallas_ivf._kernel_factory_v2).
        from zebra_tpu.ops.pallas_ivf import ivf_rerank

        if rerank_dots == "auto":
            # reduced-precision slabs: per-pass bf16 products are exact, so
            # the split-query dot keeps ranking (overlap 0.9999) while
            # cutting MXU passes — the measured kernel bottleneck
            # (tools/abl_aux.py). "bf16x2f" fuses qhi/qlo as two lhs ROWS
            # of ONE dot issue (row tiles pad to 128 anyway): measured
            # 332.9k vs 319.5k QPS for the 2-issue bf16x2 at identical
            # recall 1.0 (bench_results/r3_sweep_fused_dots.json). f32
            # slabs use the 3-term split of BOTH operands (qhi*bhi +
            # qhi*blo + qlo*bhi; the dropped qlo*blo term is below f32
            # rounding), fused to 2 issues ("bf16x3f"): measured 219.5k
            # (x3) vs 212.4k QPS for the exact 6-pass HIGHEST dot at
            # identical true-f32 recall 1.0 (r3_ann_f32_p4_x3.json). Pass
            # rerank_dots="highest" for the bitwise-f32 dot.
            reduced = state.vectors.dtype in (jnp.bfloat16, jnp.int8)
            rerank_dots_r = "bf16x2f" if reduced else "bf16x3f"
        else:
            rerank_dots_r = rerank_dots
        dk, ik, vk = ivf_rerank(
            state, q32, probes.astype(jnp.int32), kk, metric=metric,
            # the residual-streaming kernel is v1-only (v2's one-matmul wave
            # has no second-slab path; scan mode forces v1 — same results)
            wave=2 if rerank == "pallas2" and not scan_res else 1,
            dots=rerank_dots_r, fetch=rerank_fetch, scan_residual=scan_res,
        )
        dk, ik, vk = _merge_spare(state, q32, dk, ik, vk, kk, metric, power,
                                  scan_res=scan_res)
        return _refine_topk(state, q32, dk, ik, vk, k, metric, power)

    # contiguous block reads off the full slab (the spare tail forbids a
    # [K, C, D] reshape; vmapped dynamic_slice lowers to the same block gather)
    Dd = state.dim

    def take_block(arr, width):
        def one(c):
            if arr.ndim == 2:
                return jax.lax.dynamic_slice(arr, (c * C, 0), (C, width))
            return jax.lax.dynamic_slice(arr, (c * C,), (C,))

        return jax.vmap(one)

    qn2 = jnp.sum(q32 * q32, axis=-1)[:, None]
    col = jnp.arange(C, dtype=jnp.int32)[None, :]

    init = (
        jnp.full((B, kk), jnp.inf, jnp.float32),
        jnp.full((B, kk), -1, jnp.int32),
        jnp.zeros((B, kk), jnp.bool_),
    )

    def body(carry, p):
        cl = probes[:, p]  # [B]
        vecs = take_block(state.vectors, Dd)(cl)  # [B, C, D]
        vl = take_block(state.valid, 1)(cl)  # [B, C]
        nrm = take_block(state.norms, 1)(cl)  # [B, C]
        sl = cl[:, None] * C + col
        sc = take_block(state.scales, 1)(cl) if state.scales is not None else None
        if metric in D.MXU_METRICS:
            dots = jnp.einsum(
                "bd,bcd->bc",
                q32,
                vecs.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if sc is not None:  # dequant after the dot: dot(q, s*v) = s*dot
                dots = dots * sc
            if scan_res:
                # refine="scan": score the full reconstruction — add the
                # residual term (nrm already holds the refined |value|^2)
                r8 = take_block(state.residual, Dd)(cl)
                rs = take_block(state.rscales, 1)(cl)
                dots = dots + rs * jnp.einsum(
                    "bd,bcd->bc",
                    q32,
                    r8.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            d = D.mxu_from_parts(metric, dots, qn2, nrm)
        else:
            vf = vecs.astype(jnp.float32)
            if sc is not None:
                vf = vf * sc[..., None]
            if scan_res:
                r8 = take_block(state.residual, Dd)(cl)
                rs = take_block(state.rscales, 1)(cl)
                vf = vf + r8.astype(jnp.float32) * rs[..., None]
            d = D.rowwise(q32, vf, metric=metric, power=power)
        # k may exceed the C-wide block (lax.top_k rejects k > width): select
        # min(k, C) per probe — merge_topk reselects k from unequal widths
        td, ti, tv = TK.masked_topk(d, vl, sl, min(kk, C))
        return TK.merge_topk(carry[0], carry[1], carry[2], td, ti, tv, kk), None

    (dk, ik, vk), _ = jax.lax.scan(body, init, jnp.arange(P))
    dk, ik, vk = _merge_spare(state, q32, dk, ik, vk, kk, metric, power,
                              scan_res=scan_res)
    return _refine_topk(state, q32, dk, ik, vk, k, metric, power)


def _refine_topk(state: IVFState, q32, dk, ik, vk, k: int, metric: str,
                 power: float):
    """Exact re-rank of an oversampled candidate set on the residual pair.

    Reconstruction math never materialises f32 rows for MXU metrics: with
    value = s*v8 + r*r8, ``dot(q, value) = s*dot(q, v8) + r*dot(q, r8)``
    (int8 -> f32 casts are exact and fuse into the dot operands), and the
    hi term ``s*dot(q, v8)`` is recovered from the coarse distance itself
    (dot inversion, below) — so the whole pass is ONE skinny [B, kk, D]
    residual gather + one batched dot. No-op when the state carries no
    residual or the candidate set is already k-wide.
    """
    if state.residual is None or dk.shape[1] <= k:
        return dk, ik, vk
    idx = jnp.where(vk, ik, 0)
    if metric in D.MXU_METRICS:
        # Dot inversion: every MXU metric is invertible given (qn2, n2), and
        # EVERY producer of dk (wave kernel, XLA block re-rank, spare/brute
        # exact_scan with norms=) computes it from the refined state.norms —
        # so dk already encodes the coarse dot ``s*dot(q, v8)`` exactly
        # (coarse dots ride split-query passes, f32-grade). Recovering it
        # elementwise removes HALF the refine pass: no [B, kk, D] v8
        # re-gather, no hi dot — the measured bottleneck was those gathers
        # (tools/abl_refine.py: 24.6ms of 34.1ms per 16k batch). Only the
        # residual gather + one dot remain.
        qn2 = jnp.sum(q32 * q32, axis=-1)[:, None]
        n2 = jnp.take(state.norms, idx)  # refined |value|^2 (insert contract)
        hi = D.mxu_invert_parts(metric, dk, qn2, n2)
        r8 = jnp.take(state.residual, idx, axis=0)  # [B, kk, D] int8
        rs = jnp.take(state.rscales, idx)
        lo = jnp.einsum(
            "bd,bkd->bk", q32, r8.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = D.mxu_from_parts(metric, hi + lo * rs, qn2, n2)
    else:
        v8 = jnp.take(state.vectors, idx, axis=0)  # [B, kk, D] int8
        r8 = jnp.take(state.residual, idx, axis=0)
        sc = jnp.take(state.scales, idx)  # [B, kk]
        rs = jnp.take(state.rscales, idx)
        vf = (
            v8.astype(jnp.float32) * sc[..., None]
            + r8.astype(jnp.float32) * rs[..., None]
        )
        d = D.rowwise(q32, vf, metric=metric, power=power)
    return TK.masked_topk(jnp.where(vk, d, jnp.inf), vk, ik, k)


def _merge_spare(state: IVFState, q32, dk, ik, vk, k: int, metric: str,
                 power: float, scan_res: bool = False):
    """Fold the shared spare region into partial top-k results.

    ``[B, D] x [D, G]`` matmuls streamed once for the whole batch — the
    spare block is query-independent, so unlike cluster probes it rides the
    MXU at full batch efficiency. With a well-balanced partition the spare
    is usually EMPTY (measured 0 at 1M x 768), so the whole scan sits behind
    a ``lax.cond`` — an empty spare costs one scalar compare, not a matmul.

    The scan is CHUNKED (exact_scan over the spare slice): between a
    spare-growth episode and the rebuild that follows it, G can transiently
    reach millions of rows, and an unchunked [B, G] distance matrix is a
    multi-GB HBM temporary (a 10M-churn wave OOMed exactly there).
    """
    G = state.spare_capacity
    if G == 0:
        return dk, ik, vk
    start = state.spare_start

    def with_spare(args):
        from zebra_tpu.ops.scan import exact_scan

        dk, ik, vk = args
        # WINDOWED scan over [start, start+G): exact_scan slices one chunk
        # at a time from the FULL arrays. Pre-slicing the spare here was a
        # [G, D] HLO temp — at a grown spare that was an 8GB allocation
        # that compile-OOMed the 10M churn (round 5); the window form has
        # a one-chunk transient regardless of G. norms ride along for
        # residual slabs (reconstructed-value contract, see exact_scan);
        # refine="scan" scores spare rows against the reconstruction too
        # (the probe path has no refine pass to fix them up later).
        td, ti, tv = exact_scan(
            state.vectors, state.valid, q32, min(k, G), metric=metric,
            power=power, chunk=65536, scales=state.scales,
            norms=state.norms if state.residual is not None else None,
            residual=state.residual if scan_res else None,
            rscales=state.rscales if scan_res else None,
            w_start=start, w_len=G,
        )
        ti = jnp.where(tv, ti, -1)
        return TK.merge_topk(dk, ik, vk, td, ti, tv, k)

    return jax.lax.cond(
        state.counts[-1] > 0, with_spare, lambda args: args, (dk, ik, vk)
    )


def brute_force(
    state: IVFState,
    q: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    power: float = 3.0,
    chunk: int = 8192,
    precision: str = "highest",
    approx: bool = False,
):
    """Exact top-k over the whole slab (shared scan op).

    Residual-bearing int8 slabs stream BOTH slabs and score every row
    against the full reconstruction (exact w.r.t. the stored ~15-bit
    values; no oversample cutoff) — this is the exactness oracle, so it
    takes the 2-byte scan over the cheaper coarse-scan-then-refine shape.
    """
    from zebra_tpu.ops.scan import exact_scan

    norms = residual = rscales = None
    if state.residual is not None:
        norms = state.norms  # reconstructed-value contract (see exact_scan)
        residual, rscales = state.residual, state.rscales
    return exact_scan(
        state.vectors, state.valid, q, k, metric=metric, power=power,
        chunk=chunk, precision=precision, approx=approx, scales=state.scales,
        norms=norms, residual=residual, rscales=rscales,
    )


@jax.jit
def num_valid(state: IVFState) -> jnp.ndarray:
    return jnp.sum(state.valid.astype(jnp.int32))
