"""Device-resident LSH bucket tables: pure, jit-compiled index operations.

This is the TPU-native isomorphism of the reference's forest of binary
space-partitioning trees (``src/database/index/lsh.rs``):

  tree                      -> one hash table (row axis ``T``)
  root-to-leaf sign path    -> packed b-bit code (one MXU matmul for ALL
                               tables at once, see ``ops/hashing.py``)
  leaf node (Vec<Uuid>)     -> fixed-capacity bucket row of int32 slab slots
  per-vector tree insert    -> sort-by-code segmented scatter-append
                               (contention-free: intra-batch ranks computed
                               with a cummax scan, no atomics needed)
  delete / missing id       -> tombstone bit in the ``valid`` mask (the
                               reference leaves dangling ids in inner leaves
                               and resolves them to zero-vectors,
                               ``lsh.rs:107-119,487-492`` — we mask instead)
  sibling backtracking      -> multi-probe bucket gather
  candidate union + re-rank -> masked gather + batched exact distances +
                               running top-k merge over candidate chunks

Everything here is shape-static and functional: the host layer
(:mod:`zebra_tpu.index.lsh`) owns growth/rebuild decisions, id mapping, and
persistence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from zebra_tpu.ops import distances as D
from zebra_tpu.ops import hashing as H

#: huge-batch transient budget (bytes) before query() splits B on-device —
#: module-level so tests can shrink it to exercise the chunked path
_BATCH_TRANSIENT_BUDGET = 5_000_000_000
from zebra_tpu.ops import topk as TK

#: Out-of-bounds sentinel used to make scatter writes drop.
OOB = np.int32(2**30)  # np scalar — see note in ops/topk.py


@struct.dataclass
class IndexState:
    """All device arrays of one index shard (a pytree)."""

    planes: jnp.ndarray  # [T, b, D] f32 hyperplane normals
    consts: jnp.ndarray  # [T, b]    f32 hyperplane offsets
    buckets: jnp.ndarray  # [T, R, C] int32 slab slots, -1 = empty
    counts: jnp.ndarray  # [T, R]    int32 filled slots per bucket (<= C)
    vectors: jnp.ndarray  # [S, D]    vector slab
    norms: jnp.ndarray  # [S]       f32 squared L2 norms (re-rank needs only
    #                                 dots + norms for cosine/l2/sql2)
    valid: jnp.ndarray  # [S]       bool liveness (False = empty/tombstone)
    next_slot: jnp.ndarray  # []    int32 bump allocator
    overflow: jnp.ndarray  # []     int32 dropped bucket entries (regrow signal)

    @property
    def num_tables(self) -> int:
        return self.buckets.shape[0]

    @property
    def bits(self) -> int:
        return self.planes.shape[1]

    @property
    def num_rows(self) -> int:
        return self.buckets.shape[1]

    @property
    def bucket_capacity(self) -> int:
        return self.buckets.shape[2]

    @property
    def slab_capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def empty_state(
    planes: jnp.ndarray,
    consts: jnp.ndarray,
    bucket_capacity: int,
    slab_capacity: int,
    dtype=jnp.float32,
) -> IndexState:
    """Fresh state for given hyperplanes and capacities."""
    T, b, dim = planes.shape
    R = 1 << b
    return IndexState(
        planes=planes.astype(jnp.float32),
        consts=consts.astype(jnp.float32),
        buckets=jnp.full((T, R, bucket_capacity), -1, dtype=jnp.int32),
        counts=jnp.zeros((T, R), dtype=jnp.int32),
        vectors=jnp.zeros((slab_capacity, dim), dtype=dtype),
        norms=jnp.zeros((slab_capacity,), dtype=jnp.float32),
        valid=jnp.zeros((slab_capacity,), dtype=jnp.bool_),
        next_slot=jnp.zeros((), dtype=jnp.int32),
        overflow=jnp.zeros((), dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# Insert
# ---------------------------------------------------------------------------


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap deterministic int32 mixer (murmur3 finalizer shape)."""
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))
    x = x * jnp.int32(-2048144789)  # 0x85ebca6b
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 13))
    x = x * jnp.int32(-1028477387)  # 0xc2b2ae35
    return jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))


def _append_one_table(bucket_t, count_t, code_t, slots, table_salt):
    """Scatter-append a batch into one table's buckets.

    ``code_t``: [n] int32 codes (OOB for padding rows); ``slots``: [n] slab
    slots. Duplicate codes within the batch get consecutive positions via a
    sort + segmented-rank scan — the deterministic, atomics-free TPU analogue
    of the reference's per-vector read-modify-write of whole trees
    (``lsh.rs:445-462``).

    Overflowing entries do RESERVOIR SAMPLING: the j-th vector ever hashed to
    a bucket replaces a uniformly random occupant with probability C/(j+1),
    using a per-(table, slot) deterministic hash. Without this, a bucket
    keeps its first-C arrivals — IDENTICALLY in every table (insert order is
    shared) — and later members of a hot bucket become unreachable through
    any table. With it, each table keeps an independent random sample, so a
    member survives in >=1 of T tables w.p. 1-(1-C/load)^T.

    ``count_t`` holds TRUE occupancy counts (not clipped at capacity).

    NOTE: do NOT pass unique_indices/indices_are_sorted scatter hints — the
    hinted scatter MISCOMPILES on TPU (v5e, jax 0.9): buckets corrupt and
    recall@10 drops from ~0.97 to ~0.48. Bisected 2026-08-16.
    """
    n = code_t.shape[0]
    R, C = bucket_t.shape
    order = jnp.argsort(code_t)  # pads (OOB) sort last
    c = code_t[order]
    s = slots[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), c[1:] != c[:-1]])
    start_pos = jnp.where(is_start, ar, jnp.int32(0))
    seg_start = jax.lax.associative_scan(jnp.maximum, start_pos)
    rank = ar - seg_start
    base = count_t[jnp.clip(c, 0, R - 1)]
    seen = base + rank  # true running occupancy index of this entry
    in_row = c < R  # real (non-pad) rows

    h = _mix32(s + table_salt * jnp.int32(-1640531527))  # 0x9e3779b9
    u = jax.lax.rem(jnp.abs(h), jnp.maximum(seen + 1, 1))
    pos = jnp.where(seen < C, seen, jnp.where(u < C, u, OOB))
    new_bucket = bucket_t.at[c, pos].set(s, mode="drop")
    new_count = count_t.at[c].add(in_row.astype(jnp.int32), mode="drop")
    overflow = jnp.sum((in_row & (seen >= C)).astype(jnp.int32))
    return new_bucket, new_count, overflow


@functools.partial(jax.jit, donate_argnums=(0,))
def insert(state: IndexState, x: jnp.ndarray, n_valid: jnp.ndarray):
    """Insert a (padded) batch of vectors.

    The state is DONATED: XLA updates the slab and bucket tables in place
    instead of copying the (multi-GB) buffers — callers must use the returned
    state and never touch the argument again.

    Args:
      state: index state.
      x: ``[n, D]`` batch; rows ``>= n_valid`` are padding and ignored.
      n_valid: scalar int32 count of real rows (pads must be at the end).

    Returns:
      ``(new_state, slots [n])`` — slot ``i`` is the slab position of row
      ``i`` (undefined for pad rows).
    """
    n = x.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    real = ar < n_valid
    slots = jnp.where(real, state.next_slot + ar, OOB)

    # slab rows are a contiguous block starting at next_slot — a single
    # dynamic_update_slice, not a scatter. Pad rows land past n_valid with
    # valid=False (overwritten by the next batch).
    xd = x.astype(state.vectors.dtype)
    vectors = jax.lax.dynamic_update_slice(state.vectors, xd, (state.next_slot, 0))
    # norms of the STORED (possibly bf16-rounded) vector, not the input —
    # re-rank combines stored norms with dots of stored vectors, and a
    # mismatch biases distances on low-precision slabs
    xs32 = xd.astype(jnp.float32)
    norms = jax.lax.dynamic_update_slice(
        state.norms, jnp.sum(xs32 * xs32, axis=-1), (state.next_slot,)
    )
    valid = jax.lax.dynamic_update_slice(state.valid, real, (state.next_slot,))

    codes = H.hash_codes(x, state.planes, state.consts)  # [n, T]
    codes = jnp.where(real[:, None], codes, OOB)
    salts = jnp.arange(1, state.num_tables + 1, dtype=jnp.int32)
    buckets, counts, ovf = jax.vmap(_append_one_table, in_axes=(0, 0, 1, None, 0))(
        state.buckets, state.counts, codes, slots, salts
    )
    return (
        state.replace(
            buckets=buckets,
            counts=counts,
            vectors=vectors,
            norms=norms,
            valid=valid,
            next_slot=state.next_slot + n_valid.astype(jnp.int32),
            overflow=state.overflow + jnp.sum(ovf),
        ),
        slots,
    )


# ---------------------------------------------------------------------------
# Delete (tombstone)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(0,))
def delete_slots(state: IndexState, slots: jnp.ndarray) -> IndexState:
    """Tombstone slab slots (negative entries are ignored); state donated.

    Bucket rows keep the stale slot ids; queries mask them via ``valid``.
    The host layer compacts when tombstone density grows. This *actually*
    removes vectors from search results — unlike the reference, whose remove
    only scrubs root-level leaves (``lsh.rs:487-492``).
    """
    s = jnp.where(slots >= 0, slots, OOB)
    return state.replace(valid=state.valid.at[s].set(False, mode="drop"))


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------


def _chunked_rerank(state, q, cand, cand_valid, k, metric, power, chunk):
    """Gather candidate vectors chunk-by-chunk, compute exact distances,
    and keep a running top-k (bounds peak memory to ``B * chunk * D``)."""
    B, M = cand.shape
    # cap the gather buffer at ~8GB (f32 elements) so big batches don't OOM
    max_chunk = max(256, (2**31) // max(B * state.dim, 1))
    chunk = min(chunk, max_chunk)
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
        cand_valid = jnp.pad(cand_valid, ((0, 0), (0, pad)))
    cand_c = cand.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    valid_c = cand_valid.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    init = (
        jnp.full((B, k), jnp.inf, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
        jnp.zeros((B, k), jnp.bool_),
    )

    q32 = q.astype(jnp.float32)
    qn2 = jnp.sum(q32 * q32, axis=-1)[:, None]  # [B, 1]

    def body(carry, xs):
        sl, vl = xs
        idx = jnp.clip(sl, 0, state.slab_capacity - 1)
        vecs = state.vectors[idx]
        if metric in D.MXU_METRICS:
            # stored squared norms: only dots come from the gathered vectors
            dot = jnp.einsum(
                "bd,bcd->bc",
                q32,
                vecs.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d = D.mxu_from_parts(metric, dot, qn2, state.norms[idx])
        else:
            d = D.rowwise(q, vecs, metric=metric, power=power)
        # k can exceed the candidate-chunk width (lax.top_k rejects that):
        # select min(k, chunk) per chunk, merge_topk reselects k
        td, ti, tv = TK.masked_topk(d, vl, sl, min(k, sl.shape[1]))
        return TK.merge_topk(carry[0], carry[1], carry[2], td, ti, tv, k), None

    (dk, ik, vk), _ = jax.lax.scan(body, init, (cand_c, valid_c))
    return dk, ik, vk


def _candidates(
    state: IndexState, q: jnp.ndarray, num_probes: int, max_candidates: int = 0
):
    """Hash queries, gather multiprobe bucket rows, dedup across tables.

    Reference counterparts: tree descent (``lsh.rs:333-345``), sibling
    backtrack, DashSet union across trees (``lsh.rs:550-556``).

    When ``max_candidates`` > 0 the deduped survivors are compacted to the
    front (scan + scatter, no extra sort) and truncated to that width — the
    re-rank then never gathers masked duplicates, which at 15 tables x 8
    probes commonly halves its HBM traffic.
    """
    acts = H.hash_activations(q, state.planes, state.consts)  # [B, T, b]
    probes = H.multiprobe(acts, num_probes)  # [B, T, P]
    T = state.num_tables
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    cand = state.buckets[t_idx, probes]  # [B, T, P, C]
    B = q.shape[0]
    cand = cand.reshape(B, -1)

    # Dedup across tables/probes: sort slots per row, mask repeats.
    cand = jnp.sort(cand, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.bool_), cand[:, 1:] == cand[:, :-1]], axis=1
    )
    in_slab = (cand >= 0) & (cand < state.slab_capacity)
    live = state.valid[jnp.clip(cand, 0, state.slab_capacity - 1)]
    cand_valid = in_slab & live & ~dup

    if max_candidates and max_candidates < cand.shape[1]:
        # stable compaction via argsort on validity (XLA sorts beat scatters
        # on TPU for this shape)
        M = max_candidates
        keys = jnp.where(cand_valid, jnp.cumsum(cand_valid, axis=1) - 1, OOB)
        order = jnp.argsort(keys, axis=1)[:, :M]
        out = jnp.take_along_axis(jnp.where(cand_valid, cand, -1), order, axis=1)
        return out, out >= 0
    return cand, cand_valid


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "num_probes", "chunk", "rerank", "max_candidates"),
)
def query(
    state: IndexState,
    q: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    num_probes: int = 8,
    power: float = 3.0,
    chunk: int = 2048,
    rerank: str = "xla",
    max_candidates: int = 0,
):
    """Approximate top-k search for a batch of queries.

    Pipeline: hash -> multi-probe bucket gather -> dedup -> exact re-rank +
    top-k. ``rerank`` selects the re-rank backend: "xla" (chunked gather +
    einsum, any metric) or "pallas" (fused DMA-gather kernel, MXU metrics,
    TPU only — see ``ops/pallas_rerank.py``).

    Returns:
      ``(dists [B, k], slots [B, k], valid [B, k])`` — slots are slab
      positions; the host maps them to ids. Invalid tail entries are -1/+inf.
    """
    full = state.num_tables * num_probes * state.bucket_capacity
    if max_candidates <= 0:
        # default: no truncation — measured on v5e, compaction's extra pass
        # costs more than the duplicate gathers save, and truncating below
        # the unique-candidate count costs recall (small-db regime)
        max_candidates = full

    # Huge query batches: the re-rank stage materialises [B, chunk, D] f32
    # candidate gathers plus [B, M] candidate arrays (measured compile-OOM:
    # B=16384, 15 tables, 1M x 768 f32 on a 16GB chip). Split B so the
    # transient stays ~<=5GB — ONE dispatch, lax.map loops the chunks
    # on-device (mirrors ivf.query's auto batch_chunk; a host loop would
    # forfeit the big batch's dispatch amortisation).
    B = q.shape[0]
    per_row = chunk * state.dim * 8 + max_candidates * 24
    nch = max(1, -(-(B * per_row) // _BATCH_TRANSIENT_BUDGET))
    if nch > 1:
        bchunk = -(-B // nch)
        pad = nch * bchunk - B
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        qc = qp.reshape(nch, bchunk, q.shape[1])

        def _one(qi):
            return query(
                state, qi, k, metric=metric, num_probes=num_probes,
                power=power, chunk=chunk, rerank=rerank,
                max_candidates=max_candidates,
            )

        dc, sc_, vc = jax.lax.map(_one, qc)
        flat = lambda a: a.reshape(nch * bchunk, *a.shape[2:])[:B]
        return flat(dc), flat(sc_), flat(vc)
    cand, cand_valid = _candidates(state, q, num_probes, max_candidates)
    if rerank == "pallas" and metric in D.MXU_METRICS:
        from zebra_tpu.ops.pallas_rerank import PAIR as PCHUNK, pallas_rerank

        B, M = cand.shape
        pad = (-M) % PCHUNK
        if pad:
            cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
            cand_valid = jnp.pad(cand_valid, ((0, 0), (0, pad)))
        idx = jnp.clip(cand, 0, state.slab_capacity - 1)
        cand_norms = state.norms[idx]
        dists, pos = pallas_rerank(
            state.vectors,
            q.astype(jnp.float32),
            cand,
            cand_norms,
            cand_valid.astype(jnp.float32),
            metric=metric,
            k=k,
        )
        valid = pos >= 0
        slots = jnp.take_along_axis(cand, jnp.clip(pos, 0, cand.shape[1] - 1), axis=1)
        slots = jnp.where(valid, slots, -1)
        return dists, slots, valid
    return _chunked_rerank(state, q, cand, cand_valid, k, metric, power, chunk)


def brute_force(
    state: IndexState,
    q: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    power: float = 3.0,
    chunk: int = 8192,
    precision: str = "highest",
    approx: bool = False,
):
    """Exact top-k over the whole slab (test oracle and small-db fast path).

    Thin wrapper over the shared :func:`zebra_tpu.ops.scan.exact_scan` (also
    the IVF backend's exact path)."""
    from zebra_tpu.ops.scan import exact_scan

    return exact_scan(
        state.vectors, state.valid, q, k, metric=metric, power=power,
        chunk=chunk, precision=precision, approx=approx,
    )


@jax.jit
def num_valid(state: IndexState) -> jnp.ndarray:
    return jnp.sum(state.valid.astype(jnp.int32))
