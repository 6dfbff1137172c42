"""Mesh-sharded LSH index: SPMD inserts, collective top-k queries.

Design (SURVEY.md §2 "Parallelism & distributed strategies"): every shard owns
an independent slice of the database — its own bucket tables, hyperplanes and
vector-slab partition (the stacked state carries a leading ``[S, ...]`` axis
sharded over the mesh's ``"shard"`` axis). Inserts split the batch across
shards (pure data parallelism, the mesh analogue of the reference's rayon
work-stealing pool). Queries broadcast to all shards; each computes a local
top-k, then partial results merge with ``jax.lax.all_gather`` over ICI —
the device-mesh realisation of the reference's DashSet candidate union across
trees/threads (``src/database/index/lsh.rs:550-556``).

Global ids encode (shard, slot) as ``shard * slab_capacity + slot`` so merged
results map straight back to host ids.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import buckets as B
from zebra_tpu.index import ivf as V
from zebra_tpu.ops import hashing as H
from zebra_tpu.ops import kmeans as KM
from zebra_tpu.ops import topk as TK
from zebra_tpu.index.base import slab_from_np, slab_to_np
from zebra_tpu.index.lsh import _pack_results, _unpack_results
from zebra_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from zebra_tpu.utils import fsync_write, next_pow2, uuid7_batch

_MIN_SLAB = 2048
_MIN_BATCH = 256


def _grow_spare_sharded(state: "V.IVFState") -> "V.IVFState":
    """Double every shard's spare tail (stacked axis-1 pad, slots stable).

    NB: the stacked pytree's shape-derived properties see the leading [S]
    axis, so per-shard geometry comes from explicit leaf shapes here."""
    K = state.centroids.shape[1]
    per_shard = state.vectors.shape[1]
    g = max(per_shard - K * state.ccap, 1024)
    return state.replace(
        vectors=jnp.pad(state.vectors, ((0, 0), (0, g), (0, 0))),
        norms=jnp.pad(state.norms, ((0, 0), (0, g))),
        valid=jnp.pad(state.valid, ((0, 0), (0, g))),
    )


def _unstack(tree):
    return jax.tree.map(lambda a: a[0], tree)


def _restack(tree):
    return jax.tree.map(lambda a: a[None], tree)


@functools.partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
def _sharded_insert(mesh, state, x, n_valid):
    """x: [S, n, D] sharded; n_valid: [S] sharded -> (state', slots [S, n])."""

    def inner(state, x, nv):
        st, slots = B.insert(_unstack(state), x[0], nv[0])
        return _restack(st), slots[None]

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        check_vma=False,
    )(state, x, n_valid)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "metric", "num_probes", "chunk", "rerank", "max_candidates"),
)
def _sharded_query(mesh, state, q, k, metric, num_probes, power, chunk,
                   rerank="xla", max_candidates=0):
    """q: [B, D] replicated -> merged (dists, global_ids, valid), replicated.

    Per-shard approximate search + ICI all-gather merge of partial top-k.
    """

    def inner(state, q):
        st = _unstack(state)
        d, s, v = B.query(
            st, q, k, metric=metric, num_probes=num_probes, power=power,
            chunk=chunk, rerank=rerank, max_candidates=max_candidates,
        )
        shard = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
        gid = jnp.where(v, shard * st.slab_capacity + s, -1)
        # ICI collective: gather every shard's partial top-k, then reselect.
        d_all = jax.lax.all_gather(d, SHARD_AXIS)  # [S, B, k]
        g_all = jax.lax.all_gather(gid, SHARD_AXIS)
        v_all = jax.lax.all_gather(v, SHARD_AXIS)
        S = d_all.shape[0]
        Bq = q.shape[0]
        d_c = d_all.transpose(1, 0, 2).reshape(Bq, S * k)
        g_c = g_all.transpose(1, 0, 2).reshape(Bq, S * k)
        v_c = v_all.transpose(1, 0, 2).reshape(Bq, S * k)
        return TK.masked_topk(d_c, v_c, g_c, k)

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(state, q)


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "metric", "chunk", "precision", "approx")
)
def _sharded_brute_force(mesh, state, q, k, metric, power, chunk,
                         precision="highest", approx=False):
    def inner(state, q):
        st = _unstack(state)
        d, s, v = B.brute_force(st, q, k, metric=metric, power=power, chunk=chunk,
                                precision=precision, approx=approx)
        shard = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
        gid = jnp.where(v, shard * st.slab_capacity + s, -1)
        d_all = jax.lax.all_gather(d, SHARD_AXIS)
        g_all = jax.lax.all_gather(gid, SHARD_AXIS)
        v_all = jax.lax.all_gather(v, SHARD_AXIS)
        S = d_all.shape[0]
        Bq = q.shape[0]
        return TK.masked_topk(
            d_all.transpose(1, 0, 2).reshape(Bq, S * k),
            v_all.transpose(1, 0, 2).reshape(Bq, S * k),
            g_all.transpose(1, 0, 2).reshape(Bq, S * k),
            k,
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(state, q)


@functools.partial(
    jax.jit, static_argnames=("mesh", "spill", "metric"), donate_argnums=(1,)
)
def _sharded_insert_ivf(mesh, state, x, n_valid, spill, metric):
    """IVF variant: x [S, n, D] sharded -> (state', slots [S, n])."""

    def inner(state, x, nv):
        st, slots = V.insert(
            _unstack(state), x[0], nv[0], spill=spill, metric=metric
        )
        return _restack(st), slots[None]

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        check_vma=False,
    )(state, x, n_valid)


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "metric", "num_probes", "rerank")
)
def _sharded_query_ivf(mesh, state, q, k, metric, num_probes, power, rerank="xla"):
    """IVF variant: per-shard probe + re-rank, ICI all-gather top-k merge."""

    def inner(state, q):
        st = _unstack(state)
        d, s, v = V.query(
            st, q, k, metric=metric, num_probes=num_probes, power=power,
            rerank=rerank,
        )
        shard = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
        gid = jnp.where(v, shard * st.slab_capacity + s, -1)
        d_all = jax.lax.all_gather(d, SHARD_AXIS)
        g_all = jax.lax.all_gather(gid, SHARD_AXIS)
        v_all = jax.lax.all_gather(v, SHARD_AXIS)
        S = d_all.shape[0]
        Bq = q.shape[0]
        return TK.masked_topk(
            d_all.transpose(1, 0, 2).reshape(Bq, S * k),
            v_all.transpose(1, 0, 2).reshape(Bq, S * k),
            g_all.transpose(1, 0, 2).reshape(Bq, S * k),
            k,
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(state, q)


@functools.partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
def _sharded_delete(mesh, state, slots):
    """slots: [S, m] sharded (local slot ids, -1 = none)."""

    def inner(state, sl):
        return _restack(B.delete_slots(_unstack(state), sl[0]))

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=P(SHARD_AXIS),
        check_vma=False,
    )(state, slots)


class ShardedLSHIndex:
    """Drop-in LSHIndex with state partitioned over a device mesh."""

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        options: IndexOptions | None = None,
        metric_power: float = 3.0,
        shards: int | None = None,
        mesh=None,
    ):
        self.dim = int(dim)
        self.metric = metric
        self.metric_power = float(metric_power)
        self.options = options or IndexOptions()
        if self.options.rerank == "pallas":
            # the pallas kernels need aligned stored dims (IVF block kernel:
            # 128 lanes; LSH flat-slab kernel: 1024 f32 / 2048 bf16) and the
            # sharded state carries no dim padding (round-1 advisor finding)
            # — fail at construction, not at first query
            if self.options.index_type == "ivf":
                unit = 128
            else:
                unit = 2048 if self.options.dtype == "bfloat16" else 1024
            if self.dim % unit:
                raise ValueError(
                    f"sharded rerank='pallas' needs dim % {unit} == 0 "
                    f"(got {self.dim}); use rerank='xla' or pad the embeddings"
                )
        self.mesh = mesh if mesh is not None else make_mesh(shards)
        self.shards = self.mesh.shape[SHARD_AXIS]
        #: backend: IVF cluster blocks or LSH bucket tables, per options
        self._ivf = self.options.index_type == "ivf"
        self.state = None  # stacked IndexState/IVFState with leading [S, ...]
        #: per-shard slot -> id
        self._slot_ids: list[list[bytes]] = [[] for _ in range(self.shards)]
        #: id -> (shard, slot)
        self._id_to_loc: dict[bytes, tuple[int, int]] = {}
        self._built_n = 0
        #: host mirrors of per-shard next_slot (bump allocators) — avoids
        #: device->host readbacks on the insert path
        self._next_slots: list[int] = [0] * self.shards
        self._rng = np.random.default_rng(self.options.seed)

    # -- introspection -------------------------------------------------------

    def __len__(self) -> int:
        return len(self._id_to_loc)

    def __contains__(self, doc_id: bytes) -> bool:
        return doc_id in self._id_to_loc

    def no_vectors(self) -> bool:
        return not self._id_to_loc

    def is_empty(self) -> bool:
        return self.no_vectors() or self.state is None

    @property
    def dtype(self):
        return jnp.bfloat16 if self.options.dtype == "bfloat16" else jnp.float32

    @property
    def _cell_metric(self) -> str:
        """IVF cell-selection metric — must match query's sel_metric."""
        from zebra_tpu.ops import distances as D

        return self.metric if self.metric in D.MXU_METRICS else "sql2"

    @property
    def slab_capacity(self) -> int:
        return self.state.vectors.shape[1] if self.state is not None else 0

    # -- state construction --------------------------------------------------

    def _state_sharding(self):
        return NamedSharding(self.mesh, P(SHARD_AXIS))

    def _put(self, stacked: B.IndexState) -> B.IndexState:
        sh = self._state_sharding()
        return jax.tree.map(lambda a: jax.device_put(a, sh), stacked)

    def _fresh_state(self, per_shard_hint: int, datas: list[np.ndarray] | None):
        if self._ivf:
            return self._fresh_state_ivf(per_shard_hint, datas)
        bits = self.options.resolved_bits(per_shard_hint)
        cap = self.options.resolved_bucket_capacity()
        slab = next_pow2(max(self.options.slab_capacity // max(self.shards, 1), 2 * per_shard_hint, _MIN_SLAB))
        states = []
        for s in range(self.shards):
            key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
            data = datas[s] if datas is not None else None
            if self.options.plane_mode == "data" and data is not None and data.shape[0] >= 2:
                planes, consts = H.sample_planes_data(
                    key, self.options.num_tables, bits, jnp.asarray(data, jnp.float32)
                )
            else:
                planes, consts = H.sample_planes_random(
                    key, self.options.num_tables, bits, self.dim
                )
            states.append(B.empty_state(planes, consts, cap, slab, dtype=self.dtype))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return self._put(stacked)

    def _fresh_state_ivf(self, per_shard_hint: int, datas: list[np.ndarray] | None):
        """Per-shard IVF states: each shard trains its own centroids on its
        data split, then the stacked pytree shards over the mesh."""
        from zebra_tpu.index.ivf_host import (
            resolved_capacity, resolved_clusters, resolved_spare,
        )

        n = max(per_shard_hint, 1)
        K = resolved_clusters(self.options, n)
        C = resolved_capacity(self.options, n, K)
        G = resolved_spare(self.options, n)
        states = []
        for s in range(self.shards):
            key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
            data = datas[s] if datas is not None else None
            if data is not None and data.shape[0] >= 2:
                sample_n = min(
                    data.shape[0], max(self.options.kmeans_sample, 4 * K)
                )
                sub = np.asarray(data, np.float32)
                if sample_n < sub.shape[0]:
                    pick = np.sort(
                        self._rng.choice(sub.shape[0], sample_n, replace=False)
                    )
                    sub = sub[pick]
                padded = next_pow2(sub.shape[0])
                if padded != sub.shape[0]:
                    sub = np.pad(sub, ((0, padded - sub.shape[0]), (0, 0)))
                cents, _ = KM.kmeans(
                    key, jnp.asarray(sub), jnp.int32(sample_n), k=K,
                    iters=self.options.kmeans_iters,
                    balance_rounds=self.options.kmeans_balance_rounds,
                )
            else:
                cents = jax.random.normal(key, (K, self.dim), dtype=jnp.float32)
            states.append(V.empty_state(cents, C, G, dtype=self.dtype))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return self._put(stacked)

    # -- insert --------------------------------------------------------------

    def add(self, vectors: np.ndarray, ids: list[bytes] | None = None) -> list[bytes]:
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vectors.shape[-1]}")
        n = vectors.shape[0]
        if n == 0:
            return []
        if ids is None:
            ids = uuid7_batch(n)

        # contiguous split across shards (data parallelism)
        splits = np.array_split(np.arange(n), self.shards)
        if self.state is None:
            datas = [vectors[s] for s in splits]
            self.state = self._fresh_state(max(len(s) for s in splits), datas)
            self._built_n = n
            self._next_slots = [0] * self.shards
        per = max(len(s) for s in splits)
        if not self._ivf:  # IVF places by cluster; the spare absorbs overflow
            last = per % 65536 or per
            pad_tail = next_pow2(max(min(last, 65536), _MIN_BATCH)) - min(last, 65536)
            self._ensure_slab(per + pad_tail)
        self._insert_split(vectors, ids, splits)
        self._maybe_rebuild()
        return ids

    def _ensure_slab(self, per_shard_incoming: int) -> None:
        st = self.state
        used = max(self._next_slots)
        need = used + per_shard_incoming
        cap = st.vectors.shape[1]
        if need <= cap:
            return
        new_cap = next_pow2(max(2 * cap, need))
        S = self.shards
        vectors = (
            jnp.zeros((S, new_cap, self.dim), st.vectors.dtype).at[:, :cap].set(st.vectors)
        )
        norms = jnp.zeros((S, new_cap), jnp.float32).at[:, :cap].set(st.norms)
        valid = jnp.zeros((S, new_cap), jnp.bool_).at[:, :cap].set(st.valid)
        self.state = self._put(st.replace(vectors=vectors, norms=norms, valid=valid))

    def _insert_split(self, vectors, ids, splits) -> None:
        max_n = max(len(s) for s in splits)
        start = 0
        while start < max_n:
            count = min(max_n - start, 65536)
            padded = next_pow2(max(count, _MIN_BATCH))
            batch = np.zeros((self.shards, padded, self.dim), np.float32)
            nv = np.zeros((self.shards,), np.int32)
            for s, idxs in enumerate(splits):
                part = idxs[start : start + count]
                batch[s, : len(part)] = vectors[part]
                nv[s] = len(part)
            if self._ivf:
                self._insert_split_ivf(vectors, ids, splits, batch, nv, start, count)
            else:
                self.state, _slots = _sharded_insert(
                    self.mesh, self.state, jnp.asarray(batch), jnp.asarray(nv)
                )
                # per-shard bump allocation mirrored host-side (no readback)
                for s, idxs in enumerate(splits):
                    part = idxs[start : start + count]
                    base = self._next_slots[s]
                    self._register(s, [ids[i] for i in part],
                                   np.arange(base, base + len(part)))
                    self._next_slots[s] = base + len(part)
            start += count

    def _insert_split_ivf(self, vectors, ids, splits, batch, nv, start, count) -> None:
        """IVF shard insert: data-dependent slots read back per batch; rows
        whose spare filled retry after a stacked spare growth."""
        pending = [idxs[start : start + count] for idxs in splits]
        cur_batch, cur_nv = batch, nv
        for _ in range(8):
            self.state, slots_dev = _sharded_insert_ivf(
                self.mesh, self.state, jnp.asarray(cur_batch), jnp.asarray(cur_nv),
                self.options.spill, self._cell_metric,
            )
            slots = np.asarray(slots_dev)  # [S, padded]
            new_pending = []
            for s, part in enumerate(pending):
                sl = slots[s, : len(part)].astype(np.int64)
                ok = sl >= 0
                if ok.any():
                    self._register(s, [ids[i] for i in part[ok]], sl[ok])
                new_pending.append(part[~ok])
            pending = new_pending
            if not any(len(p) for p in pending):
                return
            self.state = _grow_spare_sharded(self.state)
            padded = next_pow2(max(max(len(p) for p in pending), _MIN_BATCH))
            cur_batch = np.zeros((self.shards, padded, self.dim), np.float32)
            cur_nv = np.zeros((self.shards,), np.int32)
            for s, p in enumerate(pending):
                cur_batch[s, : len(p)] = vectors[p]
                cur_nv[s] = len(p)
        raise RuntimeError("sharded ivf insert could not place batch")

    def _register(self, shard: int, ids: list[bytes], slots: np.ndarray) -> None:
        table = self._slot_ids[shard]
        top = int(slots.max()) + 1 if len(slots) else 0
        if top > len(table):
            table.extend(b"" for _ in range(top - len(table)))
        for i, sl in zip(ids, slots.tolist()):
            table[sl] = i
            self._id_to_loc[i] = (shard, sl)

    # -- rebuild -------------------------------------------------------------

    def _maybe_rebuild(self) -> None:
        st = self.state
        n_live = len(self._id_to_loc)
        if n_live == 0:
            return
        if self._ivf:
            counts = np.asarray(st.counts)  # [S, K+1] readback
            used = int(counts.sum())
            spare_cap = st.vectors.shape[1] - st.centroids.shape[1] * st.ccap
            spare_pressure = counts[:, -1].max() > 0.75 * max(spare_cap, 1)
            if (
                n_live > 4.0 * max(self._built_n, 1)
                or (used - n_live) > 0.5 * max(used, 1)
                or spare_pressure
            ):
                self.rebuild()
            return
        overflow = int(np.sum(np.asarray(st.overflow)))  # [S] readback
        used = sum(self._next_slots)
        tombstones = used - n_live
        # see LSHIndex._maybe_rebuild: overflow only warrants a rebuild when
        # wider codes would help, else clustered data causes rebuild loops
        overflow_fixable = (
            self.options.index_type != "flat"
            and overflow > 0.02 * n_live
            and self.options.resolved_bits(max(1, n_live // self.shards))
            > self.state.planes.shape[2]
        )
        if (
            n_live > 4.0 * max(self._built_n, 1)
            or overflow_fixable
            or tombstones > 0.5 * max(used, 1)
        ):
            self.rebuild()

    def rebuild(self) -> None:
        """Global re-shard + re-hash of all live vectors (also compacts)."""
        vec_np = np.asarray(self.state.vectors, dtype=np.float32)
        items = sorted(self._id_to_loc.items(), key=lambda kv: kv[1])
        ids = [i for i, _ in items]
        data = (
            np.stack([vec_np[s, sl] for _, (s, sl) in items])
            if items
            else np.zeros((0, self.dim), np.float32)
        )
        n = len(ids)
        splits = np.array_split(np.arange(n), self.shards)
        datas = [data[s] for s in splits] if n else None
        self.state = self._fresh_state(max((len(s) for s in splits), default=1), datas)
        self._built_n = max(n, 1)
        self._slot_ids = [[] for _ in range(self.shards)]
        self._id_to_loc = {}
        self._next_slots = [0] * self.shards
        if n:
            self._insert_split(data, ids, splits)

    # -- delete / dedup / clear ----------------------------------------------

    def remove(self, ids: list[bytes]) -> list[bytes]:
        if self.state is None:
            return []
        per_shard: list[list[int]] = [[] for _ in range(self.shards)]
        removed = []
        for i in ids:
            loc = self._id_to_loc.pop(i, None)
            if loc is not None:
                s, sl = loc
                per_shard[s].append(sl)
                self._slot_ids[s][sl] = b""
                removed.append(i)
        if removed:
            m = next_pow2(max(max(len(p) for p in per_shard), 8))
            arr = np.full((self.shards, m), -1, np.int32)
            for s, p in enumerate(per_shard):
                arr[s, : len(p)] = p
            self.state = _sharded_delete(self.mesh, self.state, jnp.asarray(arr))
            self._maybe_rebuild()
        return removed

    def deduplicate(self) -> list[bytes]:
        return self.remove(self.find_duplicates())

    def find_duplicates(self) -> list[bytes]:
        if not self._id_to_loc:
            return []
        vec_np = np.asarray(self.state.vectors, dtype=np.float32)
        items = sorted(self._id_to_loc.items(), key=lambda kv: kv[1])
        data = np.stack([vec_np[s, sl] for _, (s, sl) in items])
        view = np.ascontiguousarray(data).view(np.uint32).reshape(len(items), -1)
        _, first_idx = np.unique(view, axis=0, return_index=True)
        keep = np.zeros(len(items), dtype=bool)
        keep[first_idx] = True
        return [items[j][0] for j in np.nonzero(~keep)[0]]

    def clear(self) -> None:
        self.state = None
        self._slot_ids = [[] for _ in range(self.shards)]
        self._id_to_loc = {}
        self._built_n = 0
        self._next_slots = [0] * self.shards

    # -- search --------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int, exact: bool = False):
        if self.state is None or not self._id_to_loc:
            q = np.asarray(queries)
            nq = 1 if q.ndim == 1 else q.shape[0]
            return [[] for _ in range(nq)]
        dists, gids, valid = self.search_arrays(queries, k, exact=exact)
        cap = self.slab_capacity
        out = []
        for b in range(dists.shape[0]):
            row = []
            for j in range(dists.shape[1]):
                if valid[b, j]:
                    g = int(gids[b, j])
                    row.append((self._slot_ids[g // cap][g % cap], float(dists[b, j])))
            out.append(row)
        return out

    def search_arrays(self, queries: np.ndarray, k: int, exact: bool = False):
        if self.options.index_type == "flat":
            exact = True
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        padded = next_pow2(max(nq, 8))
        qp = np.zeros((padded, self.dim), np.float32)
        qp[:nq] = q
        qj = jnp.asarray(qp)
        rerank = self.options.rerank
        if rerank == "pallas" and jax.default_backend() == "cpu":
            rerank = "xla"  # Mosaic kernels need a real TPU; same results
        if exact:
            d, g, v = _sharded_brute_force(
                self.mesh, self.state, qj, k, self.metric, self.metric_power,
                65536 if self.options.approx_topk else 8192,
                precision=self.options.exact_precision,
                approx=self.options.approx_topk,
            )
        elif self._ivf:
            d, g, v = _sharded_query_ivf(
                self.mesh, self.state, qj, k, self.metric,
                self.options.resolved_probes(), self.metric_power,
                rerank=rerank,
            )
        else:
            d, g, v = _sharded_query(
                self.mesh,
                self.state,
                qj,
                k,
                self.metric,
                self.options.resolved_probes(),
                self.metric_power,
                2048,
                rerank=rerank,
                max_candidates=self.options.max_candidates,
            )
        return _unpack_results(np.asarray(_pack_results(d, g, v)), nq, k)

    # -- persistence ---------------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        meta = {
            "dim": self.dim,
            "metric": self.metric,
            "metric_power": self.metric_power,
            "options": self.options.to_json(),
            "built_n": self._built_n,
            "shards": self.shards,
            "sharded": True,
            "has_state": self.state is not None,
        }
        fsync_write(os.path.join(directory, "index.json"), json.dumps(meta).encode())
        if self.state is None:
            return
        cap = self.slab_capacity
        ids_arr = np.zeros((self.shards, cap, 16), dtype=np.uint8)
        for s, table in enumerate(self._slot_ids):
            for sl, i in enumerate(table):
                if i:
                    ids_arr[s, sl] = np.frombuffer(i, dtype=np.uint8)
        import io

        buf = io.BytesIO()
        if self._ivf:
            np.savez(
                buf,
                centroids=np.asarray(self.state.centroids),
                counts=np.asarray(self.state.counts),
                vectors=slab_to_np(self.state.vectors),
                norms=np.asarray(self.state.norms),
                valid=np.asarray(self.state.valid),
                overflow=np.asarray(self.state.overflow),
                ccap=np.asarray(self.state.ccap, dtype=np.int32),
                slot_ids=ids_arr,
            )
        else:
            np.savez(
                buf,
                planes=np.asarray(self.state.planes),
                consts=np.asarray(self.state.consts),
                buckets=np.asarray(self.state.buckets),
                counts=np.asarray(self.state.counts),
                vectors=slab_to_np(self.state.vectors),
                norms=np.asarray(self.state.norms),
                valid=np.asarray(self.state.valid),
                next_slot=np.asarray(self.state.next_slot),
                overflow=np.asarray(self.state.overflow),
                slot_ids=ids_arr,
            )
        fsync_write(os.path.join(directory, "arrays.npz"), buf.getvalue())

    @classmethod
    def load(cls, directory: str, mesh=None, shards: int | None = None) -> "ShardedLSHIndex":
        """Open a snapshot. When the target mesh size differs from the saved
        shard count (fewer chips on the new host, or an explicit ``shards``/
        ``mesh``), live vectors re-shard: the snapshot is already host-side
        bytes, so resharding costs one re-add — no device readback."""
        with open(os.path.join(directory, "index.json"), "rb") as f:
            meta = json.loads(f.read())
        options = IndexOptions.from_json(meta["options"])
        saved_shards = meta["shards"]
        if mesh is not None:
            target = mesh.shape[SHARD_AXIS]
        elif shards is not None:
            target = shards
        else:
            target = min(saved_shards, len(jax.devices()))
        if target != saved_shards and meta.get("has_state"):
            return cls._load_resharded(directory, meta, options, mesh, target)
        idx = cls(
            dim=meta["dim"],
            metric=meta["metric"],
            options=options,
            metric_power=meta.get("metric_power", 3.0),
            shards=target,
            mesh=mesh,
        )
        idx._built_n = meta.get("built_n", 0)
        if not meta.get("has_state"):
            return idx
        with np.load(os.path.join(directory, "arrays.npz")) as z:
            if idx._ivf:
                stacked = V.IVFState(
                    centroids=jnp.asarray(z["centroids"]),
                    counts=jnp.asarray(z["counts"]),
                    vectors=slab_from_np(z["vectors"], idx.dtype),
                    norms=jnp.asarray(z["norms"]),
                    valid=jnp.asarray(z["valid"]),
                    overflow=jnp.asarray(z["overflow"]),
                    ccap=int(z["ccap"]),
                )
            else:
                stacked = B.IndexState(
                    planes=jnp.asarray(z["planes"]),
                    consts=jnp.asarray(z["consts"]),
                    buckets=jnp.asarray(z["buckets"]),
                    counts=jnp.asarray(z["counts"]),
                    vectors=slab_from_np(z["vectors"], idx.dtype),
                    norms=jnp.asarray(z["norms"]),
                    valid=jnp.asarray(z["valid"]),
                    next_slot=jnp.asarray(z["next_slot"]),
                    overflow=jnp.asarray(z["overflow"]),
                )
            ids_arr = z["slot_ids"]
        idx.state = idx._put(stacked)
        valid = np.asarray(stacked.valid)
        for s in range(idx.shards):
            table = []
            for sl in range(ids_arr.shape[1]):
                raw = ids_arr[s, sl].tobytes()
                table.append(b"" if raw == b"\x00" * 16 else raw)
            idx._slot_ids[s] = table
            for sl, i in enumerate(table):
                if i and valid[s, sl]:
                    idx._id_to_loc[i] = (s, sl)
        if not idx._ivf:
            idx._next_slots = [int(v) for v in np.asarray(stacked.next_slot)]
        return idx

    @classmethod
    def _load_resharded(cls, directory, meta, options, mesh, target):
        """Rebuild the index over a different mesh size from snapshot bytes:
        collect live (id, vector) pairs in (shard, slot) order and re-add."""
        with np.load(os.path.join(directory, "arrays.npz")) as z:
            vectors = z["vectors"]  # [S_old, cap, D]
            valid = z["valid"]
            ids_arr = z["slot_ids"]
        live_ids: list[bytes] = []
        rows = []
        for s in range(vectors.shape[0]):
            for sl in range(vectors.shape[1]):
                raw = ids_arr[s, sl].tobytes()
                if raw != b"\x00" * 16 and valid[s, sl]:
                    live_ids.append(raw)
                    rows.append(vectors[s, sl])
        idx = cls(
            dim=meta["dim"],
            metric=meta["metric"],
            options=options,
            metric_power=meta.get("metric_power", 3.0),
            shards=target,
            mesh=mesh,
        )
        if live_ids:
            idx.add(np.stack(rows), ids=live_ids)
        return idx

    def stats(self) -> dict:
        if self.state is None:
            return {"vectors": 0, "built": False, "shards": self.shards}
        st = self.state
        if self._ivf:
            counts = np.asarray(st.counts)
            return {
                "vectors": len(self._id_to_loc),
                "built": True,
                "shards": self.shards,
                "clusters_per_shard": st.centroids.shape[1],
                "cluster_capacity": int(st.ccap),
                "slab_capacity_per_shard": st.vectors.shape[1],
                "used_slots": int(counts.sum()),
                "spare_used": int(counts[:, -1].sum()),
                "max_cluster_load": int(counts[:, :-1].max()),
                "overflow": int(np.sum(np.asarray(st.overflow))),
            }
        return {
            "vectors": len(self._id_to_loc),
            "built": True,
            "shards": self.shards,
            "tables": st.buckets.shape[1],
            "bits": st.planes.shape[2],
            "bucket_capacity": st.buckets.shape[3],
            "slab_capacity_per_shard": st.vectors.shape[1],
            "used_slots": sum(self._next_slots),
            "overflow": int(np.sum(np.asarray(st.overflow))),
        }
