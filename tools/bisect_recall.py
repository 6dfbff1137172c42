"""Bisect the TPU recall/insert regression: toggle insert-path features.

Usage: python tools/bisect_recall.py [nohints] [scatter_slab]
  nohints       - drop unique/sorted scatter hints in bucket append
  scatter_slab  - use .at[slots].set scatter instead of dynamic_update_slice
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zebra_tpu.utils import enable_compile_cache

enable_compile_cache()

import zebra_tpu.index.buckets as BK

flags = set(sys.argv[1:])

if "nohints" in flags:  # stale variant — hints already removed in mainline
    def _append_one_table(bucket_t, count_t, code_t, slots):
        n = code_t.shape[0]
        R, C = bucket_t.shape
        order = jnp.argsort(code_t)
        c = code_t[order]
        s = slots[order]
        ar = jnp.arange(n, dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), c[1:] != c[:-1]])
        start_pos = jnp.where(is_start, ar, jnp.int32(0))
        seg_start = jax.lax.associative_scan(jnp.maximum, start_pos)
        rank = ar - seg_start
        base = count_t[jnp.clip(c, 0, R - 1)]
        pos = base + rank
        in_row = c < R
        new_bucket = bucket_t.at[c, pos].set(s, mode="drop")
        ok = in_row & (pos < C)
        new_count = count_t.at[c].add(ok.astype(jnp.int32), mode="drop")
        overflow = jnp.sum((in_row & (pos >= C)).astype(jnp.int32))
        return new_bucket, new_count, overflow

    BK._append_one_table = _append_one_table

if "scatter_slab" in flags:
    import functools
    from zebra_tpu.ops import hashing as H

    @functools.partial(jax.jit, donate_argnums=(0,))
    def insert(state, x, n_valid):
        n = x.shape[0]
        ar = jnp.arange(n, dtype=jnp.int32)
        real = ar < n_valid
        slots = jnp.where(real, state.next_slot + ar, BK.OOB)
        xd = x.astype(state.vectors.dtype)
        vectors = state.vectors.at[slots].set(xd, mode="drop")
        x32 = x.astype(jnp.float32)
        norms = state.norms.at[slots].set(jnp.sum(x32 * x32, axis=-1), mode="drop")
        valid = state.valid.at[slots].set(True, mode="drop")
        codes = H.hash_codes(x, state.planes, state.consts)
        codes = jnp.where(real[:, None], codes, BK.OOB)
        buckets, counts, ovf = jax.vmap(BK._append_one_table, in_axes=(0, 0, 1, None))(
            state.buckets, state.counts, codes, slots
        )
        return (
            state.replace(
                buckets=buckets, counts=counts, vectors=vectors, norms=norms,
                valid=valid,
                next_slot=state.next_slot + n_valid.astype(jnp.int32),
                overflow=state.overflow + jnp.sum(ovf),
            ),
            slots,
        )

    BK.insert = insert

from zebra_tpu.config import IndexOptions
from zebra_tpu.index.lsh import LSHIndex
from bench import make_data

n, dim, nq, k = 50_000, 768, 256, 10
data = make_data(n, dim, seed=0)
rng = np.random.default_rng(1)
q = data[rng.permutation(n)[:nq]] + 0.05 * rng.standard_normal((nq, dim)).astype(np.float32)

idx = LSHIndex(dim=dim, metric="cosine", options=IndexOptions(num_tables=15, num_probes=8, seed=0))
t0 = time.perf_counter()
idx.add(data)
jax.block_until_ready(idx.state.buckets)
print(f"build: {time.perf_counter()-t0:.1f}s  stats={idx.stats()}", flush=True)

dt_, st_, vt_ = idx.search_arrays(q, k, exact=True)
truth = [set(st_[b][vt_[b]].tolist()) for b in range(nq)]
d, s, v = idx.search_arrays(q, k)
hits = sum(len(set(s[b][v[b]].tolist()) & truth[b]) for b in range(nq))
print(f"flags={sorted(flags)} recall@{k} = {hits/(nq*k):.4f}", flush=True)

inc = data[:32768]
idx.add(inc)  # warm the shape
jax.block_until_ready(idx.state.buckets)
t0 = time.perf_counter()
idx.add(inc)
jax.block_until_ready(idx.state.buckets)
print(f"warm insert: {32768/(time.perf_counter()-t0):,.0f}/s", flush=True)
