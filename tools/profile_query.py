"""Break down query-path cost on the real TPU (dev tool, not shipped API).

Builds a mid-size index, then times each stage of the query pipeline
separately: hash, bucket gather, dedup sort, gather+distance re-rank, top-k.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import enable_compile_cache
enable_compile_cache()
from zebra_tpu.config import IndexOptions
from zebra_tpu.index import buckets as B
from zebra_tpu.index.lsh import LSHIndex
from zebra_tpu.ops import hashing as H
from zebra_tpu.ops import topk as TK
from bench import make_data


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.3f} ms")
    return out


def main():
    n, dim, Bq, k, probes = 200_000, 768, 256, 10, 8
    data = make_data(n, dim, seed=0)
    idx = LSHIndex(dim=dim, metric="cosine", options=IndexOptions(num_tables=15, num_probes=probes, seed=0))
    t0 = time.perf_counter()
    idx.add(data)
    jax.block_until_ready(idx.state.buckets)
    print(f"build {n}: {time.perf_counter() - t0:.1f}s  stats={idx.stats()}")
    st = idx.state

    rng = np.random.default_rng(1)
    q = jnp.asarray(data[rng.permutation(n)[:Bq]] + 0.05 * rng.standard_normal((Bq, dim)).astype(np.float32))

    # full query
    timeit("full query", lambda: B.query(st, q, k, metric="cosine", num_probes=probes))

    # stage 1: hash + multiprobe
    hash_fn = jax.jit(lambda qq: H.multiprobe(H.hash_activations(qq, st.planes, st.consts), probes))
    probes_arr = timeit("hash + multiprobe", hash_fn, q)

    # stage 2: bucket gather
    T = st.num_tables

    @jax.jit
    def gather(pr):
        t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]
        return st.buckets[t_idx, pr].reshape(Bq, -1)

    cand = timeit("bucket gather", gather, probes_arr)
    M = cand.shape[1]
    print(f"  candidates per query: {M}")

    # stage 3: dedup sort
    @jax.jit
    def dedup(c):
        c = jnp.sort(c, axis=1)
        dup = jnp.concatenate([jnp.zeros((Bq, 1), jnp.bool_), c[:, 1:] == c[:, :-1]], axis=1)
        in_slab = (c >= 0) & (c < st.slab_capacity)
        live = st.valid[jnp.clip(c, 0, st.slab_capacity - 1)]
        return c, in_slab & live & ~dup

    cand_s, valid_s = timeit("dedup sort + masks", dedup, cand)

    # stage 4: rerank (gather + distance + chunked topk)
    @jax.jit
    def rerank(c, v):
        return B._chunked_rerank(st, q, c, v, k, "cosine", 3.0, 2048)

    timeit("rerank (gather+dist+topk)", rerank, cand_s, valid_s)

    # stage 4b: rerank without chunk scan (single big chunk)
    @jax.jit
    def rerank_big(c, v):
        return B._chunked_rerank(st, q, c, v, k, "cosine", 3.0, 4096)

    timeit("rerank chunk=4096", rerank_big, cand_s, valid_s)

    # stage 5: pure gather of candidate vectors (bandwidth floor)
    @jax.jit
    def pure_gather(c):
        vecs = st.vectors[jnp.clip(c, 0, st.slab_capacity - 1)]
        return jnp.sum(vecs, axis=(1, 2))  # force materialization

    timeit("pure candidate gather+sum", pure_gather, cand_s)

    # stage 6: dot-only rerank (no norms combine, no topk)
    @jax.jit
    def dots_only(c):
        idxs = jnp.clip(c, 0, st.slab_capacity - 1)
        vecs = st.vectors[idxs]
        return jnp.einsum("bd,bcd->bc", q, vecs, preferred_element_type=jnp.float32)

    timeit("gather + dots (default prec)", dots_only, cand_s)

    @jax.jit
    def dots_hi(c):
        idxs = jnp.clip(c, 0, st.slab_capacity - 1)
        vecs = st.vectors[idxs]
        return jnp.einsum("bd,bcd->bc", q, vecs, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    timeit("gather + dots (HIGHEST prec)", dots_hi, cand_s)

    # stage 7: final topk alone
    dists = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (Bq, M)))
    topk_fn = jax.jit(lambda d: TK.masked_topk(d, valid_s, cand_s, k))
    timeit("masked_topk on [B, M]", topk_fn, dists)


if __name__ == "__main__":
    main()
