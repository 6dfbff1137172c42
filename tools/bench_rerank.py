"""Compare XLA vs Pallas re-rank on the real TPU + stage breakdown."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zebra_tpu.utils import enable_compile_cache
enable_compile_cache()
from zebra_tpu.config import IndexOptions
from zebra_tpu.index.lsh import LSHIndex
from zebra_tpu.index import buckets as B
from zebra_tpu.ops import hashing as H


def bench(name, fn, iters=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:9.3f} ms", flush=True)
    return out, dt


def main():
    n, dim, Bq, k, probes = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000, 768, 256, 10, 8
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((max(64, n // 100), dim)).astype(np.float32)
    data = (centers[rng.integers(0, len(centers), n)] + 0.15 * rng.standard_normal((n, dim))).astype(np.float32)
    idx = LSHIndex(dim=dim, metric="cosine", options=IndexOptions(num_tables=15, num_probes=probes, seed=0))
    t0 = time.perf_counter()
    idx.add(data)
    jax.block_until_ready(idx.state.buckets)
    print(f"build {n}: {time.perf_counter()-t0:.1f}s  {idx.stats()}", flush=True)
    st = idx.state
    q = jnp.asarray(data[rng.permutation(n)[:Bq]] + 0.05 * rng.standard_normal((Bq, dim)).astype(np.float32))

    (d1, s1, v1), t_x = bench("query rerank=xla", lambda: B.query(st, q, k, metric="cosine", num_probes=probes, rerank="xla"))
    (d2, s2, v2), t_p = bench("query rerank=pallas", lambda: B.query(st, q, k, metric="cosine", num_probes=probes, rerank="pallas"))
    print(f"XLA    QPS: {Bq/t_x:,.0f}")
    print(f"Pallas QPS: {Bq/t_p:,.0f}")

    s1n, v1n, s2n, v2n = map(np.asarray, (s1, v1, s2, v2))
    agree = np.mean([
        len(set(s1n[i][v1n[i]]) & set(s2n[i][v2n[i]])) / max(v1n[i].sum(), 1)
        for i in range(Bq)
    ])
    print(f"slot agreement: {agree:.4f}")

    # stage breakdown
    hash_fn = jax.jit(lambda qq: H.multiprobe(H.hash_activations(qq, st.planes, st.consts), probes))
    bench("  hash+multiprobe", lambda: hash_fn(q))
    cand_fn = jax.jit(lambda qq: B._candidates(st, qq, probes))
    (cand, cvalid), _ = bench("  candidates (hash+gather+dedup)", lambda: cand_fn(q))
    print(f"  candidate count: {cand.shape[1]}")
    rer = jax.jit(lambda c, v: B._chunked_rerank(st, q, c, v, k, "cosine", 3.0, 2048))
    bench("  xla rerank only", lambda: rer(cand, cvalid))

    # incremental insert rate (warm)
    inc = data[:65536] if n >= 65536 else data
    def do_insert():
        ids = idx.add(inc)
        return idx.state.next_slot
    _, t_i = bench("incremental add 65536", do_insert, iters=3)
    print(f"warm insert rate: {len(inc)/t_i:,.0f} vectors/sec")


if __name__ == "__main__":
    main()
