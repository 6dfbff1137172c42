"""Profile IVF k-means training stages on the TPU.

Round-4: ivf.train is 100.8s of the 123.3s default-tier cold build
(r4_ann_defaults.json build_stages) — the dominant cost is no longer the
wire. This decomposes one training run (K=16384, N=262144, D=768, the
1M-flagship sizing) into its stages to find the lever:

  assign   — the [chunk,K] distance matmul + argmin only
  scatter  — assignment + the .at[a].add segment-sum (shipped lloyd body)
  onehot   — assignment + one-hot matmul segment-sum (MXU alternative)
  full     — the shipped kmeans() (iters=8, balance_rounds=6 -> 20 lloyds)

Run serially (one TPU job at a time):
  nohup python -u tools/profile_kmeans.py > /tmp/prof_kmeans.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

K = 16384
N = 262144
D = 768
CHUNK = 65536


def timeit(fn, *args, reps=3):
    out = fn(*args)
    device_sync(out if isinstance(out, jnp.ndarray) else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out if isinstance(out, jnp.ndarray) else out[0])
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_only(data, cents, chunk=CHUNK):
    cn2 = jnp.sum(cents * cents, axis=-1)
    dchunks = data.reshape(-1, chunk, data.shape[-1])

    def body(_, xc):
        xc = xc.astype(jnp.float32)
        dot = jnp.dot(xc, cents.T, preferred_element_type=jnp.float32)
        a = jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)
        return 0, a

    _, a = jax.lax.scan(body, 0, dchunks)
    return a.reshape(-1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def lloyd_scatter(data, cents, chunk=CHUNK):
    k, dim = cents.shape
    cn2 = jnp.sum(cents * cents, axis=-1)
    dchunks = data.reshape(-1, chunk, dim)

    def body(acc, xc):
        sums, counts = acc
        xc = xc.astype(jnp.float32)
        dot = jnp.dot(xc, cents.T, preferred_element_type=jnp.float32)
        a = jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)
        sums = sums.at[a].add(xc, mode="drop")
        counts = counts.at[a].add(1, mode="drop")
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body, (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.int32)), dchunks
    )
    return sums / jnp.maximum(counts, 1)[:, None], counts


@functools.partial(jax.jit, static_argnames=("chunk",))
def lloyd_onehot(data, cents, chunk=CHUNK):
    k, dim = cents.shape
    cn2 = jnp.sum(cents * cents, axis=-1)
    dchunks = data.reshape(-1, chunk, dim)
    col = jnp.arange(k, dtype=jnp.int32)

    def body(acc, xc):
        sums, counts = acc
        xcf = xc.astype(jnp.float32)
        dot = jnp.dot(xcf, cents.T, preferred_element_type=jnp.float32)
        a = jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)
        # one-hot segment sum on the MXU: E [chunk,K] bf16, sums += E.T @ x
        e = (a[:, None] == col[None, :]).astype(jnp.bfloat16)
        sums = sums + jnp.dot(e.T, xcf.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(e, axis=0).astype(jnp.int32)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body, (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.int32)), dchunks
    )
    return sums / jnp.maximum(counts, 1)[:, None], counts


def main():
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (N, D), dtype=jnp.float32).astype(jnp.bfloat16)
    cents = jax.random.normal(jax.random.PRNGKey(1), (K, D), dtype=jnp.float32)
    device_sync(data)

    res = {}
    res["assign_s"] = timeit(assign_only, data, cents)
    print("assign only:", res["assign_s"], flush=True)
    res["lloyd_scatter_s"] = timeit(lloyd_scatter, data, cents)
    print("lloyd scatter:", res["lloyd_scatter_s"], flush=True)
    res["lloyd_onehot_s"] = timeit(lloyd_onehot, data, cents)
    print("lloyd onehot:", res["lloyd_onehot_s"], flush=True)

    from zebra_tpu.ops.kmeans import kmeans

    t0 = time.perf_counter()
    c, cnt = kmeans(jax.random.PRNGKey(2), data, jnp.int32(N), k=K,
                    iters=8, chunk=CHUNK, balance_rounds=6)
    device_sync(c)
    res["full_kmeans_s"] = time.perf_counter() - t0
    print("full shipped kmeans (incl compile):", res["full_kmeans_s"], flush=True)
    # flops per lloyd: assign matmul
    res["assign_tflop"] = 2 * N * K * D / 1e12
    res["assign_tflops_eff"] = res["assign_tflop"] / res["assign_s"]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
