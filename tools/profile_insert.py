"""Dissect IVF insert cost at bench shapes: matmul, top-k, ranks, scatter, wire.

Run serially after other TPU jobs:
  nohup python -u tools/profile_insert.py > /tmp/prof_insert.log 2>&1 &
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from zebra_tpu.index import ivf as V

N, K, C, G, D, SPILL = 65536, 4096, 496, 65536, 768, 8
print("devices:", jax.devices(), flush=True)


def timeit(name, fn, *args, iters=5, donate_builder=None):
    out = fn(*args)
    device_sync(out)
    if donate_builder is None:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        device_sync(out)
        dt = (time.perf_counter() - t0) / iters
    else:
        dts = []
        for _ in range(iters):
            args2 = donate_builder()
            device_sync(args2)
            t0 = time.perf_counter()
            out = fn(*args2)
            device_sync(out)
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
    print(f"{name:34s} {dt*1e3:9.1f} ms", flush=True)
    return out


rng = np.random.default_rng(0)
x_np = rng.standard_normal((N, D)).astype(np.float32)
x = jnp.asarray(x_np)
cents = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
device_sync((x, cents))

# ---- stage 1: assignment matmul + top-k ------------------------------------


@jax.jit
def assign_scores(x, cents):
    dot = jnp.dot(x, cents.T, preferred_element_type=jnp.float32)
    cn2 = jnp.sum(cents * cents, axis=-1)
    return cn2[None, :] - 2.0 * dot


@jax.jit
def assign_topk(x, cents):
    return jax.lax.top_k(-assign_scores(x, cents), SPILL)


@jax.jit
def assign_argmin(x, cents):
    return jnp.argmin(assign_scores(x, cents), axis=1)


timeit("scores matmul [65536x4096]", assign_scores, x, cents)
timeit("scores + top_k(8)", assign_topk, x, cents)
timeit("scores + argmin", assign_argmin, x, cents)

# ---- stage 2: segmented ranks (one spill round) -----------------------------

codes = jnp.asarray(rng.integers(0, K, N).astype(np.int32))


@jax.jit
def ranks(codes):
    return V._segmented_ranks(codes)


timeit("segmented ranks (1 round)", ranks, codes)

# ---- stage 3: row scatter [65536, 768] --------------------------------------

S = K * C + G
slots = jnp.asarray(rng.permutation(S)[:N].astype(np.int32))


@functools.partial(jax.jit, donate_argnums=(0,))
def row_scatter(slab, x, slots):
    return slab.at[slots].set(x, mode="drop")


def fresh_slab():
    return (jnp.zeros((S, D), jnp.float32), x, slots)


timeit("row scatter 65536x768 -> slab", lambda a, b, c: row_scatter(a, b, c),
       *fresh_slab(), donate_builder=fresh_slab)

# ---- stage 4: full insert --------------------------------------------------

state = V.empty_state(cents, C, G)


def fresh_state_args():
    st = V.empty_state(cents, C, G)
    return (st, x, jnp.int32(N))


timeit("full ivf.insert (empty state)",
       lambda st, xx, nv: V.insert(st, xx, nv, spill=SPILL)[0].counts,
       *fresh_state_args(), donate_builder=fresh_state_args)

# ---- stage 5: wire ----------------------------------------------------------

t0 = time.perf_counter()
h = jax.device_put(x_np)
device_sync(h)
print(f"{'device_put 65536x768 f32 (192MB)':34s} {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)

import ml_dtypes

xbf = x_np.astype(ml_dtypes.bfloat16)
t0 = time.perf_counter()
h2 = jax.device_put(xbf)
device_sync(h2)
print(f"{'device_put 65536x768 bf16 (96MB)':34s} {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
print("profile done", flush=True)
