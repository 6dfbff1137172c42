"""Ablate the IVF centroid-scoring + probe-selection stage on TPU.

After the bf16x2 dot fix (abl_aux.py) the wave kernel costs ~1.4ms/batch and
centroid score + approx top-P ~1.0-1.2ms — now ~40% of query time. Floor
estimate: score matmul ~0.13ms + [B, K] f32 materialisation ~0.16ms + the
partial top-k reduction. Variants probe where the rest goes.

  nohup python -u tools/abl_centroid.py > /tmp/abl_centroid.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

K, Ddim, B, P = 16384, 768, 1024, 4
print("devices:", jax.devices(), flush=True)

key = jax.random.PRNGKey(0)
cents = jax.random.normal(key, (K, Ddim), dtype=jnp.float32)
q = jax.random.normal(jax.random.fold_in(key, 1), (B, Ddim), dtype=jnp.float32)
cn2 = jnp.sum(cents * cents, axis=1)
device_sync(cn2)


def bench(name, fn, iters=60):
    out = fn()
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    device_sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms/batch  ({B/dt:,.0f} QPS)", flush=True)
    return out


@jax.jit
def score_only(cents, q):
    # cosine selection score (|q| constant per row — omit), default precision
    dot = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
    return dot / jnp.maximum(jnp.sqrt(cn2), 1e-30)[None, :]


@jax.jit
def current(cents, q):
    s = score_only(cents, q)
    _, probes = jax.lax.approx_max_k(s, P)
    return probes.astype(jnp.int32)


@jax.jit
def score_bf16_topk(cents, q):
    s = score_only(cents, q).astype(jnp.bfloat16)
    _, probes = jax.lax.approx_max_k(s, P)
    return probes.astype(jnp.int32)


@jax.jit
def exact_topk(cents, q):
    s = score_only(cents, q)
    _, probes = jax.lax.top_k(s, P)
    return probes.astype(jnp.int32)


@jax.jit
def relaxed_approx(cents, q):
    s = score_only(cents, q)
    _, probes = jax.lax.approx_max_k(s, P, recall_target=0.8)
    return probes.astype(jnp.int32)


@jax.jit
def blockmax_2stage(cents, q):
    """Group the K centroids into 128 blocks of 128; per-block max score +
    argmax-in-block, then exact top-P over the 128 block maxima. Probes can
    only come from P distinct blocks (vs approx_max_k's bins) — a different
    approximation with ~K/128 the top-k width."""
    s = score_only(cents, q)  # [B, K]
    G = 128
    s3 = s.reshape(B, K // G, G)
    bm = jnp.max(s3, axis=2)  # [B, K/G]
    ba = jnp.argmax(s3, axis=2).astype(jnp.int32)  # [B, K/G]
    _, blk = jax.lax.top_k(bm, P)  # [B, P]
    inner = jnp.take_along_axis(ba, blk, axis=1)
    return blk * G + inner


@functools.partial(jax.jit, static_argnames=())
def bf16_dot_topk(cents, q):
    """Score in bf16 end-to-end: bf16 dot output + approx_max_k on bf16."""
    dot = jnp.dot(
        q.astype(jnp.bfloat16), cents.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    s = dot / jnp.maximum(jnp.sqrt(cn2), 1e-30)[None, :].astype(jnp.bfloat16)
    _, probes = jax.lax.approx_max_k(s, P)
    return probes.astype(jnp.int32)


bench("score only (no selection)", lambda: score_only(cents, q))
p0 = bench("current: f32 score + approx_max_k", lambda: current(cents, q))
p1 = bench("bf16 score + approx_max_k", lambda: score_bf16_topk(cents, q))
p2 = bench("f32 score + exact top_k", lambda: exact_topk(cents, q))
p3 = bench("approx_max_k recall_target=0.8", lambda: relaxed_approx(cents, q))
p4 = bench("blockmax 2-stage (128x128)", lambda: blockmax_2stage(cents, q))
p5 = bench("bf16 dot + bf16 approx_max_k", lambda: bf16_dot_topk(cents, q))

ref = np.sort(np.asarray(p2), axis=1)  # exact top-P as truth
for nm, p in (("current", p0), ("bf16-score", p1), ("relaxed", p3),
              ("blockmax", p4), ("bf16-all", p5)):
    got = np.sort(np.asarray(p), axis=1)
    ov = np.mean([
        len(set(ref[b].tolist()) & set(got[b].tolist())) / P for b in range(B)
    ])
    print(f"probe overlap vs exact top-{P}: {nm:12s} {ov:.4f}", flush=True)
