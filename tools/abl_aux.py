"""Ablate the IVF query path's aux stages on TPU: what do the norm/valid
gathers + the [B, P, C] aux VMEM pipeline actually cost in-program, and
does the aux-free v3 (augmented slab) kernel beat v1?

Synthetic state is generated ON DEVICE (no tunnel transfer): all-live slab,
full clusters, empty spare. Timings via utils.device_sync (the only true
barrier on this transport — see CLAUDE.md).

  nohup python -u tools/abl_aux.py > /tmp/abl_aux.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.index import ivf
from zebra_tpu.ops import distances as D
from zebra_tpu.ops import pallas_ivf as PI
from zebra_tpu.ops import experimental_ivf as PX

K, C, Ddim, B, P, k = 16384, 128, 768, 1024, 4, 10
DT = jnp.bfloat16
print("devices:", jax.devices(), flush=True)

key = jax.random.PRNGKey(0)
kv, kq = jax.random.split(key)


@jax.jit
def make_state(kv):
    vecs = jax.random.normal(kv, (K * C, Ddim), dtype=DT)
    v32 = vecs.astype(jnp.float32)
    norms = jnp.sum(v32 * v32, axis=1)
    return ivf.IVFState(
        centroids=jax.random.normal(jax.random.fold_in(kv, 1), (K, Ddim)),
        counts=jnp.concatenate(
            [jnp.full((K,), C, jnp.int32), jnp.zeros((1,), jnp.int32)]
        ),
        vectors=vecs,
        norms=norms,
        valid=jnp.ones((K * C,), jnp.bool_),
        overflow=jnp.zeros((), jnp.int32),
        ccap=C,
    )


st = make_state(kv)
q = jax.random.normal(kq, (B, Ddim), dtype=jnp.float32)
vec_aug = PX.augment_slab(st.vectors, st.norms, st.valid, "cosine")
device_sync(vec_aug)
print(
    f"state ready: slab {st.vectors.shape} {st.vectors.dtype}, "
    f"aug {vec_aug.shape} {vec_aug.dtype}",
    flush=True,
)


def bench(name, fn, iters=40):
    out = fn()
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    device_sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch  ({B/dt:,.0f} QPS)", flush=True)
    return out


@jax.jit
def centroid_topP(st, q):
    score = D.pairwise(q, st.centroids, metric="cosine", precision="default")
    _, probes = jax.lax.approx_max_k(-score, P)
    return probes.astype(jnp.int32)


@jax.jit
def full_v1(st, q):
    return ivf.query(st, q, k, metric="cosine", num_probes=P, rerank="pallas")


@jax.jit
def full_v1_nogather(st, q):
    """v1 kernel fed BROADCAST aux instead of gathered norms/valid — isolates
    the gather stage's in-program cost (results are numerically wrong for
    cosine; timing-only)."""
    probes = centroid_topP(st, q)
    nrm = jnp.ones((B, P, C), jnp.float32)
    val = jnp.ones((B, P, C), jnp.float32)
    return PI.pallas_ivf_rerank(
        st.vectors, C, q, probes, nrm, val, metric="cosine", k=k
    )


@jax.jit
def full_v3(st_vec_aug, st, q):
    probes = centroid_topP(st, q)
    return PX.ivf_rerank_aug(st_vec_aug, C, q, probes, k, metric="cosine")


@jax.jit
def full_v3_bf16(st_vec_aug, st, q):
    probes = centroid_topP(st, q)
    return PX.ivf_rerank_aug(
        st_vec_aug, C, q, probes, k, metric="cosine", exact=False
    )


import functools


@functools.partial(jax.jit, static_argnames=("dots",))
def full_v1_dots(st, q, dots: str):
    probes = centroid_topP(st, q)
    from zebra_tpu.ops.pallas_ivf import ivf_rerank

    return ivf_rerank(st, q, probes, k, metric="cosine", dots=dots)


probes = bench("centroid score + approx top-P", lambda: centroid_topP(st, q))
r1 = bench("full v1 (gather + aux kernel)", lambda: full_v1(st, q))
r1b = bench("v1 dots=bf16 (1-pass)",
            lambda: full_v1_dots(st, q, "bf16"))
r1x = bench("v1 dots=bf16x2 (2-pass split q)",
            lambda: full_v1_dots(st, q, "bf16x2"))
bench("v1 minus gathers (broadcast aux)", lambda: full_v1_nogather(st, q))
r3 = bench("full v3 (augmented, f32 dots)", lambda: full_v3(vec_aug, st, q))
r3b = bench("full v3 (augmented, bf16 dots)", lambda: full_v3_bf16(vec_aug, st, q))

# sanity: v3 must agree with v1 on slots (all-live synthetic slab)
s1 = np.asarray(r1[1])
s3 = np.asarray(r3[1])
agree = np.mean(s1[:, 0] == s3[:, 0])
ov = np.mean(
    [len(set(s1[b].tolist()) & set(s3[b].tolist())) / k for b in range(B)]
)
print(f"v1-vs-v3 top-1 agreement {agree:.4f}, top-{k} overlap {ov:.4f}", flush=True)
s3b = np.asarray(r3b[1])
ovb = np.mean(
    [len(set(s1[b].tolist()) & set(s3b[b].tolist())) / k for b in range(B)]
)
print(f"v1-vs-v3(bf16) top-{k} overlap {ovb:.4f}", flush=True)
for nm, r in (("v1-bf16", r1b), ("v1-bf16x2", r1x)):
    sX = np.asarray(r[1])
    o = np.mean(
        [len(set(s1[b].tolist()) & set(sX[b].tolist())) / k for b in range(B)]
    )
    a = np.mean(s1[:, 0] == sX[:, 0])
    print(f"v1-vs-{nm}: top-1 {a:.4f}, top-{k} overlap {o:.4f}", flush=True)
