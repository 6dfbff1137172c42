"""Ablate the int8 residual-refine pass: where do the milliseconds go?

The r3 refine sweep (bench_results/r3_sweep_int8_refine.json) showed the
refine pass costing ~3x the whole coarse search (306k QPS vs plain int8's
1.0M at P=2/65k). Candidates: the [B, kk, D] row gathers, or the
'bd,bkd->bk' batched MATVEC einsum (M=1 per batch element — the MXU tiles
128x128, so a batched matvec wastes >99% of each pass).

Synthesises the arrays directly on device (no host upload, no build).
Run serially: nohup python -u tools/abl_refine.py > /tmp/abl_refine.log 2>&1
"""

import sys
import time

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

S = 1_310_720  # ~1M-slab row count
D = 768
B = 16384
KK = 40

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
vectors = jax.random.randint(k1, (S, D), -127, 128, dtype=jnp.int8)
residual = jax.random.randint(k2, (S, D), -127, 128, dtype=jnp.int8)
scales = jnp.full((S,), 0.01, jnp.float32)
rscales = jnp.full((S,), 0.0001, jnp.float32)
norms = jnp.sum(
    (vectors.astype(jnp.float32) * 0.01) ** 2, axis=-1
)
q = jax.random.normal(k3, (B, D), dtype=jnp.float32)
idx = jax.random.randint(k4, (B, KK), 0, S, dtype=jnp.int32)
device_sync(norms)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1000:8.2f} ms/batch  ({B/dt:12,.0f} q/s)", flush=True)
    return dt


@jax.jit
def gather_only(vectors, residual, idx):
    v8 = jnp.take(vectors, idx, axis=0)
    r8 = jnp.take(residual, idx, axis=0)
    # cheap reduce so the gathers can't fold away
    return (
        jnp.sum(v8.astype(jnp.int32), axis=-1)
        + jnp.sum(r8.astype(jnp.int32), axis=-1)
    )


@jax.jit
def einsum_matvec(vectors, residual, scales, rscales, q, idx):
    """The shipped formulation: batched matvec on the MXU (suspect)."""
    v8 = jnp.take(vectors, idx, axis=0)
    r8 = jnp.take(residual, idx, axis=0)
    hi = jnp.einsum("bd,bkd->bk", q, v8.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    lo = jnp.einsum("bd,bkd->bk", q, r8.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return hi * jnp.take(scales, idx) + lo * jnp.take(rscales, idx)


@jax.jit
def vpu_mulsum(vectors, residual, scales, rscales, q, idx):
    """Elementwise multiply + reduce (VPU, no MXU): f32 products are exact
    for int8 values, q stays f32."""
    v8 = jnp.take(vectors, idx, axis=0).astype(jnp.float32)
    r8 = jnp.take(residual, idx, axis=0).astype(jnp.float32)
    hi = jnp.sum(q[:, None, :] * v8, axis=-1)
    lo = jnp.sum(q[:, None, :] * r8, axis=-1)
    return hi * jnp.take(scales, idx) + lo * jnp.take(rscales, idx)


@jax.jit
def vpu_fused(vectors, residual, scales, rscales, q, idx):
    """One fused pass: combine v8/r8 into the reconstruction per element
    BEFORE the reduce — halves the [B,KK] reduces, one product stream."""
    v8 = jnp.take(vectors, idx, axis=0).astype(jnp.float32)
    r8 = jnp.take(residual, idx, axis=0).astype(jnp.float32)
    sc = jnp.take(scales, idx)[..., None]
    rs = jnp.take(rscales, idx)[..., None]
    return jnp.sum(q[:, None, :] * (v8 * sc + r8 * rs), axis=-1)


@jax.jit
def residual_only_invert(residual, rscales, norms, q, idx, dk):
    """The dot-inversion refine: coarse distance -> coarse dot (pure
    elementwise math on [B,KK]), ONE residual gather, ONE dot. No v8
    gather, no hi dot — candidate-set cost halves if gathers dominate."""
    qn2 = jnp.sum(q * q, axis=-1)[:, None]
    n2 = jnp.take(norms, idx)
    dot_c = (1.0 - dk) * jnp.sqrt(jnp.maximum(qn2 * n2, 0.0))  # cosine inverse
    r8 = jnp.take(residual, idx, axis=0)
    lo = jnp.einsum("bd,bkd->bk", q, r8.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    dots = dot_c + lo * jnp.take(rscales, idx)
    den = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
    return 1.0 - dots * den


@jax.jit
def residual_invert_bf16dot(residual, rscales, norms, q, idx, dk):
    """Inversion + ONE-PASS bf16 lo dot: the residual term is ~2^-8 of the
    total dot, so bf16 rounding on it lands ~4e-6 relative — far below the
    refine target. Should cut the 6-pass HIGHEST matvec ~6x."""
    qn2 = jnp.sum(q * q, axis=-1)[:, None]
    n2 = jnp.take(norms, idx)
    dot_c = (1.0 - dk) * jnp.sqrt(jnp.maximum(qn2 * n2, 0.0))
    r8 = jnp.take(residual, idx, axis=0)
    lo = jnp.einsum("bd,bkd->bk", q.astype(jnp.bfloat16),
                    r8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dots = dot_c + lo * jnp.take(rscales, idx)
    den = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
    return 1.0 - dots * den


@jax.jit
def single_gather_only(residual, idx):
    r8 = jnp.take(residual, idx, axis=0)
    return jnp.sum(r8.astype(jnp.int32), axis=-1)


@jax.jit
def residual_invert_blockdiag(residual, rscales, norms, q, idx, dk):
    """Inversion + GROUPED lo dot: stack Qg queries' candidate rows as one
    [Qg*KK, D] rhs and run a real [Qg, D] x [D, Qg*KK] MXU matmul per
    group, then keep the diagonal blocks. 8x wasted FLOPs (free — the
    matvec was issue-bound, not FLOP-bound); passes drop ~Qg x."""
    QG = 8
    qn2 = jnp.sum(q * q, axis=-1)[:, None]
    n2 = jnp.take(norms, idx)
    dot_c = (1.0 - dk) * jnp.sqrt(jnp.maximum(qn2 * n2, 0.0))
    r8 = jnp.take(residual, idx, axis=0)  # [B, KK, D] int8
    G = B // QG
    qg = q.astype(jnp.bfloat16).reshape(G, QG, D)
    rg = r8.astype(jnp.bfloat16).reshape(G, QG * KK, D)
    big = jax.lax.dot_general(
        qg, rg, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, QG, QG*KK]
    big = big.reshape(G, QG, QG, KK)
    ii = jnp.arange(QG)
    lo = big[:, ii, ii, :].reshape(B, KK)
    dots = dot_c + lo * jnp.take(rscales, idx)
    den = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
    return 1.0 - dots * den


@jax.jit
def gather_width(slab, idx):
    """Width-scaling probe: same ROW COUNT, varying row bytes. If the
    gather is HBM-bandwidth-bound, time scales with width; if it is
    row-issue-bound (one DMA per row), time is flat and int4 packing
    would buy nothing."""
    g = jnp.take(slab, idx, axis=0)
    return jnp.sum(g.astype(jnp.int32), axis=-1)


@jax.jit
def gather_int4_unpack(packed, rscales, norms, q, idx, dk):
    """The int4-residual candidate end-to-end: gather [B,KK,D//2] uint8,
    unpack two nibbles per byte (VPU shifts), one bf16 dot. Compare vs
    residual_invert_bf16dot — the delta is (half gather bytes) - (unpack
    cost)."""
    qn2 = jnp.sum(q * q, axis=-1)[:, None]
    n2 = jnp.take(norms, idx)
    dot_c = (1.0 - dk) * jnp.sqrt(jnp.maximum(qn2 * n2, 0.0))
    p = jnp.take(packed, idx, axis=0)  # [B, KK, D//2] uint8
    lonib = jnp.bitwise_and(p, jnp.uint8(0x0F)).astype(jnp.int8) - 8
    hinib = jnp.right_shift(p, jnp.uint8(4)).astype(jnp.int8) - 8
    r4 = jnp.concatenate([lonib, hinib], axis=-1)  # [B, KK, D] int8
    lo = jnp.einsum("bd,bkd->bk", q.astype(jnp.bfloat16),
                    r4.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dots = dot_c + lo * jnp.take(rscales, idx)
    den = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
    return 1.0 - dots * den


@jax.jit
def coarse_probe_equiv(vectors, q):
    """Reference cost: a [B,D]x[D,2048] int8 matmul ~ what P=2 block fetch
    + dots cost per batch (scale context, not apples-to-apples)."""
    blk = jax.lax.dynamic_slice_in_dim(vectors, 0, 2048, axis=0)
    return jnp.dot(q, blk.astype(jnp.bfloat16).T,
                   preferred_element_type=jnp.float32)


dk_fake = jax.random.uniform(k5, (B, KK), jnp.float32)
timeit("residual_only_invert", residual_only_invert,
       residual, rscales, norms, q, idx, dk_fake)
timeit("residual_invert_bf16dot", residual_invert_bf16dot,
       residual, rscales, norms, q, idx, dk_fake)
timeit("residual_invert_blockdiag", residual_invert_blockdiag,
       residual, rscales, norms, q, idx, dk_fake)
timeit("single_gather_only", single_gather_only, residual, idx)
slab_384 = jax.random.randint(k2, (S, 384), -127, 128, dtype=jnp.int8)
slab_192 = jax.random.randint(k2, (S, 192), -127, 128, dtype=jnp.int8)
packed = jax.random.randint(k2, (S, D // 2), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
device_sync(packed)
timeit("gather_width D=768", gather_width, residual, idx)
timeit("gather_width D=384", gather_width, slab_384, idx)
timeit("gather_width D=192", gather_width, slab_192, idx)
timeit("gather_int4_unpack e2e", gather_int4_unpack,
       packed, rscales, norms, q, idx, dk_fake)
idx_half = idx[:, :KK // 2]
timeit("gather rows KK=20", gather_width, residual, idx_half)
timeit("gather_only", gather_only, vectors, residual, idx)
timeit("einsum_matvec (shipped)", einsum_matvec, vectors, residual, scales, rscales, q, idx)
timeit("vpu_mulsum", vpu_mulsum, vectors, residual, scales, rscales, q, idx)
timeit("vpu_fused", vpu_fused, vectors, residual, scales, rscales, q, idx)
timeit("coarse_probe_equiv", coarse_probe_equiv, vectors, q)
print("done", flush=True)
