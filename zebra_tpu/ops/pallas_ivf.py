"""Pallas fused IVF re-rank: cluster-block DMA + distance + top-k per query.

The XLA path in :mod:`zebra_tpu.index.ivf` materialises each probed cluster
block ``[B, C, D]`` in HBM (gather) and reads it back for the einsum — 3x the
necessary traffic. This kernel streams each query's P cluster blocks
HBM->VMEM with double-buffered 2-D block DMAs (C rows x D lanes, ~1.5MB each
at the 1M x 768 defaults — two orders of magnitude fewer descriptors than the
LSH kernel's per-row gathers), computes dots on-chip, combines with
pre-gathered squared norms, and selects top-k with an iterative min/mask loop
— one grid step per query.

Contrast with ``ops/pallas_rerank.py`` (the LSH candidate kernel): because the
IVF slab is cluster-contiguous, the DMA unit here is a naturally tiled
``[C, D]`` block, needing only ``D % 128 == 0`` (vs the flat-slab kernel's
1024-f32 row alignment) and ``C % 8 == 0`` — both guaranteed by the host
layer's sizing. Supports the MXU metrics (cosine / l2 / sql2), the ones the
reference accelerates with simsimd (``src/distance.rs:21-31,40-48,105-113``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_K = 128  # padded top-k output width (k <= OUT_K)
BIG = 3.0e38  # sentinel for masked-out candidates


def _kernel_factory(metric: str, P: int, C: int, D: int, k: int):
    assert P % 2 == 0

    def kernel(probes_ref, nrm_ref, val_ref, q_ref, vec_ref,
               outd_ref, outp_ref, buf0, buf1, sem0, sem1):
        q = q_ref[0]  # [1, D]
        qn2 = jnp.sum(q * q)

        def block_dma(buf, sem, p):
            # C-row slice of the FLAT [S, D] slab (the spare tail after the
            # cluster blocks forbids a [K, C, D] reshape)
            c = probes_ref[0, 0, p]
            return pltpu.make_async_copy(vec_ref.at[pl.ds(c * C, C), :], buf, sem)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)

        def dots_of(buf):
            x = buf[:]  # [C, D]
            # HIGHEST: full-f32 MXU passes — default precision is bf16-grade
            # and mis-ranks near-ties (see ops/pallas_rerank.py)
            return jax.lax.dot_general(
                q.astype(jnp.float32),
                x.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [1, C]

        block_dma(buf0, sem0, 0).start()

        def pair_body(i, dd_all):
            a = 2 * i
            b = a + 1
            # start odd block into buf1 while even block streams into buf0
            block_dma(buf1, sem1, b).start()
            block_dma(buf0, sem0, a).wait()
            dots_a = dots_of(buf0)
            dd_all = jnp.where(
                row_iota == a, jnp.broadcast_to(dots_a, dd_all.shape), dd_all
            )

            @pl.when(a + 2 < P)
            def _():
                block_dma(buf0, sem0, a + 2).start()

            block_dma(buf1, sem1, b).wait()
            dots_b = dots_of(buf1)
            dd_all = jnp.where(
                row_iota == b, jnp.broadcast_to(dots_b, dd_all.shape), dd_all
            )
            return dd_all

        dot = jax.lax.fori_loop(
            0, P // 2, pair_body, jnp.zeros((P, C), jnp.float32)
        )

        n2 = nrm_ref[0]  # [P, C]
        vmask = val_ref[0] > 0
        if metric == "cosine":
            denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
            d = 1.0 - dot * denom
            d = jnp.where(n2 * qn2 > 0, d, 1.0)
        else:
            d2 = jnp.maximum(qn2 + n2 - 2.0 * dot, 0.0)
            d = jnp.sqrt(d2) if metric == "l2" else d2
        d = jnp.where(vmask, d, BIG)

        lin = row_iota * C + jax.lax.broadcasted_iota(jnp.int32, (P, C), 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_K), 1)

        def select(j, carry):
            dd, od, op = carry
            m = jnp.min(dd)
            li = jnp.min(jnp.where(dd == m, lin, jnp.int32(2**30)))
            od = jnp.where(out_col == j, m, od)
            op = jnp.where(out_col == j, jnp.where(m < BIG, li, -1), op)
            dd = jnp.where(lin == li, BIG, dd)
            return dd, od, op

        _, od, op = jax.lax.fori_loop(
            0,
            k,
            select,
            (
                d,
                jnp.full((1, OUT_K), BIG, jnp.float32),
                jnp.full((1, OUT_K), -1, jnp.int32),
            ),
        )
        outd_ref[0] = od
        outp_ref[0] = op

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cluster_capacity", "metric", "k", "interpret")
)
def pallas_ivf_rerank(vectors, cluster_capacity, q, probes, cand_norms, cand_valid,
                      metric: str = "cosine", k: int = 10, interpret: bool = False):
    """Fused IVF block re-rank.

    Args:
      vectors: ``[K*C + G, D]`` cluster-contiguous slab (+ spare tail, which
        this kernel never touches); stays in HBM.
      cluster_capacity: static int — block width C.
      q: ``[B, D]`` f32 queries.
      probes: ``[B, P]`` int32 cluster ids (P even; pad with a masked probe).
      cand_norms: ``[B, P, C]`` f32 squared norms of the probed blocks.
      cand_valid: ``[B, P, C]`` f32 (1.0 live / 0.0 masked).
      k: top-k (<= 128).

    Returns:
      ``(dists [B, k], pos [B, k])`` — ``pos`` indexes the flattened [P*C]
      probe axis (or -1 when fewer than k valid candidates exist).
    """
    B, P = probes.shape
    S, D = vectors.shape
    C = cluster_capacity
    assert P % 2 == 0, "probe count must be even (pad with a masked probe)"
    assert k <= OUT_K
    if not interpret:
        assert D % 128 == 0, f"stored dim {D} must be a multiple of 128 lanes"
        assert C % 8 == 0, f"cluster capacity {C} must be a multiple of 8 sublanes"

    kernel = _kernel_factory(metric, P, C, D, k)
    probes3 = probes.reshape(B, 1, P)
    q3 = q.astype(jnp.float32).reshape(B, 1, D)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # slab stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 1, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, OUT_K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, D), vectors.dtype),
            pltpu.VMEM((C, D), vectors.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(probes3, cand_norms, cand_valid, q3, vectors)

    d = out_d[:, 0, :k]
    p = out_p[:, 0, :k]
    valid = p >= 0
    d = jnp.where(valid, d, jnp.inf)
    return d, p


def ivf_rerank(state, q32, probes, k, metric: str = "cosine"):
    """Adapter used by :func:`zebra_tpu.index.ivf.query`: gathers the probed
    blocks' norms/validity (tiny [B, P, C] f32 arrays), pads the probe axis to
    an even width, runs the kernel, and maps positions -> slab slots."""
    C = state.cluster_capacity
    B, P = probes.shape
    pad = P % 2
    if pad:
        probes = jnp.pad(probes, ((0, 0), (0, 1)))

    def one_block(arr):
        def take(c):
            return jax.lax.dynamic_slice(arr, (c * C,), (C,))

        return jax.vmap(jax.vmap(take))

    nrm = one_block(state.norms)(probes)  # [B, P2, C]
    val = one_block(state.valid)(probes).astype(jnp.float32)
    if pad:
        val = val.at[:, -1, :].set(0.0)
    d, pos = pallas_ivf_rerank(
        state.vectors, C, q32, probes.astype(jnp.int32), nrm, val,
        metric=metric, k=k,
    )
    valid = pos >= 0
    posc = jnp.clip(pos, 0, probes.shape[1] * C - 1)
    cl = jnp.take_along_axis(probes, posc // C, axis=1)
    slots = jnp.where(valid, cl * C + posc % C, -1)
    return d, slots, valid
