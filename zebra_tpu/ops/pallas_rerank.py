"""Pallas fused candidate re-rank: gather + distance + top-k in one kernel.

The XLA re-rank path (``index/buckets.py:_chunked_rerank``) materialises the
gathered candidate matrix ``[B, C, D]`` in HBM and reads it back for the
distance einsum — 3x the necessary HBM traffic. This kernel streams candidate
rows HBM->VMEM with double-buffered per-row DMAs (the slab never round-trips),
computes dots on-chip, combines with pre-gathered squared norms, and selects
top-k with an iterative min/mask loop in VMEM. One grid step per query.

Supports the MXU metrics (cosine / l2 / sql2) — the ones the reference
accelerates with simsimd (``src/distance.rs:21-31,40-48,105-113``); the other
metrics use the XLA path.

Returns candidate *positions* (indices into the [B, C] candidate array);
the caller maps positions -> slab slots -> ids (cheap [B, k] gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128  # candidate rows per DMA wave (also the lane width)
OUT_K = 128  # padded top-k output width (k <= OUT_K)
BIG = 3.0e38  # sentinel for masked-out candidates (python scalar: pallas
#               kernels cannot capture traced jnp constants)


def _kernel_factory(metric: str, C: int, D: int, k: int, slab_rows: int, vec_dtype):
    n_chunks = C // CHUNK

    def kernel(slots_ref, nrm_ref, valid_ref, q_ref, vec_ref,
               outd_ref, outp_ref, sslots, buf, dists, sem_rows, sem_s):
        # ---- slots row VMEM -> SMEM so DMA indices are scalar reads --------
        cp = pltpu.make_async_copy(slots_ref, sslots, sem_s)
        cp.start()
        cp.wait()

        q = q_ref[:]  # [1, D]
        qn2 = jnp.sum(q * q)

        def row_dma(buf_slot, r, base):
            slot = jnp.clip(sslots[0, base + r], 0, slab_rows - 1)
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(slot, 1), :],
                buf.at[buf_slot, pl.ds(r, 1), :],
                sem_rows.at[buf_slot, r],
            )

        def start_chunk(buf_slot, chunk_idx):
            base = chunk_idx * CHUNK

            def body(r, _):
                row_dma(buf_slot, r, base).start()
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0)

        def wait_chunk(buf_slot, chunk_idx):
            base = chunk_idx * CHUNK

            def body(r, _):
                row_dma(buf_slot, r, base).wait()
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0)

        start_chunk(0, 0)

        def chunk_body(c, _):
            cur = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                start_chunk((c + 1) % 2, c + 1)

            wait_chunk(cur, c)
            x = buf[cur]  # [CHUNK, D]
            dots = jax.lax.dot_general(
                q.astype(jnp.float32),
                x.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, CHUNK]
            dists[pl.ds(c, 1), :] = dots
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # ---- combine with norms, mask, select top-k ------------------------
        dot = dists[:, :]  # [n_chunks, CHUNK]; element i = chunk*CHUNK + lane
        n2 = nrm_ref[:].reshape(n_chunks, CHUNK)
        vmask = valid_ref[:].reshape(n_chunks, CHUNK) > 0
        if metric == "cosine":
            denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
            d = 1.0 - dot * denom
            d = jnp.where(n2 * qn2 > 0, d, 1.0)
        else:
            d2 = jnp.maximum(qn2 + n2 - 2.0 * dot, 0.0)
            d = jnp.sqrt(d2) if metric == "l2" else d2
        d = jnp.where(vmask, d, BIG)

        lin = (
            jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK), 1)
        )

        outd_ref[:] = jnp.full((1, OUT_K), BIG, jnp.float32)
        outp_ref[:] = jnp.full((1, OUT_K), -1, jnp.int32)

        def select(j, dd):
            m = jnp.min(dd)
            li = jnp.min(jnp.where(dd == m, lin, jnp.int32(2**30)))
            outd_ref[0, j] = m
            outp_ref[0, j] = jnp.where(m < BIG, li, -1)
            return jnp.where(lin == li, BIG, dd)

        jax.lax.fori_loop(0, k, select, d)

    return kernel, n_chunks


@functools.partial(jax.jit, static_argnames=("metric", "k", "interpret"))
def pallas_rerank(vectors, q, cand, cand_norms, cand_valid, metric: str = "cosine",
                  k: int = 10, interpret: bool = False):
    """Fused re-rank.

    Args:
      vectors: ``[S, D]`` slab (stays in HBM).
      q: ``[B, D]`` f32 queries.
      cand: ``[B, C]`` int32 candidate slab slots (C multiple of 128).
      cand_norms: ``[B, C]`` f32 squared norms of candidates.
      cand_valid: ``[B, C]`` f32 (1.0 live / 0.0 masked).
      k: top-k (<= 128).

    Returns:
      ``(dists [B, k], pos [B, k])`` — ``pos`` indexes into the candidate
      axis (or -1 when fewer than k valid candidates exist).
    """
    B, C = cand.shape
    S, D = vectors.shape
    assert C % CHUNK == 0, f"candidate count {C} must be a multiple of {CHUNK}"
    assert k <= OUT_K
    kernel, n_chunks = _kernel_factory(metric, C, D, k, S, vectors.dtype)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C), lambda b: (b, 0), memory_space=pltpu.VMEM),  # slots
            pl.BlockSpec((1, C), lambda b: (b, 0), memory_space=pltpu.VMEM),  # norms
            pl.BlockSpec((1, C), lambda b: (b, 0), memory_space=pltpu.VMEM),  # valid
            pl.BlockSpec((1, D), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.ANY),  # vectors stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, OUT_K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_K), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((B, OUT_K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.VMEM((2, CHUNK, D), vectors.dtype),
            pltpu.VMEM((n_chunks, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CHUNK)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cand, cand_norms, cand_valid, q.astype(jnp.float32), vectors)

    d = out_d[:, :k]
    p = out_p[:, :k]
    valid = p >= 0
    d = jnp.where(valid, d, jnp.inf)
    return d, p
