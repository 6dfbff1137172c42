"""Pallas fused candidate re-rank: gather + distance + top-k in one kernel.

The XLA re-rank path (``index/buckets.py:_chunked_rerank``) materialises the
gathered candidate matrix ``[B, C, D]`` in HBM and reads it back for the
distance einsum — 3x the necessary HBM traffic. This kernel streams candidate
rows HBM->VMEM with double-buffered per-row DMAs (the slab never round-trips),
computes dots on-chip, combines with pre-gathered squared norms, and selects
top-k with an iterative min/mask loop in VMEM.

Each grid step processes ``Q_BLK`` queries (TPU block sublane constraint);
within a step queries are handled sequentially, each with a double-buffered
candidate-chunk pipeline.

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

CHUNK = 128   # candidate rows per DMA wave (also the lane width)
OUT_K = 128   # padded top-k output width (k <= OUT_K)
Q_BLK = 8     # queries per grid step (f32 sublane granularity)
BIG = 3.0e38  # sentinel for masked-out candidates (python scalar: pallas
#               kernels cannot capture traced jnp constants)


def _kernel_factory(metric: str, C: int, D: int, k: int, slab_rows: int, vec_dtype):
    n_chunks = C // CHUNK

    def kernel(slots_ref, nrm_ref, valid_ref, q_ref, vec_ref,
               outd_ref, outp_ref, buf, dists, sem_rows):
        # slots_ref is an SMEM block (Q_BLK, C): DMA indices are scalar reads
        lin = (
            jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK), 1)
        )
        out_col = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_K), 1)

        def one_query(qi, _):
            q = q_ref[pl.ds(qi, 1), :]  # [1, D]
            qn2 = jnp.sum(q * q)

            def row_dma(buf_slot, r, base):
                # slab and staging buffer are 1-D: row slices of a (8,128)-
                # tiled 2-D memref are not DMA-sliceable, but 128-aligned 1-D
                # segments are (D is a multiple of 128)
                slot = jnp.clip(slots_ref[qi, base + r], 0, slab_rows - 1)
                return pltpu.make_async_copy(
                    vec_ref.at[pl.ds(slot * D, D)],
                    buf.at[buf_slot, pl.ds(r * D, D)],
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
                x = buf[cur].reshape(CHUNK, D)
                dots = jax.lax.dot_general(
                    q.astype(jnp.float32),
                    x.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [1, CHUNK]
                dists[pl.ds(c, 1), :] = dots
                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

            # combine with norms, mask, select top-k
            dot = dists[:, :]  # [n_chunks, CHUNK]; element i = chunk*CHUNK+lane
            n2 = nrm_ref[pl.ds(qi, 1), :].reshape(n_chunks, CHUNK)
            vmask = valid_ref[pl.ds(qi, 1), :].reshape(n_chunks, CHUNK) > 0
            if metric == "cosine":
                denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
                d = 1.0 - dot * denom
                d = jnp.where(n2 * qn2 > 0, d, 1.0)
            else:
                d2 = jnp.maximum(qn2 + n2 - 2.0 * dot, 0.0)
                d = jnp.sqrt(d2) if metric == "l2" else d2
            d = jnp.where(vmask, d, BIG)

            # iterative min/mask selection, accumulated in vector registers
            # (Mosaic forbids scalar VMEM stores — rows are written whole)
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
            outd_ref[pl.ds(qi, 1), :] = od
            outp_ref[pl.ds(qi, 1), :] = op
            return 0

        jax.lax.fori_loop(0, Q_BLK, one_query, 0)

    return kernel, n_chunks


@functools.partial(jax.jit, static_argnames=("metric", "k", "interpret"))
def pallas_rerank(vectors, q, cand, cand_norms, cand_valid, metric: str = "cosine",
                  k: int = 10, interpret: bool = False):
    """Fused re-rank.

    Args:
      vectors: ``[S, D]`` slab (stays in HBM).
      q: ``[B, D]`` f32 queries (B a multiple of Q_BLK=8).
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
    n_q = B
    pad_b = (-B) % Q_BLK
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
        cand = jnp.pad(cand, ((0, pad_b), (0, 0)), constant_values=-1)
        cand_norms = jnp.pad(cand_norms, ((0, pad_b), (0, 0)))
        cand_valid = jnp.pad(cand_valid, ((0, pad_b), (0, 0)))
        B += pad_b
    if S * D >= 2**31:
        raise ValueError("slab too large for i32 flat indexing; shard it")
    kernel, n_chunks = _kernel_factory(metric, C, D, k, S, vectors.dtype)
    vectors_flat = vectors.reshape(-1)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(B // Q_BLK,),
        in_specs=[
            pl.BlockSpec((Q_BLK, C), lambda b: (b, 0), memory_space=pltpu.SMEM),  # slots
            pl.BlockSpec((Q_BLK, C), lambda b: (b, 0), memory_space=pltpu.VMEM),  # norms
            pl.BlockSpec((Q_BLK, C), lambda b: (b, 0), memory_space=pltpu.VMEM),  # valid
            pl.BlockSpec((Q_BLK, D), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.ANY),  # flat vector slab stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((Q_BLK, OUT_K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_BLK, OUT_K), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((B, OUT_K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK * D), vectors.dtype),
            pltpu.VMEM((n_chunks, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CHUNK)),
        ],
        interpret=interpret,
    )(cand, cand_norms, cand_valid, q.astype(jnp.float32), vectors_flat)

    d = out_d[:n_q, :k]
    p = out_p[:n_q, :k]
    valid = p >= 0
    d = jnp.where(valid, d, jnp.inf)
    return d, p
