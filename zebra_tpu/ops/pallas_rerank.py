"""Pallas fused candidate re-rank: gather + distance + top-k in one kernel.

The XLA re-rank path (``index/buckets.py:_chunked_rerank``) materialises the
gathered candidate matrix ``[B, C, D]`` in HBM and reads it back for the
distance einsum — 3x the necessary HBM traffic. This kernel streams candidate
rows HBM->VMEM with double-buffered per-row DMAs (the slab never round-trips),
computes dots on-chip, combines with pre-gathered squared norms, and selects
top-k with an iterative min/mask loop — one grid step per query.

Mosaic/TPU constraints shape the design (each cost a compile attempt):
  * DMA slices must respect tiling: the slab is passed FLAT (1-D) and row
    segments must be 1024-f32 aligned, so the stored dim is padded to 1024
    (handled by ``index/lsh.py``; zero columns are identity for all metrics);
  * no scalar or dynamic-single-row VMEM access: per-query inputs are blocked
    as ``(1, n_chunks, CHUNK)`` 3-D blocks read in full, the distance matrix
    accumulates in registers via row-masked selects, and the double buffer is
    two separate scratch allocations chosen statically (even/odd chunks);
  * candidate slots live in SMEM (scalar reads feed DMA descriptors).

Supports the MXU metrics (cosine / l2 / sql2) — the ones the reference
accelerates with simsimd (``src/distance.rs:21-31,40-48,105-113``); other
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

CHUNK = 128       # candidate rows per DMA wave (also the lane width)
PAIR = 2 * CHUNK  # candidate padding unit (even chunk count for the 2 buffers)
OUT_K = 128       # padded top-k output width (k <= OUT_K)
BIG = 3.0e38      # sentinel for masked-out candidates (python scalar: pallas
#                   kernels cannot capture traced jnp constants)

#: required f32 row-stride multiple for the flat-slab DMA (TPU 1-D tiling)
DIM_UNIT_F32 = 1024
DIM_UNIT_BF16 = 2048


def _kernel_factory(metric: str, C: int, D: int, k: int, slab_rows: int):
    n_chunks = C // CHUNK
    assert n_chunks % 2 == 0

    def kernel(slots_ref, nrm_ref, valid_ref, q_ref, vec_ref,
               outd_ref, outp_ref, buf0, buf1, sem0, sem1):
        q = q_ref[0]  # [1, D]
        qn2 = jnp.sum(q * q)

        def row_dma(buf, sem, r, base):
            slot = jnp.clip(slots_ref[0, base // CHUNK, r], 0, slab_rows - 1)
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(slot * D, D)],
                buf.at[pl.ds(r * D, D)],
                sem.at[r],
            )

        def start_chunk(buf, sem, chunk_idx):
            def body(r, _):
                row_dma(buf, sem, r, chunk_idx * CHUNK).start()
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0)

        def wait_compute(buf, sem, chunk_idx):
            def body(r, _):
                row_dma(buf, sem, r, chunk_idx * CHUNK).wait()
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0)
            x = buf[:].reshape(CHUNK, D)
            # HIGHEST: full-f32 MXU passes — default precision is bf16-grade
            # and mis-ranks near-ties (recall 0.91 vs 0.98 on clustered data)
            return jax.lax.dot_general(
                q.astype(jnp.float32),
                x.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [1, CHUNK]

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK), 0)

        start_chunk(buf0, sem0, 0)

        def pair_body(p, dd_all):
            a = 2 * p
            b = a + 1
            # start odd chunk into buf1 while even chunk streams into buf0
            start_chunk(buf1, sem1, b)
            dots_a = wait_compute(buf0, sem0, a)
            dd_all = jnp.where(row_iota == a, jnp.broadcast_to(dots_a, dd_all.shape), dd_all)

            @pl.when(a + 2 < n_chunks)
            def _():
                start_chunk(buf0, sem0, a + 2)

            dots_b = wait_compute(buf1, sem1, b)
            dd_all = jnp.where(row_iota == b, jnp.broadcast_to(dots_b, dd_all.shape), dd_all)
            return dd_all

        dot = jax.lax.fori_loop(
            0, n_chunks // 2, pair_body, jnp.zeros((n_chunks, CHUNK), jnp.float32)
        )

        # combine with stored norms, mask, select top-k — all static reads
        n2 = nrm_ref[0]  # [n_chunks, CHUNK]
        vmask = valid_ref[0] > 0
        if metric == "cosine":
            denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
            d = 1.0 - dot * denom
            d = jnp.where(n2 * qn2 > 0, d, 1.0)
        else:
            d2 = jnp.maximum(qn2 + n2 - 2.0 * dot, 0.0)
            d = jnp.sqrt(d2) if metric == "l2" else d2
        d = jnp.where(vmask, d, BIG)

        lin = row_iota * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (n_chunks, CHUNK), 1
        )
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

    return kernel, n_chunks


def dim_unit(dtype) -> int:
    return DIM_UNIT_BF16 if dtype == jnp.bfloat16 else DIM_UNIT_F32


@functools.partial(jax.jit, static_argnames=("metric", "k", "interpret"))
def pallas_rerank(vectors, q, cand, cand_norms, cand_valid, metric: str = "cosine",
                  k: int = 10, interpret: bool = False):
    """Fused re-rank.

    Args:
      vectors: ``[S, D]`` slab, D a multiple of the dtype's DMA unit
        (1024 f32 / 2048 bf16); stays in HBM.
      q: ``[B, D]`` f32 queries.
      cand: ``[B, C]`` int32 candidate slab slots (C multiple of 256).
      cand_norms: ``[B, C]`` f32 squared norms of candidates.
      cand_valid: ``[B, C]`` f32 (1.0 live / 0.0 masked).
      k: top-k (<= 128).

    Returns:
      ``(dists [B, k], pos [B, k])`` — ``pos`` indexes into the candidate
      axis (or -1 when fewer than k valid candidates exist).
    """
    B, C = cand.shape
    S, D = vectors.shape
    assert C % PAIR == 0, f"candidate count {C} must be a multiple of {PAIR}"
    assert k <= OUT_K
    if not interpret:
        assert D % dim_unit(vectors.dtype) == 0, (
            f"dim {D} must be a multiple of {dim_unit(vectors.dtype)} for the "
            "flat-slab DMA; pad the stored dimension (see index/lsh.py)"
        )
    if S * D >= 2**31:
        raise ValueError("slab too large for i32 flat indexing; shard it")
    kernel, n_chunks = _kernel_factory(metric, C, D, k, S)
    vectors_flat = vectors.reshape(-1)

    cand3 = cand.reshape(B, n_chunks, CHUNK)
    nrm3 = cand_norms.reshape(B, n_chunks, CHUNK)
    val3 = cand_valid.reshape(B, n_chunks, CHUNK)
    q3 = q.astype(jnp.float32).reshape(B, 1, D)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, CHUNK), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # flat slab stays in HBM
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
            pltpu.VMEM((CHUNK * D,), vectors.dtype),
            pltpu.VMEM((CHUNK * D,), vectors.dtype),
            pltpu.SemaphoreType.DMA((CHUNK,)),
            pltpu.SemaphoreType.DMA((CHUNK,)),
        ],
        interpret=interpret,
    )(cand3, nrm3, val3, q3, vectors_flat)

    d = out_d[:, 0, :k]
    p = out_p[:, 0, :k]
    valid = p >= 0
    d = jnp.where(valid, d, jnp.inf)
    return d, p
