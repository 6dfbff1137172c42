"""Exact top-k scan over a vector slab (shared by every index backend).

One ``lax.scan`` over slab chunks: distances ride the MXU (Gram expansion for
cosine / l2 / sql2), selection is either exact masked top-k or the TPU-native
``lax.approx_max_k`` partial reduction. This is the test oracle, the flat
index's query path, and the IVF/LSH ``exact=True`` fallback — the reference
has no exact path at all (its "exact" is LSH with every leaf visited).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zebra_tpu.ops import distances as D
from zebra_tpu.ops import topk as TK


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "precision", "approx",
                              "w_start", "w_len")
)
def exact_scan(
    vectors: jnp.ndarray,
    valid: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    power: float = 3.0,
    chunk: int = 8192,
    precision: str = "highest",
    approx: bool = False,
    scales: jnp.ndarray | None = None,
    norms: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,
    rscales: jnp.ndarray | None = None,
    w_start: int = 0,
    w_len: int | None = None,
):
    """Exact (or approx-top-k) scan of the whole slab.

    Args:
      vectors: ``[S, D]`` slab (any float dtype).
      valid: ``[S]`` bool liveness mask.
      q: ``[B, D]`` queries.
      k: selection width.
      chunk: slab rows per scan step (clamped to a divisor of S; slab
        capacities are powers of two by host-layer invariant).
      precision: MXU precision for the distance matmul ("highest"/"default").
      approx: use ``lax.approx_max_k`` (~3-8x faster on wide chunks at ~0.997
        top-10 agreement).
      norms: optional ``[S]`` squared candidate norms. When given (MXU
        metrics only), distances use these instead of norms recomputed from
        the streamed rows — required by residual-bearing int8 slabs, whose
        contract is "distances always describe the RECONSTRUCTED value"
        (``state.norms`` stores the refined |value|^2; the coarse rows
        alone would disagree with the probe kernel and break the refine
        pass's dot inversion, see distances.mxu_invert_parts).
      residual, rscales: optional ``[S, D]`` int8 residual slab + ``[S]``
        scales (refine="scan"): each streamed chunk scores against the full
        reconstruction ``scales*vectors + rscales*residual`` (~15-bit
        values; norms must also be given for MXU metrics).

      w_start, w_len (static): row WINDOW to scan (default: whole slab).
        Chunks slice from the FULL arrays per step, so scanning a window
        never materialises it — the pre-sliced spare scan was an 8GB HLO
        temp at a grown spare (round-5 churn compile OOM); returned slot
        ids are absolute.

    Returns:
      ``(dists [B, k], slots [B, k], valid [B, k])``.
    """
    S = vectors.shape[0] if w_len is None else w_len
    B = q.shape[0]
    chunk = min(chunk, S)
    if S % chunk != 0:
        chunk = S & -S if S & -S < chunk else chunk
        while S % chunk != 0:
            chunk //= 2
    n_chunks = S // chunk
    init = (
        jnp.full((B, k), jnp.inf, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
        jnp.zeros((B, k), jnp.bool_),
    )

    kb = min(k, chunk)  # lax.top_k rejects k wider than the scanned chunk

    def body(carry, i):
        start = w_start + i * chunk
        vecs = jax.lax.dynamic_slice_in_dim(vectors, start, chunk, axis=0)
        vl = jax.lax.dynamic_slice_in_dim(valid, start, chunk, axis=0)
        if scales is not None:  # int8 slab: dequantise the streamed chunk
            sc = jax.lax.dynamic_slice_in_dim(scales, start, chunk, axis=0)
            vecs = vecs.astype(jnp.float32) * sc[:, None]
            if residual is not None:  # refine="scan": full reconstruction
                r8 = jax.lax.dynamic_slice_in_dim(residual, start, chunk, axis=0)
                rs = jax.lax.dynamic_slice_in_dim(rscales, start, chunk, axis=0)
                vecs = vecs + r8.astype(jnp.float32) * rs[:, None]
        if norms is not None and metric in D.MXU_METRICS:
            xn2 = jax.lax.dynamic_slice_in_dim(norms, start, chunk, axis=0)
            dots = jnp.dot(
                q.astype(jnp.float32), vecs.astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if precision == "highest"
                           else jax.lax.Precision.DEFAULT),
            )
            qn2 = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)[:, None]
            d = D.mxu_from_parts(metric, dots, qn2, xn2[None, :])
        else:
            d = D.pairwise(q, vecs, metric=metric, power=power,
                           precision=precision)
        if approx:
            d = jnp.where(vl[None, :], d, jnp.inf)
            neg, idxs = jax.lax.approx_max_k(-d, kb)
            td = -neg
            ti = start + idxs.astype(jnp.int32)
            tv = jnp.isfinite(td)
            ti = jnp.where(tv, ti, -1)
        else:
            sl = start + jnp.arange(chunk, dtype=jnp.int32)
            td, ti, tv = TK.masked_topk(
                d,
                jnp.broadcast_to(vl[None, :], (B, chunk)),
                jnp.broadcast_to(sl[None, :], (B, chunk)),
                kb,
            )
        return TK.merge_topk(carry[0], carry[1], carry[2], td, ti, tv, k), None

    (dk, ik, vk), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return dk, ik, vk
