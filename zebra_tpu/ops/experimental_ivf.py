"""Experimental / negative-result IVF wave kernels (quarantined).

These kernels are KEPT for their tests, tools and the recorded negative
results they document, but they are NOT on the shipped query path (round-3
verdict weak #8: the flagship module is for the shipped kernel only):

- ``_kernel_factory_v2`` ("pallas2", one-matmul wave): measured SLOWER than
  v1 (241k vs 255k QPS at the 1M x 768 defaults) — per-dot issue latency
  was not the kernel bottleneck, MXU pass count was
  (bench_results/r3_ann_bf16_p4_wave2.json).
- ``_kernel_factory_v3`` / the aug-slab surface (``augment_slab``,
  ``aug_query``, ``aug_post``, ``ivf_rerank_aug``): folding norms/valid
  into +128 stored lanes removes gathers that are FREE in-program (their
  separately-benched "cost" was dispatch overhead), so it only matched the
  bf16x2 fused-dot path — recorded neutral, not shipped (tools/abl_aux.py).

The shipped kernel lives in :mod:`zebra_tpu.ops.pallas_ivf`; this module
reuses its tiling helper and constants so the experiments keep running
against the current slab layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zebra_tpu.ops.pallas_ivf import AUG, BIG, OUT_K, PEN, _query_tile


def _kernel_factory_v2(metric: str, Q: int, P: int, C: int, D: int, k: int,
                       has_scales: bool, slab_bf16_exact: bool):
    """Wave kernel v2: ONE MXU matmul scores the whole wave.

    v1 issues Q small [1, D] x [D, C] dots per probe (Mosaic rejects the
    batched-matvec dot_general), whose per-dot issue latency dominates the
    kernel at the 1M x 768 defaults (~half the kernel time). v2 computes
    [Q, D] x [D, Q*C] in one pass — every query scored against every block
    in the wave — and masks the off-diagonal (query, other query's block)
    entries before selection. The wasted FLOPs are free: the MXU pass is
    tiny either way; the serial issue latency is what disappears.

    Precision: for bf16/int8 slabs the products are EXACT in one MXU pass
    (bf16 x bf16 multiplies exactly with f32 accumulation; int8 codes are
    exactly representable in bf16), so DEFAULT precision loses nothing if
    the query is bf16-rounded — which reduced-precision slabs already accept
    (see IndexOptions.query_wire). f32 slabs keep the HIGHEST 6-pass dot.

    Selection runs over the concatenated [Q, P*Q*C] lane axis; selected
    positions map back to the [P*C] probe axis at the end.
    """
    assert P % 2 == 0
    QC = Q * C

    def kernel(probes_ref, nrm_ref, val_ref, q_ref, *rest):
        if has_scales:
            sc_ref, vec_ref, outd_ref, outp_ref, buf0, buf1, sem0, sem1 = rest
        else:
            vec_ref, outd_ref, outp_ref, buf0, buf1, sem0, sem1 = rest
            sc_ref = None
        qt = q_ref[0]  # [Q, D] (f32 or bf16 — see wrapper)
        qt32 = qt.astype(jnp.float32)
        qn2 = jnp.sum(qt32 * qt32, axis=1)[:, None]  # [Q, 1]

        def wave_dma(buf, sem, p, qi):
            c = probes_ref[0, qi, p]
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(c * C, C), :],
                buf.at[qi],
                sem.at[qi],
            )

        def start_wave(buf, sem, p):
            def body(qi, _):
                wave_dma(buf, sem, p, qi).start()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)

        def wait_compute(buf, sem, p):
            def body(qi, _):
                wave_dma(buf, sem, p, qi).wait()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)
            flat = buf[...].reshape(QC, D)  # majormost merge — Mosaic-safe
            if slab_bf16_exact:
                # bf16/int8 slab: exact one-pass MXU (int8 -> bf16 is exact)
                return jax.lax.dot_general(
                    qt.astype(jnp.bfloat16),
                    flat.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Q, Q*C]
            return jax.lax.dot_general(
                qt32,
                flat.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        tiles: list = [None] * P
        start_wave(buf0, sem0, 0)
        for a in range(0, P, 2):
            b = a + 1
            start_wave(buf1, sem1, b)
            tiles[a] = wait_compute(buf0, sem0, a)  # [Q, Q*C]
            if a + 2 < P:
                start_wave(buf0, sem0, a + 2)
            tiles[b] = wait_compute(buf1, sem1, b)

        # block-diagonal mask: row qi owns cols [qi*C, (qi+1)*C) of each
        # probe's [Q, Q*C] tile
        row = jax.lax.broadcasted_iota(jnp.int32, (Q, QC), 0)
        colq = jax.lax.broadcasted_iota(jnp.int32, (Q, QC), 1)
        own = (colq // C) == row  # [Q, QC]

        parts_d = []
        for p in range(P):
            dot = tiles[p]
            # per-probe aux strips [Q, C], tiled Q times along lanes so the
            # diagonal blocks line up (off-diagonal values are masked away)
            n2s = nrm_ref[0][:, p * C : (p + 1) * C]
            vs = val_ref[0][:, p * C : (p + 1) * C]
            n2t = jnp.concatenate([n2s] * Q, axis=1)  # [Q, QC]
            vt = jnp.concatenate([vs] * Q, axis=1)
            if sc_ref is not None:
                scs = sc_ref[0][:, p * C : (p + 1) * C]
                dot = dot * jnp.concatenate([scs] * Q, axis=1)
            if metric == "cosine":
                denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2t, 1e-30))
                dd = 1.0 - dot * denom
                dd = jnp.where(n2t * qn2 > 0, dd, 1.0)
            else:
                d2 = jnp.maximum(qn2 + n2t - 2.0 * dot, 0.0)
                dd = jnp.sqrt(d2) if metric == "l2" else d2
            parts_d.append(jnp.where(own & (vt > 0), dd, BIG))
        d = jnp.concatenate(parts_d, axis=1)  # [Q, P*QC]

        lin = jax.lax.broadcasted_iota(jnp.int32, (Q, P * QC), 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (Q, OUT_K), 1)

        def select(j, carry):
            dd, od, op = carry
            m = jnp.min(dd, axis=1, keepdims=True)  # [Q, 1]
            li = jnp.min(
                jnp.where(dd == m, lin, jnp.int32(2**30)), axis=1, keepdims=True
            )
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
                jnp.full((Q, OUT_K), BIG, jnp.float32),
                jnp.full((Q, OUT_K), -1, jnp.int32),
            ),
        )
        # map the global [P*QC] position back to the [P*C] probe axis:
        # gpos = p*QC + qi*C + c  ->  p*C + c
        valid_op = op >= 0
        op_pc = jnp.where(valid_op, (op // QC) * C + op % C, -1)
        outd_ref[0] = od
        outp_ref[0] = op_pc

    return kernel


def _kernel_factory_v3(Q: int, P: int, C: int, D: int, k: int, exact: bool):
    """Wave kernel v3: AUGMENTED slab — no aux inputs at all.

    The stored rows carry their own re-rank epilogue in extra lanes (see
    :func:`zebra_tpu.index.ivf_aug.augment_rows`): a penalty lane (0 live,
    3e38 dead/empty) and, for l2/sql2, the split-precision squared norm.
    The query is pre-transformed so that ONE dot per (query, block) yields
    a value whose per-query ranking equals the true distance ranking:

      cosine:  w = [-q/|q|, 1, 0, 0]   d_raw = -cos(q, v) + penalty
      l2/sql2: w = [-2q,    1, 1, 1]   d_raw = |v|^2 - 2 q.v + penalty

    so the kernel is: DMA waves -> one dot -> top-k select. No norm/valid
    gathers outside, no [B, P, C] aux pipeline through VMEM, no in-kernel
    mask math — dead rows select to BIG and map to pos=-1 exactly like v1.
    The +128 aug lanes cost D/(D+128) extra DMA bytes (16.7% at 768), which
    the measured kernel is not bound by; the aux stages they replace are
    the measured cost (see tools/abl_aux.py).

    ``exact``: f32 HIGHEST dots (parity with v1); False = one-pass bf16
    (exact for bf16 slabs when the query wire is bf16-rounded, see v2 note).
    """
    assert P % 2 == 0

    def kernel(probes_ref, q_ref, vec_ref, outd_ref, outp_ref, buf0, buf1,
               sem0, sem1):
        qt = q_ref[0]  # [Q, Daug]

        def wave_dma(buf, sem, p, qi):
            c = probes_ref[0, qi, p]
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(c * C, C), :], buf.at[qi], sem.at[qi]
            )

        def start_wave(buf, sem, p):
            def body(qi, _):
                wave_dma(buf, sem, p, qi).start()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)

        def wait_compute(buf, sem, p):
            def body(qi, _):
                wave_dma(buf, sem, p, qi).wait()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)
            outs = []
            for qi in range(Q):
                if exact:
                    outs.append(
                        jax.lax.dot_general(
                            qt[qi : qi + 1].astype(jnp.float32),
                            buf[qi].astype(jnp.float32),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    )
                else:
                    outs.append(
                        jax.lax.dot_general(
                            qt[qi : qi + 1],
                            buf[qi],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
            return jnp.concatenate(outs, axis=0)  # [Q, C] raw distances

        tiles: list = [None] * P
        start_wave(buf0, sem0, 0)
        for a in range(0, P, 2):
            b = a + 1
            start_wave(buf1, sem1, b)
            tiles[a] = wait_compute(buf0, sem0, a)
            if a + 2 < P:
                start_wave(buf0, sem0, a + 2)
            tiles[b] = wait_compute(buf1, sem1, b)
        d = jnp.concatenate(tiles, axis=1)  # [Q, P*C] — already distances
        d = jnp.minimum(d, BIG)  # clamp the dead-row sentinel to BIG exactly

        lin = jax.lax.broadcasted_iota(jnp.int32, (Q, P * C), 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (Q, OUT_K), 1)

        def select(j, carry):
            dd, od, op = carry
            m = jnp.min(dd, axis=1, keepdims=True)
            li = jnp.min(
                jnp.where(dd == m, lin, jnp.int32(2**30)), axis=1, keepdims=True
            )
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
                jnp.full((Q, OUT_K), BIG, jnp.float32),
                jnp.full((Q, OUT_K), -1, jnp.int32),
            ),
        )
        outd_ref[0] = od
        outp_ref[0] = op

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cluster_capacity", "k", "exact", "interpret"),
)
def pallas_ivf_rerank_aug(vectors_aug, cluster_capacity, w, probes,
                          k: int = 10, exact: bool = True,
                          interpret: bool = False):
    """Aux-free fused re-rank over an AUGMENTED slab.

    Args:
      vectors_aug: ``[K*C + G, D + 128]`` augmented cluster-contiguous slab.
      w: ``[B, D + 128]`` pre-transformed queries (see _kernel_factory_v3).
      probes: ``[B, P]`` int32 cluster ids, P even (pad with a DUPLICATE of
        probe 0 and post-filter, or any in-range id — dead/duplicate rows
        cost nothing: duplicates select twice but the caller's slot map is
        identical, and Database-level results dedup by id).

    Returns: ``(d_raw [B, k], pos [B, k])`` — pos on the flat [P*C] probe
    axis, -1 where fewer than k live candidates exist.
    """
    B, P = probes.shape
    S, Daug = vectors_aug.shape
    C = cluster_capacity
    assert P % 2 == 0
    assert k <= OUT_K
    if not interpret:
        assert Daug % 128 == 0
        sub = 8
        assert C % sub == 0

    Q = _query_tile(C, Daug, vectors_aug.dtype.itemsize)
    padB = (-B) % Q
    if padB:
        w = jnp.pad(w, ((0, padB), (0, 0)))
        probes = jnp.pad(probes, ((0, padB), (0, 0)))
    Bp = B + padB

    kernel = _kernel_factory_v3(Q, P, C, Daug, k, exact)
    probes4 = probes.reshape(Bp // Q, Q, P)
    qdt = jnp.float32 if exact else vectors_aug.dtype
    q3 = w.astype(qdt).reshape(Bp // Q, Q, Daug)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // Q,),
        in_specs=[
            pl.BlockSpec((1, Q, P), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q, Daug), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, Q, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp // Q, Q, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((Bp // Q, Q, OUT_K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, C, Daug), vectors_aug.dtype),
            pltpu.VMEM((Q, C, Daug), vectors_aug.dtype),
            pltpu.SemaphoreType.DMA((Q,)),
            pltpu.SemaphoreType.DMA((Q,)),
        ],
        interpret=interpret,
    )(probes4, q3, vectors_aug)

    d = out_d.reshape(Bp, OUT_K)[:B, :k]
    p = out_p.reshape(Bp, OUT_K)[:B, :k]
    d = jnp.where(p >= 0, d, jnp.inf)
    return d, p


@functools.partial(jax.jit, static_argnames=("metric",))
def augment_slab(vectors, norms, valid, metric: str = "cosine"):
    """One-shot derivation of the augmented slab ``[S, D + AUG]``.

    Lane layout of the AUG tail: lane 0 = dead-row penalty (0 live, PEN
    dead/empty), lanes 1-2 = split-precision squared norm (hi + lo; zero for
    cosine, whose body rows are L2-NORMALISED so the norm is implicit), rest
    zero. Cosine distances are scale-invariant in the stored vector, so the
    normalised body yields IDENTICAL cosine results to the raw rows.
    """
    S, D = vectors.shape
    dt = vectors.dtype
    v32 = vectors.astype(jnp.float32)
    if metric == "cosine":
        body = v32 * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))[:, None]
        nhi = jnp.zeros_like(norms)
        nlo = nhi
    else:
        body = v32
        # split so a bf16 slab keeps ~16 mantissa bits of |v|^2: hi is the
        # dtype rounding, lo the f32 remainder (both exact in f32 for f32)
        nhi = norms.astype(dt).astype(jnp.float32)
        nlo = norms - nhi
    pen = jnp.where(valid, 0.0, PEN).astype(jnp.float32)
    aug = (
        jnp.zeros((S, AUG), jnp.float32)
        .at[:, 0].set(pen)
        .at[:, 1].set(nhi)
        .at[:, 2].set(nlo)
    )
    return jnp.concatenate([body, aug], axis=1).astype(dt)


def aug_query(q32, metric: str = "cosine"):
    """Pre-transform queries for the v3 kernel: ``[B, D] -> [B, D + AUG]``.

    cosine: ``[-q/|q|, 1, 1, 1, 0...]`` — the dot gives ``-cos + penalty``;
    l2/sql2: ``[-2q, 1, 1, 1, 0...]`` — the dot gives ``|v|^2 - 2 q.v +
    penalty`` (the per-query ``|q|^2`` constant is added after selection —
    it never changes the ranking).
    """
    B, D = q32.shape
    if metric == "cosine":
        qn2 = jnp.sum(q32 * q32, axis=1)
        wq = -q32 * jax.lax.rsqrt(jnp.maximum(qn2, 1e-30))[:, None]
    else:
        wq = -2.0 * q32
    aug = jnp.zeros((B, AUG), jnp.float32).at[:, 0:3].set(1.0)
    return jnp.concatenate([wq, aug], axis=1)


def aug_post(d_raw, q32, metric: str):
    """Map raw kernel values back to true distances (valid entries only)."""
    if metric == "cosine":
        return 1.0 + d_raw
    qn2 = jnp.sum(q32 * q32, axis=1)[:, None]
    d2 = jnp.maximum(qn2 + d_raw, 0.0)
    return jnp.sqrt(d2) if metric == "l2" else d2


def ivf_rerank_aug(vectors_aug, C: int, q32, probes, k: int,
                   metric: str = "cosine", exact: bool = True,
                   interpret: bool = False):
    """Adapter for the aux-free v3 kernel: transform queries, run, map the
    flat probe-axis positions back to slab slots, post-transform distances.

    ``probes`` must have an EVEN width of REAL cluster ids (when the caller
    wants an odd probe count it probes one more real cluster instead of
    masking a pad — see ivf.query)."""
    B, P = probes.shape
    assert P % 2 == 0, "v3 probes must be even (probe one more real cluster)"
    w = aug_query(q32, metric)
    d_raw, pos = pallas_ivf_rerank_aug(
        vectors_aug, C, w, probes.astype(jnp.int32), k=k, exact=exact,
        interpret=interpret,
    )
    valid = pos >= 0
    posc = jnp.clip(pos, 0, P * C - 1)
    cl = jnp.take_along_axis(probes, posc // C, axis=1)
    slots = jnp.where(valid, cl * C + posc % C, -1)
    d = jnp.where(valid, aug_post(d_raw, q32, metric), jnp.inf)
    return d, slots, valid

