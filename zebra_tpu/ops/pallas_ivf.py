"""Pallas fused IVF re-rank: query-tiled cluster-block DMA + dot + top-k.

The XLA path in :mod:`zebra_tpu.index.ivf` materialises each probed cluster
block ``[B, C, D]`` in HBM (gather) and reads it back for the einsum — 3x the
necessary traffic. This kernel streams the blocks HBM->VMEM once and keeps
everything else on-chip.

Shape of the problem: each (query, probe) pair reads one contiguous
``[C, D]`` block (~0.6MB at the 1M x 768 defaults). One query per grid step
is DMA-latency-bound (measured ~45k QPS where bandwidth affords ~300k), so
the kernel processes a TILE of Q queries per step:

  * the Q blocks of probe p DMA into one ``[Q*C, D]`` buffer (double-buffered
    across p) — Q DMAs in flight per wave instead of 1;
  * ONE MXU matmul ``[Q, D] x [D, Q*C]`` scores the whole wave; each query
    keeps its diagonal ``[C]`` strip (the off-diagonal FLOPs are free — the
    MXU pass is latency-bound at these shapes);
  * top-k runs vectorised over the Q rows.

DMA alignment needs only ``D % 128`` lanes and ``C % 8`` sublanes (the host
sizes both), so 384/768-dim embeddings store unpadded — unlike the LSH
row-gather kernel (``ops/pallas_rerank.py``) whose flat-slab DMAs force
1024-f32 row alignment. Supports the MXU metrics (cosine / l2 / sql2), the
ones the reference accelerates with simsimd
(``src/distance.rs:21-31,40-48,105-113``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_K = 128  # padded top-k output width (k <= OUT_K)
BIG = 3.0e38  # sentinel for masked-out candidates
#: dead-row penalty stored in the aug lane — chosen so that BOTH its f32
#: value and its bf16 ROUNDING stay >= BIG after the dot (bf16(3.2e38) =
#: 3.20e38 > BIG; a 3.0e38 constant would round DOWN below BIG in bf16 and
#: dead rows would leak through the sentinel clamp)
PEN = 3.2e38
AUG = 128  # augmentation lanes appended to the stored dim (Mosaic lane unit)
#: per-buffer VMEM budget for the double-buffered block waves
_WAVE_BYTES = 4 << 20


def _split_bf16(x32):
    """Fold-proof f32 -> (hi, lo) bf16 split: ``x ~= hi + lo``.

    The naive split ``lo = (x - f32(bf16(x))).astype(bf16)`` MISCOMPILES to
    zero under XLA: the algebraic simplifier folds the value-changing
    ``convert_f32(convert_bf16(x))`` round-trip to ``x`` (reproduced on the
    CPU backend: every split-dot correction term vanished, caught by
    test_pallas_ivf_matches_xla once f32 'auto' used split dots; Mosaic on
    real TPU did NOT fold — the recall gains were real there — but the
    kernels also run under plain XLA in interpret mode and tests).
    Masking the low 16 mantissa bits via integer bitcast produces the SAME
    quality split (hi = bf16-truncated x, exactly representable; lo = the
    rounded residual, ~16 total mantissa bits) with no convert pair for the
    simplifier to fold. The masked value keeps x's exponent, so no denormal
    is created (this TPU flushes f32 denormals).
    """
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    hi32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi32.astype(jnp.bfloat16), (x32 - hi32).astype(jnp.bfloat16)


def _kernel_factory(metric: str, Q: int, P: int, C: int, D: int, k: int,
                    has_scales: bool = False, dots: str = "highest",
                    Ct: int = 0, switch_fetch: bool = False,
                    has_residual: bool = False):
    assert P % 2 == 0
    assert dots in ("highest", "bf16", "bf16x2", "bf16x3",
                    "bf16x2f", "bf16x3f")
    assert not (has_residual and switch_fetch)
    assert not has_residual or has_scales
    # has_residual ("scan" refine): the int8 RESIDUAL slab streams through
    # the same DMA waves as the coarse slab (same probes, same sub-tiles),
    # and every scanned row scores against the full ~15-bit reconstruction
    #   dot(q, s*v8 + r*r8) = s*dot(q, v8) + r*dot(q, r8)
    # int8 codes are exactly representable in bf16, so the hi dot rides the
    # fused split-query issue ([qhi; qlo] x v8 — ~16 query mantissa bits)
    # and the lo dot needs only qhi (the residual term is ~2^-8 of the
    # total; the dropped qlo*r8 term is ~2^-16 relative). 3 MXU passes in
    # 2 issues at 2 bytes/element of probe traffic — a bf16 slab's
    # bandwidth with better-than-bf16 stored precision, and no
    # per-candidate gather pass afterwards. dots="highest" instead runs
    # both dots as exact 6-pass f32 (the bitwise-parity path).
    # Ct > 0: partial fetch — clusters allocate rows as a contiguous prefix
    # [0, counts[c]) of their block (tombstones keep their slot), so the
    # kernel only DMAs the occupied Ct-row sub-tiles (tiles_ref holds
    # ceil(count/Ct) per (query, probe)). At the 1M x 768 defaults clusters
    # average ~48% fill, so whole-block fetches waste ~half the HBM
    # bandwidth the kernel is bound by at large batches. Two flavours:
    #   tiles  (switch_fetch=False): t separate Ct-row DMAs per probe
    #   switch (switch_fetch=True):  ONE DMA per probe whose STATIC size is
    #          picked by lax.switch over t — same exact traffic as tiles
    #          with the per-probe DMA count of block (DMA descriptors are
    #          scalar-core work that scales with Q*P*t)
    # Rows left unfetched hold stale VMEM garbage; `val` masks those rows
    # (unallocated rows are valid=0), so results are unchanged.
    n_tiles = C // Ct if Ct else 0
    assert Ct == 0 or C % Ct == 0

    def kernel(probes_ref, *rest):
        tiles_ref = None
        if Ct:
            tiles_ref, rest = rest[0], rest[1:]
        nrm_ref, val_ref, q_ref = rest[:3]
        rest = rest[3:]
        rsc_ref = res_ref = rbuf0 = rbuf1 = rsem0 = rsem1 = None
        if has_residual:
            (sc_ref, rsc_ref, vec_ref, res_ref, outd_ref, outp_ref,
             buf0, buf1, rbuf0, rbuf1, sem0, sem1, rsem0, rsem1) = rest
        elif has_scales:
            sc_ref, vec_ref, outd_ref, outp_ref, buf0, buf1, sem0, sem1 = rest
        else:
            vec_ref, outd_ref, outp_ref, buf0, buf1, sem0, sem1 = rest
            sc_ref = None
        qt = q_ref[0]  # [Q, D] (f32; bf16 when dots == "bf16")
        qt32 = qt.astype(jnp.float32)
        qn2 = jnp.sum(qt32 * qt32, axis=1)[:, None]  # [Q, 1]
        if (has_residual and dots != "highest") or dots in (
            "bf16x2", "bf16x3", "bf16x2f", "bf16x3f"
        ):
            # split-precision one-pass dots: q = q_hi + q_lo with both halves
            # bf16. Two bf16 MXU passes recover ~16 mantissa bits of the f32
            # query — vs SIX passes for a full f32 HIGHEST dot (the measured
            # kernel bottleneck, tools/abl_aux.py). Products against a bf16
            # slab are exact per pass; only the f32 accumulate orders differ.
            # bf16x3 (f32 slabs) additionally splits the BLOCK and adds the
            # qhi*blo + qlo*bhi cross terms — the classic 3-pass f32 dot
            # (the dropped qlo*blo term is below f32 rounding).
            qhi, qlo = _split_bf16(qt32)

        def wave_dma(src, buf, sem, p, qi):
            c = probes_ref[0, qi, p]
            return pltpu.make_async_copy(
                src.at[pl.ds(c * C, C), :],
                buf.at[qi],
                sem.at[qi],
            )

        def subtile_dma(src, buf, sem, p, qi, ti):
            c = probes_ref[0, qi, p]
            return pltpu.make_async_copy(
                src.at[pl.ds(c * C + ti * Ct, Ct), :],
                buf.at[qi, pl.ds(ti * Ct, Ct), :],
                sem.at[qi, ti],
            )

        def sized_dma(buf, sem, p, qi, rows):
            c = probes_ref[0, qi, p]
            return pltpu.make_async_copy(
                vec_ref.at[pl.ds(c * C, rows), :],
                buf.at[qi, pl.ds(0, rows), :],
                sem.at[qi],
            )

        def switch_on_t(buf, sem, p, qi, op):
            # ONE static-size DMA chosen by the occupied-tile count; branch
            # 0 = empty block, no DMA (val masks the whole block).
            t = tiles_ref[0, qi, p]

            def mk(rows):
                def br(_):
                    getattr(sized_dma(buf, sem, p, qi, rows), op)()
                    return jnp.int32(0)

                return br

            jax.lax.switch(
                jnp.clip(t, 0, n_tiles),
                [lambda _: jnp.int32(0)]
                + [mk(Ct * k) for k in range(1, n_tiles + 1)],
                0,
            )

        def start_wave(buf, sem, p, src=None):
            src = vec_ref if src is None else src

            def body(qi, _):
                if switch_fetch:
                    switch_on_t(buf, sem, p, qi, "start")
                elif Ct:
                    def tb(ti, _):
                        subtile_dma(src, buf, sem, p, qi, ti).start()
                        return 0

                    jax.lax.fori_loop(0, tiles_ref[0, qi, p], tb, 0)
                else:
                    wave_dma(src, buf, sem, p, qi).start()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)

        def wait_wave(buf, sem, p, src=None):
            src = vec_ref if src is None else src

            def body(qi, _):
                if switch_fetch:
                    switch_on_t(buf, sem, p, qi, "wait")
                elif Ct:
                    def tb(ti, _):
                        subtile_dma(src, buf, sem, p, qi, ti).wait()
                        return 0

                    jax.lax.fori_loop(0, tiles_ref[0, qi, p], tb, 0)
                else:
                    wave_dma(src, buf, sem, p, qi).wait()
                return 0

            jax.lax.fori_loop(0, Q, body, 0)

        def compute_residual(bufv, bufr):
            # (hi, lo) dot tiles of the reconstruction — see factory note
            dd = (((1,), (1,)), ((), ()))
            his, los = [], []
            for qi in range(Q):
                if dots == "highest":
                    his.append(jax.lax.dot_general(
                        qt32[qi : qi + 1], bufv[qi].astype(jnp.float32),
                        dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ))
                    los.append(jax.lax.dot_general(
                        qt32[qi : qi + 1], bufr[qi].astype(jnp.float32),
                        dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ))
                else:
                    qs = jnp.concatenate(
                        [qhi[qi : qi + 1], qlo[qi : qi + 1]], axis=0
                    )  # [2, D]
                    r = jax.lax.dot_general(
                        qs, bufv[qi].astype(jnp.bfloat16),
                        dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                    )  # [2, C]
                    his.append(r[0:1] + r[1:2])
                    los.append(jax.lax.dot_general(
                        qhi[qi : qi + 1], bufr[qi].astype(jnp.bfloat16),
                        dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                    ))
            return (jnp.concatenate(his, axis=0),
                    jnp.concatenate(los, axis=0))  # [Q, C] each

        def wait_compute(buf, sem, p):
            wait_wave(buf, sem, p)
            # Q unrolled small dots — query qi against ITS block only.
            # (A batched-matvec dot_general has no lhs non-contracting dims
            # and Mosaic's TPU_DotDimensionNumbersAttr rejects it; a
            # [Q, D] x [D, Q*C] full matmul needs a lane-split reshape that
            # Mosaic also rejects at C % 128 != 0. The DMA wave is what
            # amortises latency.)
            # Dot precision is the measured kernel bottleneck (abl_aux.py):
            #   highest = 6-pass f32 (exact; the r2/r3 headline path)
            #   bf16x2  = 2-pass split query (~16 query mantissa bits)
            #   bf16x2f = SAME math as bf16x2 in ONE issue — qhi/qlo ride as
            #             two lhs ROWS (row tiles pad to 128 anyway), so the
            #             MXU does half the K-tile passes of bf16x2
            #   bf16x3f = the 3-term f32-slab dot in 2 issues (both *bh
            #             terms share one [2, D] lhs)
            #   bf16    = 1-pass, bf16-rounded query (exact PRODUCTS vs a
            #             bf16 slab; only the query wire is rounded)
            dd = (((1,), (1,)), ((), ()))
            outs = []
            for qi in range(Q):
                if dots == "highest":
                    outs.append(
                        jax.lax.dot_general(
                            qt32[qi : qi + 1],
                            buf[qi].astype(jnp.float32),
                            dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    )
                elif dots == "bf16x2":
                    b16 = buf[qi].astype(jnp.bfloat16)
                    outs.append(
                        jax.lax.dot_general(
                            qhi[qi : qi + 1], b16, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            qlo[qi : qi + 1], b16, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                    )
                elif dots == "bf16x2f":
                    # FUSED split-query dot: qhi/qlo as two ROWS of one lhs.
                    # Row tiles pad to 128 on the MXU either way, so [2, D]
                    # costs the same K-tile passes as [1, D] — HALF the MXU
                    # work of bf16x2's two issues. Same math; distances match
                    # up to f32 summation order (~1e-5 rel).
                    b16 = buf[qi].astype(jnp.bfloat16)
                    qs = jnp.concatenate(
                        [qhi[qi : qi + 1], qlo[qi : qi + 1]], axis=0
                    )  # [2, D]
                    r = jax.lax.dot_general(
                        qs, b16, dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                    )  # [2, C]
                    outs.append(r[0:1] + r[1:2])
                elif dots == "bf16x3f":
                    # fused 3-term f32-slab dot: the two *bh terms share the
                    # rhs, so they ride one [2, D] x [D, C] issue; only the
                    # qhi*bl cross term needs a second issue (2 issues vs 3).
                    b32 = buf[qi].astype(jnp.float32)
                    bh, bl = _split_bf16(b32)
                    qs = jnp.concatenate(
                        [qhi[qi : qi + 1], qlo[qi : qi + 1]], axis=0
                    )  # [2, D]
                    r = jax.lax.dot_general(
                        qs, bh, dimension_numbers=dd,
                        preferred_element_type=jnp.float32,
                    )  # [2, C]
                    outs.append(
                        r[0:1]
                        + r[1:2]
                        + jax.lax.dot_general(
                            qhi[qi : qi + 1], bl, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                    )
                elif dots == "bf16x3":
                    b32 = buf[qi].astype(jnp.float32)
                    bh, bl = _split_bf16(b32)
                    outs.append(
                        jax.lax.dot_general(
                            qhi[qi : qi + 1], bh, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            qhi[qi : qi + 1], bl, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            qlo[qi : qi + 1], bh, dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                    )
                else:  # bf16
                    outs.append(
                        jax.lax.dot_general(
                            qt[qi : qi + 1].astype(jnp.bfloat16),
                            buf[qi].astype(jnp.bfloat16),
                            dimension_numbers=dd,
                            preferred_element_type=jnp.float32,
                        )
                    )
            return jnp.concatenate(outs, axis=0)  # [Q, C]

        # statically-unrolled probe pairs (P is small): per-probe [Q, C] dot
        # tiles CONCATENATE along lanes into [Q, P*C]. Everything stays 2-D —
        # a [Q, P, C] -> [Q, P*C] reshape and multi-axis reduces both hit
        # Mosaic layout-inference failures at some widths (the reshape:
        # "unsupported shape cast" at P=8, C=128; the reduce: a layout.h
        # CHECK crash).
        if has_residual:
            tiles_hi: list = [None] * P
            tiles_lo: list = [None] * P
            start_wave(buf0, sem0, 0)
            start_wave(rbuf0, rsem0, 0, res_ref)
            for a in range(0, P, 2):
                b = a + 1
                start_wave(buf1, sem1, b)
                start_wave(rbuf1, rsem1, b, res_ref)
                wait_wave(buf0, sem0, a)
                wait_wave(rbuf0, rsem0, a, res_ref)
                tiles_hi[a], tiles_lo[a] = compute_residual(buf0, rbuf0)
                if a + 2 < P:
                    start_wave(buf0, sem0, a + 2)
                    start_wave(rbuf0, rsem0, a + 2, res_ref)
                wait_wave(buf1, sem1, b)
                wait_wave(rbuf1, rsem1, b, res_ref)
                tiles_hi[b], tiles_lo[b] = compute_residual(buf1, rbuf1)
            # dequantise AFTER the dots: dot(q, s*v8 + r*r8) =
            # s*dot(q, v8) + r*dot(q, r8); norms hold the refined |value|^2
            dot = (
                jnp.concatenate(tiles_hi, axis=1) * sc_ref[0]
                + jnp.concatenate(tiles_lo, axis=1) * rsc_ref[0]
            )  # [Q, P*C]
        else:
            tiles: list = [None] * P
            start_wave(buf0, sem0, 0)
            for a in range(0, P, 2):
                b = a + 1
                start_wave(buf1, sem1, b)
                tiles[a] = wait_compute(buf0, sem0, a)  # [Q, C]
                if a + 2 < P:
                    start_wave(buf0, sem0, a + 2)
                tiles[b] = wait_compute(buf1, sem1, b)
            dot = jnp.concatenate(tiles, axis=1)  # [Q, P*C]
            if sc_ref is not None:
                # int8 slab: dequantise AFTER the dot
                # (dot(q, s*v) = s*dot(q, v))
                dot = dot * sc_ref[0]

        n2 = nrm_ref[0]  # [Q, P*C] (pre-flattened by the wrapper)
        vmask = val_ref[0] > 0
        if metric == "cosine":
            denom = jax.lax.rsqrt(jnp.maximum(qn2 * n2, 1e-30))
            d = 1.0 - dot * denom
            d = jnp.where(n2 * qn2 > 0, d, 1.0)
        else:
            d2 = jnp.maximum(qn2 + n2 - 2.0 * dot, 0.0)
            d = jnp.sqrt(d2) if metric == "l2" else d2
        d = jnp.where(vmask, d, BIG)

        lin = jax.lax.broadcasted_iota(jnp.int32, (Q, P * C), 1)
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
        outd_ref[0] = od
        outp_ref[0] = op

    return kernel


def _query_tile(C: int, D: int, itemsize: int) -> int:
    """Queries per grid step, bounded by the wave-buffer VMEM budget.

    Deeper tiles amortise per-step costs (DMA issue, pipeline turnaround);
    bf16 slabs at the 1M x 768 defaults fit Q=16 (2 x 16 x 128 x 768 x 2B =
    6.3MB of wave buffers). int8 slabs halve the per-query footprint, so the
    same budget affords Q=32 — deeper waves hide more DMA latency."""
    cap = 32 if itemsize == 1 else 16
    return max(1, min(cap, _WAVE_BYTES // max(C * D * itemsize, 1)))


@functools.partial(
    jax.jit,
    static_argnames=("cluster_capacity", "metric", "k", "interpret", "wave",
                     "dots", "fetch_kind"),
)
def pallas_ivf_rerank(vectors, cluster_capacity, q, probes, cand_norms, cand_valid,
                      metric: str = "cosine", k: int = 10, interpret: bool = False,
                      cand_scales=None, wave: int = 1, dots: str = "highest",
                      cand_tiles=None, fetch_kind: str = "",
                      residual=None, cand_rscales=None):
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
      cand_tiles: optional ``[B, P]`` int32 occupied 32-row sub-tile counts
        (ceil(counts[c]/32)); enables partial fetch.
      fetch_kind: "tiles" (t sub-tile DMAs/probe) or "switch" (one
        static-size DMA/probe via lax.switch); default "tiles" whenever
        cand_tiles is given.

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
        sub = 32 if vectors.dtype == jnp.int8 else 8
        assert C % sub == 0, (
            f"cluster capacity {C} must be a multiple of {sub} sublanes "
            f"for dtype {vectors.dtype}"
        )

    Q = _query_tile(C, D, vectors.dtype.itemsize)
    has_residual = residual is not None
    if has_residual:
        assert wave == 1 and cand_scales is not None and cand_rscales is not None
        # two slabs stream per wave: halve the per-buffer query depth so the
        # four wave buffers stay within the same VMEM budget
        Q = _query_tile(C, D, 2 * vectors.dtype.itemsize)
    padB = (-B) % Q
    if padB:
        q = jnp.pad(q, ((0, padB), (0, 0)))
        probes = jnp.pad(probes, ((0, padB), (0, 0)))
        cand_norms = jnp.pad(cand_norms, ((0, padB), (0, 0), (0, 0)))
        cand_valid = jnp.pad(cand_valid, ((0, padB), (0, 0), (0, 0)))
        if cand_scales is not None:
            cand_scales = jnp.pad(cand_scales, ((0, padB), (0, 0), (0, 0)))
        if cand_rscales is not None:
            cand_rscales = jnp.pad(cand_rscales, ((0, padB), (0, 0), (0, 0)))
        if cand_tiles is not None:
            cand_tiles = jnp.pad(cand_tiles, ((0, padB), (0, 0)))
    Bp = B + padB

    # partial fetch (see _kernel_factory Ct note): only meaningful for the
    # wave-1 kernel; 32-row sub-tiles satisfy every dtype's sublane unit
    # (f32/bf16 8, int8 32). C <= 32 has nothing to skip.
    Ct = 32 if (cand_tiles is not None and wave == 1
                and C % 32 == 0 and C > 32) else 0
    switch_fetch = bool(Ct) and fetch_kind == "switch" and not has_residual

    reduced = vectors.dtype in (jnp.bfloat16, jnp.int8)
    if wave == 2:
        # recorded-slower experimental kernel, kept selectable for A/B runs
        from zebra_tpu.ops.experimental_ivf import _kernel_factory_v2

        kernel = _kernel_factory_v2(
            metric, Q, P, C, D, k,
            has_scales=cand_scales is not None, slab_bf16_exact=reduced,
        )
    else:
        kernel = _kernel_factory(metric, Q, P, C, D, k,
                                 has_scales=cand_scales is not None, dots=dots,
                                 Ct=Ct, switch_fetch=switch_fetch,
                                 has_residual=has_residual)
    probes4 = probes.reshape(Bp // Q, Q, P)
    # flatten the probe axis OUTSIDE the kernel (XLA reshapes are free;
    # in-kernel lane merges are not Mosaic-safe at every width)
    nrm4 = cand_norms.reshape(Bp // Q, Q, P * C)
    val4 = cand_valid.reshape(Bp // Q, Q, P * C)
    # bf16 query wires: v2 on reduced slabs, and v1 with dots="bf16"
    # (one-pass MXU; norms/rerank math stays f32 either way)
    qdt = (
        jnp.bfloat16
        if (wave == 2 and reduced) or (wave == 1 and dots == "bf16")
        else jnp.float32
    )
    q3 = q.astype(qdt).reshape(Bp // Q, Q, D)

    in_specs = [
        pl.BlockSpec((1, Q, P), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Q, P * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, P * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [probes4, nrm4, val4, q3]
    if Ct:
        in_specs.insert(1, pl.BlockSpec((1, Q, P), lambda b: (b, 0, 0),
                                        memory_space=pltpu.SMEM))
        inputs.insert(1, cand_tiles.astype(jnp.int32).reshape(Bp // Q, Q, P))
    if cand_scales is not None:
        in_specs.append(
            pl.BlockSpec((1, Q, P * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(cand_scales.reshape(Bp // Q, Q, P * C))
    if has_residual:
        in_specs.append(
            pl.BlockSpec((1, Q, P * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(cand_rscales.reshape(Bp // Q, Q, P * C))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # slab stays in HBM
    inputs.append(vectors)
    if has_residual:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(residual)

    out_d, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // Q,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Q, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, OUT_K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp // Q, Q, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((Bp // Q, Q, OUT_K), jnp.int32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((Q, C, D), vectors.dtype)] * (4 if has_residual else 2)
            + [
                pltpu.SemaphoreType.DMA(
                    (Q, C // Ct) if Ct and not switch_fetch else (Q,)
                )
            ] * (4 if has_residual else 2)
        ),
        interpret=interpret,
    )(*inputs)

    d = out_d.reshape(Bp, OUT_K)[:B, :k]
    p = out_p.reshape(Bp, OUT_K)[:B, :k]
    valid = p >= 0
    d = jnp.where(valid, d, jnp.inf)
    return d, p


def ivf_rerank(state, q32, probes, k, metric: str = "cosine", wave: int = 1,
               dots: str = "highest", fetch: str = "auto",
               scan_residual: bool = False):
    """Adapter used by :func:`zebra_tpu.index.ivf.query`: gathers the probed
    blocks' norms/validity (tiny [B, P, C] f32 arrays), pads the probe axis to
    an even width, runs the kernel, and maps positions -> slab slots.

    fetch: "tiles" = DMA only the occupied 32-row sub-tiles of each probed
    block (rows live in the prefix [0, counts[c]); at ~48% average fill
    this halves the HBM traffic the kernel is bound by at large batches —
    measured +14-34% QPS on bf16 at identical recall,
    bench_results/r3_sweep_tiled_fetch.json). "block" = whole-block DMAs
    (the r2/r3 path). "auto" = tiles only when a 32-row sub-tile is >= 32KB
    (row bytes >= 1KB: f32 dim >= 256, bf16 dim >= 512): below that, per-DMA
    overhead outweighs the ~2x traffic saving — measured on int8 x 768
    (24KB sub-tiles: 1.019M vs 1.073M QPS, r3_sweep_int8_tiles.json) and
    bf16 x 128 (8KB: 1.325M vs 1.653M at P=2/65k, r3_sweep_sift_tiles.json)
    vs bf16 x 768 (48KB: tiles +14-34%, r3_sweep_tiled_fetch.json).
    """
    C = state.cluster_capacity
    B, P = probes.shape
    cand_tiles = None
    if fetch == "auto" and 32 * state.dim * state.vectors.dtype.itemsize < 32768:
        fetch = "block"
    if fetch in ("auto", "tiles", "switch") and wave == 1:
        Kc = state.num_clusters
        cnt = jnp.take(
            jax.lax.slice(state.counts, (0,), (Kc,)), probes, axis=0
        )  # [B, P] allocated rows per probed block
        cand_tiles = (cnt + 31) // 32
    pad = P % 2
    if pad:
        probes = jnp.pad(probes, ((0, 0), (0, 1)))
        if cand_tiles is not None:  # masked pad probe: fetch nothing
            cand_tiles = jnp.pad(cand_tiles, ((0, 0), (0, 1)))

    # row gathers on a [K, C] view (the spare tail is sliced off first):
    # measured 10x cheaper than vmapped per-(query, probe) dynamic slices
    K = state.num_clusters
    nrm2d = jax.lax.slice(state.norms, (0,), (K * C,)).reshape(K, C)
    val2d = (
        jax.lax.slice(state.valid, (0,), (K * C,))
        .reshape(K, C)
        .astype(jnp.float32)
    )
    nrm = jnp.take(nrm2d, probes, axis=0)  # [B, P2, C]
    val = jnp.take(val2d, probes, axis=0)
    if pad:
        val = val.at[:, -1, :].set(0.0)
    sc = None
    if state.scales is not None:  # int8 slab: per-row dequant scales
        sc2d = jax.lax.slice(state.scales, (0,), (K * C,)).reshape(K, C)
        sc = jnp.take(sc2d, probes, axis=0)
    res = rsc = None
    if scan_residual and state.residual is not None:
        # refine="scan": stream the residual slab through the same waves
        rsc2d = jax.lax.slice(state.rscales, (0,), (K * C,)).reshape(K, C)
        rsc = jnp.take(rsc2d, probes, axis=0)
        res = state.residual
    d, pos = pallas_ivf_rerank(
        state.vectors, C, q32, probes.astype(jnp.int32), nrm, val,
        metric=metric, k=k, cand_scales=sc, wave=wave, dots=dots,
        cand_tiles=cand_tiles, fetch_kind=fetch,
        residual=res, cand_rscales=rsc,
    )
    valid = pos >= 0
    posc = jnp.clip(pos, 0, probes.shape[1] * C - 1)
    cl = jnp.take_along_axis(probes, posc // C, axis=1)
    slots = jnp.where(valid, cl * C + posc % C, -1)
    return d, slots, valid
