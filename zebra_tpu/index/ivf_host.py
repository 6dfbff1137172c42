"""Host orchestration for the IVF cluster-block backend.

IVF-specific host logic on top of :class:`zebra_tpu.index.base.BaseVectorIndex`:
k-means training, cluster-capacity sizing, spill-overflow handling (grow
capacity and retry — a vector is NEVER silently dropped), retrain-on-growth,
and snapshots. The device half is :mod:`zebra_tpu.index.ivf`.

Slot assignment is data-dependent (nearest centroid with room), so unlike the
LSH bump allocator the host cannot mirror it — each insert batch reads back
one int32 per vector. That is 4 bytes against the ~3KB/vector host->device
payload (<1% of wire time even on this box's slow readback tunnel), and it is
what makes every probe a contiguous block read at query time.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import ivf as V
from zebra_tpu.index.base import _MIN_BATCH, BATCH, BaseVectorIndex, slab_from_np
from zebra_tpu.ops.kmeans import kmeans
from zebra_tpu.profiling import logger
from zebra_tpu.utils import device_sync, next_pow2

#: HBM budget the cold build fits (slab + staged transfer window) inside —
#: conservative for a 16GB v5e chip, leaving room for k-means tiles, the
#: f32 training sample, and insert working buffers.
_STAGE_HBM_BUDGET = 12 << 30

#: retrain when live vectors outgrow the built size by this factor
_REBUILD_GROWTH = 4.0
#: compact when tombstones exceed this fraction of allocated slots
_COMPACT_TOMBSTONES = 0.5
#: capacity-grow retries per batch before giving up (2^8 growth = plenty)
_MAX_GROWS = 8


@functools.partial(jax.jit, static_argnames=("rows",))
def _dequant_coarse_bf16(v8, qs, rows: int):
    """Coarse bf16 reconstruction of a staged quantised batch's leading rows
    (cold-build k-means sample; int8 -> bf16 casts are exact)."""
    return v8[:rows].astype(jnp.bfloat16) * qs[:rows, 0, None].astype(jnp.bfloat16)


def resolved_clusters(options: IndexOptions, n: int) -> int:
    """Partition count for ~n vectors (shared with the sharded wrapper).

    ~n/64 per cell, NOT the classic ~4*sqrt(n): centroid scoring is one MXU
    matmul (nearly free on TPU), while probe traffic scales with cell width —
    and with fewer centroids than natural clusters, high-dim k-means grows
    pathological hub cells (measured: K=4096 on 1M x 768 blobby data -> max
    load 13k, 22% overflow; K=16384 -> max 193, ~0%)."""
    if options.num_clusters > 0:
        return options.num_clusters
    return int(min(next_pow2(max(n // 64, 8)), 131072, next_pow2(max(n // 4, 8))))


def _slot_hbm_bytes(options: IndexOptions, dim: int) -> int:
    """Device bytes one slab slot costs (slightly conservative: scales /
    rscales / norms / valid lumped as a flat 13B/row) — sizing only."""
    if options.dtype == "int8":
        per = dim * (2 if options.refine_enabled() else 1)
    elif options.dtype == "bfloat16":
        per = 2 * dim
    else:
        per = 4 * dim
    return per + 13


def resolved_capacity(options: IndexOptions, n: int, k: int, dim: int = 0) -> int:
    """Per-cluster block width: 2x mean load rounded to the dtype's sublane
    tile (16 for f32/bf16, 32 for int8 — pallas DMA alignment), NOT a power
    of two — probe traffic scales with C, padding is QPS.

    With ``dim`` given, the padding multiplier steps down (2x -> 1.25x
    mean) until the whole slab fits 85% of ``_STAGE_HBM_BUDGET`` — at
    capacity scale the 2x headroom is HBM the chip doesn't have (round 5:
    a bare 4M x 768 int8+residual build resolved 2.2n slots = 13.4GB and
    OOMed a 16GB v5e mid-insert; 1.55x-effective fits). Skew the smaller
    padding can't absorb lands in the spare and is rebalanced by the
    background retrain, same as growth. The 1M x 768 headline sizing is
    unchanged (its slab is far under budget at every multiplier)."""
    unit = 32 if options.dtype == "int8" else 16
    if options.cluster_capacity > 0:
        return options.cluster_capacity
    mean = -(-n // k)

    def rup(x: float) -> int:
        return max(-(-int(x) // unit) * unit, unit)

    if dim <= 0:
        return rup(2 * mean)
    spare = resolved_spare(options, n)
    budget = int(0.85 * _STAGE_HBM_BUDGET)
    per = _slot_hbm_bytes(options, dim)
    cap = unit
    for mult in (2.0, 1.75, 1.5, 1.375, 1.25):
        cap = rup(mult * mean)
        if (k * cap + spare) * per <= budget:
            return cap
    return cap  # 1.25x floor: past this, HBM admission is the backstop


def resolved_spare(options: IndexOptions, n: int) -> int:
    """Shared overflow-heap rows (~6% of n): one [G, D] matmul per query
    batch when non-empty — cheap insurance against partition skew."""
    if options.spare_capacity > 0:
        return options.spare_capacity
    return next_pow2(max(n // 16, 1024))


class IVFIndex(BaseVectorIndex):
    """Single-shard IVF index: learned partitions, cluster-contiguous slab.

    The TPU-first answer to the reference's LSH forest: same API, same
    recall regime, but probes are block DMAs instead of row gathers (see
    the design note in :mod:`zebra_tpu.index.ivf`).
    """

    _BACKEND = "ivf"

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        options: IndexOptions | None = None,
        metric_power: float = 3.0,
    ):
        super().__init__(dim, metric, options, metric_power)
        r = self.options.refine
        if not (r == "scan" or (isinstance(r, int) and r >= 0)):
            raise ValueError(
                f"refine must be a non-negative int or 'scan', got {r!r}"
            )
        if self.options.refine_enabled() and self.options.dtype != "int8":
            raise ValueError(
                "refine stores an int8 quantisation residual and needs "
                "dtype='int8' (f32/bf16 slabs have no residual to refine)"
            )
        # Pallas block re-rank DMAs 2-D [C, D] tiles: last dim must be a
        # multiple of 128 lanes (any float dtype) — a far lighter constraint
        # than the LSH kernel's 1024-element flat-slab alignment.
        if self.options.rerank in ("pallas", "pallas2"):
            self._dev_dim = -(-self.dim // 128) * 128
        self.state: V.IVFState | None = None
        #: host mirrors of slot occupancy, derived from resolved insert slots
        #: (slot // C is the cluster) — the growth policy then never reads
        #: device counts back per mutation (a ~30ms sync on this box's
        #: tunnel after EVERY add/remove)
        self._used_slots = 0
        self._spare_used = 0

    # -- sizing ----------------------------------------------------------------

    def _resolved_clusters(self, n: int) -> int:
        return resolved_clusters(self.options, n)

    def _resolved_capacity(self, n: int, k: int) -> int:
        return resolved_capacity(self.options, n, k, dim=self._dev_dim)

    def _resolved_spare(self, n: int) -> int:
        return resolved_spare(self.options, n)

    # -- build -------------------------------------------------------------------

    def _train_centroids(self, k: int, data) -> jnp.ndarray:
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        if data is None or data.shape[0] < 2:
            cents = jax.random.normal(key, (k, self._dev_dim), dtype=jnp.float32)
            if self._dev_dim != self.dim:
                cents = cents.at[:, self.dim :].set(0.0)
            return cents
        sample_n = min(data.shape[0], max(self.options.kmeans_sample, 4 * k))
        if sample_n < data.shape[0]:
            idx = np.sort(self._rng.choice(data.shape[0], size=sample_n, replace=False))
        else:
            idx = None
        if isinstance(data, jnp.ndarray):  # rebuild path: stay on device
            sample = data if idx is None else jnp.take(data, jnp.asarray(idx), axis=0)
            # keep floating samples in their wire dtype — kmeans casts chunks
            # to f32 INSIDE its jit, so an eager astype here is a second
            # whole-sample HBM copy (1.6GB at the 10M auto sizing's 524k-row
            # f32 target; the round-3 10M OOM)
            if not jnp.issubdtype(sample.dtype, jnp.floating):
                sample = sample.astype(jnp.float32)
            padded = next_pow2(sample.shape[0])
            if padded != sample.shape[0]:
                sample = jnp.pad(sample, ((0, padded - sample.shape[0]), (0, 0)))
        else:
            host = np.asarray(data, np.float32) if idx is None else np.asarray(data, np.float32)[idx]
            host = self._pad_dim(host)
            padded = next_pow2(host.shape[0])
            if padded != host.shape[0]:
                host = np.pad(host, ((0, padded - host.shape[0]), (0, 0)))
            sample = jnp.asarray(host)
        # Lloyd's [chunk, K] distance tile must stay ~1GB: the default
        # 65536-row chunk is fine through K=32768 (the 1M flagship trains
        # exactly as measured), but at the 10M auto sizing (K=131072) it
        # would be a 34GB tile.
        chunk = 65536 if k <= 32768 else max(2048, (1 << 28) // k)
        if getattr(self, "_paced_train", False):
            # background-retrain shadow: one dispatch per Lloyd pass so
            # concurrent foreground queries wait at most ~one pass, not the
            # whole training run (round-4 verdict #2)
            from zebra_tpu.ops.kmeans import kmeans_paced

            cents, _counts = kmeans_paced(
                key, sample, jnp.int32(sample_n), k=k,
                iters=self.options.kmeans_iters, chunk=chunk,
                balance_rounds=self.options.kmeans_balance_rounds,
            )
            return cents
        cents, _counts = kmeans(
            key,
            sample,
            jnp.int32(sample_n),
            k=k,
            iters=self.options.kmeans_iters,
            chunk=chunk,
            balance_rounds=self.options.kmeans_balance_rounds,
        )
        return cents

    def _start_kmeans_warm(self, train_spans, per: int, k: int):
        """Background AOT compile of the exact kmeans program the cold
        build is about to run (see ``ops.kmeans.warm_compile``). Returns the
        thread (join before training) or None. Mirrors _train_centroids'
        sample sizing: concat of ``min(per, count)`` rows per leading span,
        host-subsampled to the target, padded to the next power of two."""
        import threading

        from zebra_tpu.ops.kmeans import warm_compile

        # The warm thread runs a compile CONCURRENT with the main thread's
        # staging transfers. On local backends (cpu/tpu/gpu) that is plain
        # thread-safe JAX; this box's remote axon transport has documented
        # multi-minute service stalls and the extra in-flight compile is
        # not worth entangling with them — skip unless explicitly enabled.
        backend = jax.default_backend()
        if backend not in ("tpu", "gpu", "cuda", "rocm") and not os.environ.get(
            "ZEBRA_KMEANS_WARM"
        ):
            # cpu additionally excluded by default: a CPU process that
            # enabled the persistent cache would have the warm thread WRITE
            # a CPU executable into it — the cache-write class that
            # segfaults this jaxlib (round-4 advisor)
            return None
        # The AOT result is only reachable from the later traced call via
        # the persistent compilation cache; warm ONLY when the process
        # already enabled one (utils.enable_compile_cache — every TPU
        # script here does). Never enable it from LIBRARY code: writing
        # CPU executables to the persistent cache SEGFAULTS this jaxlib
        # (pallas CPU kernels — found by the round-4 full-suite run), so
        # the CPU test suite must stay cache-less.
        if not getattr(jax.config, "jax_compilation_cache_dir", None):
            return None
        rows = sum(min(per, c) for _, c in train_spans)
        sample_n = min(rows, max(self.options.kmeans_sample, 4 * k))
        padded = next_pow2(sample_n)
        if self._quant_wire:
            import ml_dtypes

            dtype = ml_dtypes.bfloat16  # _staged_rows dequantises to bf16
        else:
            dtype = self._wire_dtype
        # must match _train_centroids' chunk rule exactly
        chunk = 65536 if k <= 32768 else max(2048, (1 << 28) // k)

        def _warm():
            try:
                warm_compile(
                    padded, self._dev_dim, dtype, k=k,
                    iters=self.options.kmeans_iters, chunk=chunk,
                    balance_rounds=self.options.kmeans_balance_rounds,
                )
            except Exception:
                logger.info("kmeans AOT warm failed (harmless)", exc_info=True)

        t = threading.Thread(target=_warm, name="zebra-kmeans-warm", daemon=True)
        t.start()
        return t

    def _fresh_state(self, n_hint: int, data: np.ndarray | None) -> V.IVFState:
        k = self._resolved_clusters(n_hint)
        cap = self._resolved_capacity(n_hint, k)
        spare = self._resolved_spare(n_hint)
        cents = self._train_centroids(k, data)
        return V.empty_state(
            cents, cap, spare, dtype=self.dtype,
            refine=self.options.refine_enabled(),
        )

    def _abstract_state(self, n_hint: int) -> V.IVFState:
        """ShapeDtypeStruct pytree of the state :meth:`_fresh_state` would
        build for ``n_hint`` rows — same sizing helpers, no allocation, no
        training. Drives the first-shape AOT warm (and is shape-asserted
        against a real build in tests so the two can never drift)."""
        from jax import ShapeDtypeStruct as SDS

        k = self._resolved_clusters(n_hint)
        cap = self._resolved_capacity(n_hint, k)
        spare = self._resolved_spare(n_hint)
        S = k * cap + spare
        d = self._dev_dim
        slab = np.dtype(self.dtype)
        int8 = slab == np.dtype(np.int8)
        refined = int8 and self.options.refine_enabled()
        f32, i32 = np.dtype(np.float32), np.dtype(np.int32)
        return V.IVFState(
            centroids=SDS((k, d), f32),
            counts=SDS((k + 1,), i32),
            vectors=SDS((S, d), slab),
            norms=SDS((S,), f32),
            valid=SDS((S,), np.dtype(np.bool_)),
            overflow=SDS((), i32),
            scales=SDS((S,), f32) if int8 else None,
            residual=SDS((S, d), np.dtype(np.int8)) if refined else None,
            rscales=SDS((S,), f32) if refined else None,
            ccap=cap,
        )

    def warm_shapes(self, n_hint: int, qbatch: int = 1024, k: int = 10):
        """Background AOT compile of the FIRST insert-span and query
        programs for a cold index sized to ``n_hint`` (round-4 verdict #6:
        the text pipeline's cold half was 93% first-batch remote compiles,
        and only k-means was pre-warmed). Called by the facade before the
        embedding stage, so the compiles ride the compile service WHILE the
        towers embed — by the time the index sees vectors, the persistent
        cache already holds the executables.

        Same gating as the k-means warm (local tpu/gpu backends, or
        ZEBRA_SHAPE_WARM=1 to opt in on axon; a persistent compile cache
        must be enabled — without one the warmed executables are
        unreachable from the later real call). Returns the thread or None.
        """
        import threading

        if self.state is not None:
            return None
        backend = jax.default_backend()
        if backend not in ("tpu", "gpu", "cuda", "rocm") and not os.environ.get(
            "ZEBRA_SHAPE_WARM"
        ):
            return None
        if not getattr(jax.config, "jax_compilation_cache_dir", None):
            return None
        def _warm():
            try:
                self._warm_shape_programs(n_hint, qbatch, k)
            except Exception:
                logger.info("first-shape AOT warm failed (harmless)",
                            exc_info=True)

        t = threading.Thread(target=_warm, name="zebra-shape-warm", daemon=True)
        t.start()
        return t

    def _warm_shape_programs(self, n_hint: int, qbatch: int, k: int) -> None:
        """Synchronous body of :meth:`warm_shapes`: lower + compile the
        first insert-span program and the serving-shape query program
        against the abstract state. Every static argument mirrors the real
        call sites (`_insert_batch_dev`, `_query_device`) — the shape test
        asserts the abstract state cannot drift from a real build."""
        from jax import ShapeDtypeStruct as SDS

        st = self._abstract_state(n_hint)
        spans = self._spans(n_hint)
        padded = next_pow2(max(min(spans[0][1], self._span_width()), _MIN_BATCH))
        qp = next_pow2(max(qbatch, 8))
        f32 = np.dtype(np.float32)
        d = self._dev_dim
        refined = st.residual is not None
        if self.options.query_wire_is_bf16():
            import ml_dtypes

            qdtype = np.dtype(ml_dtypes.bfloat16)
        else:
            qdtype = f32
        rerank = self.options.rerank
        if rerank.startswith("pallas") and jax.default_backend() == "cpu":
            rerank = "xla"  # mirror _query_device exactly
        nv = SDS((), np.dtype(np.int32))
        if self._quant_wire:
            V.insert_quant.lower(
                st, SDS((padded, d), np.dtype(np.int8)),
                SDS((padded, d), np.dtype(np.int8)),
                SDS((padded, 2), f32), nv,
                spill=self.options.spill, metric=self._cell_metric,
            ).compile()
        else:
            V.insert.lower(
                st, SDS((padded, d), np.dtype(self._wire_dtype)), nv,
                spill=self.options.spill, metric=self._cell_metric,
            ).compile()
        V.query.lower(
            st, SDS((qp, d), qdtype), k, metric=self.metric,
            num_probes=self.options.resolved_probes(),
            power=self.metric_power, rerank=rerank,
            rerank_dots=self.options.rerank_dots,
            probe_sel=self.options.probe_sel,
            refine_k=self.options.refine_k(k) if refined else 0,
            refine_scan=refined and self.options.refine_is_scan(),
        ).compile()

    @staticmethod
    def _aot_cache_ready() -> bool:
        """Patchable seam (tests): AOT-warmed executables are reachable by
        the later jit call only through the persistent compilation cache."""
        return bool(getattr(jax.config, "jax_compilation_cache_dir", None))

    def warm_query_aot(self, shapes) -> int:
        """AOT-compile the serving query program for the given
        ``(padded_qbatch, k)`` shapes against an ABSTRACT snapshot of the
        CURRENT state (shape/dtype only — no locks, no execution, no
        donation hazard; safe concurrent with mutations). Executables land
        in the persistent compilation cache, which the next real query
        call hits instead of recompiling — the round-5 10M churn measured
        a ~70s reader stall on the first query after an inline spare
        growth (131k -> 1M rows changed the state shapes). Requires an
        enabled persistent cache (without one the AOT objects are
        unreachable from the later jit call); returns shapes compiled.
        """
        st = self.state
        if st is None or not shapes:
            return 0
        if not self._aot_cache_ready():
            return 0
        from jax import ShapeDtypeStruct as SDS

        ast = jax.tree_util.tree_map(lambda x: SDS(x.shape, x.dtype), st)
        if self.options.query_wire_is_bf16():
            import ml_dtypes

            qdtype = np.dtype(ml_dtypes.bfloat16)
        else:
            qdtype = np.dtype(np.float32)
        rerank = self.options.rerank
        if rerank.startswith("pallas") and jax.default_backend() == "cpu":
            rerank = "xla"  # mirror _query_device exactly
        done = 0
        for padded, k in shapes:
            V.query.lower(
                ast, SDS((int(padded), self._dev_dim), qdtype), int(k),
                metric=self.metric,
                num_probes=self.options.resolved_probes(),
                power=self.metric_power, rerank=rerank,
                rerank_dots=self.options.rerank_dots,
                probe_sel=self.options.probe_sel,
                refine_k=self._refine_k(int(k)),
                refine_scan=self._refine_scan(),
            ).compile()
            done += 1
        return done

    def _cold_build(self, vectors, ids) -> bool:
        """First build: queue an HBM-budgeted window of insert-batch
        host->device transfers first (async device_put), train k-means on a
        device-side sample of the staged batches, then insert from the
        staged buffers (live-staging any spans beyond the window).

        The k-means training sample never ships separately (it was a second
        multi-hundred-MB upload), and training compute overlaps the tail of
        the staging transfers — on a wire-bound link the whole cold build
        costs ~the slab transfer alone (round-2: 98.4s at 1M x 768; the
        wire floor is ~30s).
        """
        if isinstance(vectors, jnp.ndarray) or vectors.shape[0] < 2 * BATCH:
            return False  # small/device builds: the generic path is fine
        n = vectors.shape[0]
        spans = self._spans(n)
        nb = len(spans)
        # HBM-BUDGETED staging window: prestage as many transfers as fit
        # alongside the slab about to be allocated. At 1M x 768 (bf16 slab
        # 3.3GB) every batch prestages — the measured cold-build behaviour.
        # At 10M x 768 int8 the slab alone is ~10-13GB, and prestaging all
        # 153 batches (15.3GB of bf16 wire buffers) is a guaranteed OOM;
        # the window holds a few GB in flight and _insert_batches' 1-deep
        # lookahead keeps transfers overlapping inserts for the rest.
        k = self._resolved_clusters(n)
        slots = k * self._resolved_capacity(n, k) + self._resolved_spare(n)
        slab_bytes = slots * self._dev_dim * np.dtype(self.dtype).itemsize
        slab_bytes += slots * 9 + k * self._dev_dim * 4  # norms/valid/scales + cents
        if self.options.refine_enabled() and self.options.dtype == "int8":
            slab_bytes += slots * (self._dev_dim + 4)  # residual + rscales
        batch_bytes = next_pow2(max(spans[0][1], 1)) * self._wire_row_bytes
        budget = max(_STAGE_HBM_BUDGET - slab_bytes, 2 * batch_bytes)
        window = int(min(nb, max(budget // batch_bytes, 2)))
        staged: list = [None] * nb
        from zebra_tpu.profiling import timed

        target = max(self.options.kmeans_sample, 4 * k)
        # sample from a LEADING slice of the staged window only: training
        # then starts as soon as those land, while the remaining windowed
        # transfers stream in parallel with the k-means compute (sampling
        # from every batch would serialise training behind the LAST one).
        # The slice must still cover the full sample target — at K=131072
        # the 4K lower bound needs 8 full batches, not the window quarter.
        need = -(-target // max(spans[0][1], 1))
        train_len = max(min(4, window), min(window, need))
        per = max(min(target // train_len, spans[0][1]), 1)
        # AOT-warm the k-means compile on a background thread: the remote
        # compile rides the tunnel's compile service WHILE the staged
        # transfers below stream, instead of serialising after them
        # (tools/profile_kmeans.py: ~28s of r4's 100.8s ivf.train was
        # compile). The plan below mirrors _train_centroids' exact sample
        # shape so the warmed executable is the one the real call loads.
        warm = self._start_kmeans_warm(spans[:train_len], per, k)
        with timed("ivf.prestage", items=sum(spans[i][1] for i in range(window))):
            for i in range(window):
                staged[i] = self._stage_span(vectors, spans[i])
        train = list(zip(staged, spans))[:train_len]
        # clip each slice to the span's REAL row count (the last batch is
        # zero-padded; zeros in the sample would grow a parasitic centroid).
        # The sample stays in the WIRE dtype (bf16 for bf16/int8 slabs):
        # kmeans casts per-chunk inside its jit, and an f32 copy here doubles
        # the training footprint (1.6GB at the 10M sizing's 524k-row target).
        sample = jnp.concatenate(
            [self._staged_rows(b, min(per, sp[1])) for b, sp in train], axis=0
        )
        # Train BEFORE allocating the slab, and free the sample in between:
        # at 10M x 768 int8 the slab is ~10.5GB — allocated while the sample
        # + kmeans temporaries were still alive, the round-3 capacity run hit
        # RESOURCE_EXHAUSTED on a 16GB chip.
        cap = self._resolved_capacity(n, k)
        spare = self._resolved_spare(n)
        from zebra_tpu.profiling import timed

        with timed("ivf.train", items=int(sample.shape[0])):
            if warm is not None:
                warm.join()  # don't compile the same program twice
            cents = self._train_centroids(k, sample)
            device_sync(cents)  # training done -> sample/temporaries freeable
        del sample, train
        self.state = V.empty_state(
            cents, cap, spare, dtype=self.dtype,
            refine=self.options.refine_enabled(),
        )
        with timed("ivf.insert_batches", items=n):
            self._insert_batches(vectors, ids, prestaged=staged)
        return True

    # -- insert --------------------------------------------------------------------

    @property
    def _cell_metric(self) -> str:
        """Cell-selection metric — must match query's sel_metric."""
        from zebra_tpu.ops import distances as D

        return self.metric if self.metric in D.MXU_METRICS else "sql2"

    @property
    def _quant_wire(self) -> bool:
        """Refined int8 slabs quantise on the HOST and ship the int8 pair +
        scales (~``2*D + 8`` B/row — bf16-tier wire volume at full ~15-bit
        stored precision). The old refined wire shipped exact f32 (``4*D``)
        because on-device quantisation can only capture what the wire
        delivered — host quantisation delivers everything in half the bytes
        (round-3 verdict #1; the refined cold build was pure wire cost)."""
        return self.options.refine_enabled() and self.options.dtype == "int8"

    @property
    def _wal_codec(self) -> str:
        return "q8" if self._quant_wire else super()._wal_codec

    @property
    def _wire_row_bytes(self) -> int:
        if self._quant_wire:
            return 2 * self._dev_dim + 8  # int8 pair + two f32 scales
        return super()._wire_row_bytes

    def _staged_rows(self, staged, rows: int):
        if isinstance(staged, tuple):  # quantised wire: coarse-only bf16
            # reconstruction — k-means tolerates bf16-grade samples, and a
            # f32 reconstruction would double the training-sample footprint
            v8, _r8, qs = staged
            return _dequant_coarse_bf16(v8, qs, rows)
        return staged[:rows]

    def _stage_span(self, vectors, span, src=None):
        """Quantised-wire staging: slice pre-quantised parts when the caller
        supplied them (WAL replay — bitwise the logged record), else
        quantise this span on the host; ship ``(v8, r8, [scale, rscale])``
        as one async device_put. Device-sourced spans (rebuild slices) and
        non-refined tiers keep the base path."""
        if src is not None or not self._quant_wire:
            return super()._stage_span(vectors, span, src)
        from zebra_tpu.profiling import timed

        start, count = span
        padded = next_pow2(max(count, _MIN_BATCH))
        if self._prequant is not None:
            v8s, r8s, scs, rss = (p[start : start + count] for p in self._prequant)
        else:
            with timed("insert.quant", items=count):
                v8s, r8s, scs, rss = V.quantise_pair_host(
                    np.asarray(vectors[start : start + count], np.float32)
                )
        v8 = np.zeros((padded, self._dev_dim), np.int8)
        v8[:count, : v8s.shape[1]] = v8s
        r8 = np.zeros((padded, self._dev_dim), np.int8)
        r8[:count, : r8s.shape[1]] = r8s
        qs = np.ones((padded, 2), np.float32)  # pad scales = the empty default
        qs[:count, 0] = scs
        qs[:count, 1] = rss
        handle = jax.device_put((v8, r8, qs))
        if self._wal_cb is not None:
            # per-span q8 WAL record, fsync'd WHILE the span's transfer is in
            # flight (device_put above is async) and before its dispatch —
            # the log holds exactly what the device will store (bitwise)
            self._wal_cb(span, (v8s, r8s, scs, rss))
        return handle

    def _insert_batch_dev(self, batch, count: int):
        """One device insert; slots come back as a DEVICE array — the base
        pipeline resolves them two batches behind, overlapping the 4B/vector
        readback with later transfers/compute."""
        if isinstance(batch, tuple):  # host-quantised wire
            self.state, slots_dev = V.insert_quant(
                self.state, *batch, jnp.int32(count),
                spill=self.options.spill, metric=self._cell_metric,
            )
            return slots_dev
        self.state, slots_dev = V.insert(
            self.state, batch, jnp.int32(count), spill=self.options.spill,
            metric=self._cell_metric,
        )
        return slots_dev

    def _resolve_failed(self, rows: np.ndarray) -> np.ndarray:
        """Deferred-failure path: even the spare region was full for these
        rows. Grow the spare (slot numbering untouched — unlike a
        cluster-capacity doubling there is no 2x-slab HBM transient, the
        round-1 OOM at 1M x 768) and retry synchronously."""
        n = rows.shape[0]
        out = np.full(n, -1, dtype=np.int64)
        pending = np.arange(n)
        for _ in range(_MAX_GROWS):
            logger.info(
                "ivf: %d vectors overflow into a grown spare (%d -> %d rows)",
                len(pending), self.state.spare_capacity,
                2 * self.state.spare_capacity,
            )
            self.state = V.grow_spare(self.state)
            cur = np.zeros(
                (next_pow2(max(len(pending), 8)), self._dev_dim), np.float32
            )
            cur[: len(pending), : rows.shape[1]] = rows[pending]
            if self._quant_wire:
                # retries must store the SAME codes the WAL logged for these
                # rows: host quantisation is deterministic, so re-quantising
                # the same f32 rows reproduces the logged pair bitwise
                v8, r8, scs, rss = V.quantise_pair_host(cur)
                self.state, slots_dev = V.insert_quant(
                    self.state, jnp.asarray(v8), jnp.asarray(r8),
                    jnp.asarray(np.stack([scs, rss], axis=1)),
                    jnp.int32(len(pending)), spill=self.options.spill,
                    metric=self._cell_metric,
                )
            else:
                self.state, slots_dev = V.insert(
                    self.state, jnp.asarray(cur), jnp.int32(len(pending)),
                    spill=self.options.spill, metric=self._cell_metric,
                )
            slots = np.asarray(slots_dev[: len(pending)])
            out[pending] = slots
            pending = pending[slots < 0]
            if not len(pending):
                return out
        raise RuntimeError("ivf insert could not place batch after spare growth")

    # -- rebuild / compaction ----------------------------------------------------

    def clear(self) -> None:
        super().clear()
        self._used_slots = 0
        self._spare_used = 0

    def _register_slots(self, ids, slots) -> None:
        super()._register_slots(ids, slots)
        # tombstones never decrement device counts, so occupancy mirrors are
        # exact: every registered slot is a fresh allocation
        self._used_slots += len(slots)
        if self.state is not None:
            start = self.state.spare_start
            self._spare_used += int(np.sum(np.asarray(slots) >= start))

    def _rebuild_peak_bytes(self, n_live: int) -> int:
        """Worst-case HBM transient of :meth:`rebuild` at ``n_live`` rows.

        The rebuild gathers every live row off the old slab (bf16 for int8
        slabs — `_take_rows` dequantises; slab dtype otherwise), frees the
        old state, then allocates the retrained slab while the copy is still
        alive for re-insertion. Peak = max(old slab + live copy,
        live copy + new slab) + auxiliaries.
        """
        d = self._dev_dim
        item = np.dtype(self.dtype).itemsize
        refined = self.state is not None and self.state.residual is not None
        # int8 copies dequantise to bf16; REFINED int8 reconstructs in f32
        copy_item = (4 if refined else 2) if self.dtype == np.int8 else item
        live_copy = n_live * d * copy_item
        k = self._resolved_clusters(max(n_live, 1))
        slots = (
            k * self._resolved_capacity(max(n_live, 1), k)
            + self._resolved_spare(max(n_live, 1))
        )
        new_slab = slots * (d * item + 9) + k * d * 4
        if refined:
            new_slab += slots * (d + 4)
        old_slab = self.state.vectors.nbytes + self.state.norms.nbytes
        if refined:
            old_slab += self.state.residual.nbytes + self.state.rscales.nbytes
        return max(old_slab + live_copy, live_copy + new_slab)

    # A rebuild retrains centroids sized to the live population and
    # re-inserts — compacts tombstones, drains the spare, restores partition
    # balance. The capture is a DEVICE permutation gather; the slab never
    # reads back through the slow device->host direction. Driver:
    # ``BaseVectorIndex.rebuild``.

    _ADOPT_EXTRA = ("_used_slots", "_spare_used")

    def _rebuild_reason(self) -> str | None:
        n_live = len(self._id_to_slot)
        if n_live == 0 or self.state is None:
            return None
        # CRITICAL tier first: the spare is nearly full or has already
        # ballooned past its resolved sizing (inline grow_spare doublings).
        # The facade treats "-critical" as backpressure — the MUTATING call
        # blocks until the rebalance lands, instead of racing ahead growing
        # the spare unboundedly (the round-5 10M churn grew it to 33M rows
        # and compile-OOMed; readers stay unaffected either way).
        spare_cap = max(self.state.spare_capacity, 1)
        if (
            self._spare_used > 0.9 * spare_cap
            or self.state.spare_capacity > 4 * self._resolved_spare(n_live)
        ):
            return "spare-critical"
        if n_live > _REBUILD_GROWTH * max(self._built_n, 1):
            return "growth"
        used = self._used_slots
        if used - n_live > _COMPACT_TOMBSTONES * max(used, 1):
            return "tombstones"
        # heavy spare pressure means the partitions no longer fit the data —
        # a retrain rebalances and resizes the spare to the grown population.
        # The occupancy test must be RELATIVE TO LIVE DATA, not capacity: a
        # growth episode doubles the capacity past any fixed fraction of it
        # (a 10M-churn wave grew the spare to 4M rows and the old
        # 0.75*capacity test then never fired — every query paid a
        # multi-million-row linear scan until it OOMed)
        if (
            self._spare_used > 0.75 * max(self.state.spare_capacity, 1)
            or self._spare_used > max(0.125 * n_live, 4096)
        ):
            return "spare-pressure"
        return None

    def _rebuild_admissible(self, reason: str) -> bool:
        # graceful degradation at capacity scale: an INLINE rebuild whose
        # transient cannot fit HBM would crash the process mid-churn
        # (RESOURCE_EXHAUSTED). Skip it — queries stay CORRECT (tombstones
        # masked, spare scanned in chunks), maintenance just stops
        # reclaiming space; an explicit rebuild()/save() + offline rebuild
        # remains available. Warn once per episode. (The facade's BACKGROUND
        # retrain has a lower transient — chunked capture — and does its own
        # budget check, _retrain_bg_peak_bytes.)
        n_live = len(self._id_to_slot)
        peak = self._rebuild_peak_bytes(n_live)
        if peak > _STAGE_HBM_BUDGET:
            if not getattr(self, "_rebuild_skip_warned", False):
                logger.warning(
                    "ivf: skipping auto-rebuild at %d live rows — the "
                    "rebuild transient (%.1f GB) exceeds the HBM budget "
                    "(%.1f GB). Queries remain correct; reclaim space "
                    "via a sharded index or an offline rebuild.",
                    n_live, peak / 2**30, _STAGE_HBM_BUDGET / 2**30,
                )
                self._rebuild_skip_warned = True
            return False
        self._rebuild_skip_warned = False
        return True

    def _pre_rebuild(self, reason: str | None) -> None:
        logger.info(
            "ivf rebuild (%s): %d live vectors", reason, len(self._id_to_slot)
        )

    def _reset_alloc_mirrors(self) -> None:
        self._used_slots = 0
        self._spare_used = 0

    def _train_sample_target(self, n: int) -> int:
        k = self._resolved_clusters(max(n, 1))
        return min(n, max(self.options.kmeans_sample, 4 * k))

    def _retrain_bg_peak_bytes(self, n_live: int, chunk_rows: int) -> int:
        """Extra HBM a BACKGROUND retrain needs beyond steady state: the new
        slab + one f32/bf16 capture chunk + the k-means training sample,
        all alongside the still-serving old slab (which is already
        resident, so only the additions count here; the caller compares
        old + additions against the budget)."""
        d = self._dev_dim
        item = np.dtype(self.dtype).itemsize
        refined = self.state is not None and self.state.residual is not None
        copy_item = (4 if refined else 2) if self.dtype == np.int8 else item
        k = self._resolved_clusters(max(n_live, 1))
        slots = (
            k * self._resolved_capacity(max(n_live, 1), k)
            + self._resolved_spare(max(n_live, 1))
        )
        new_slab = slots * (d * item + 9) + k * d * 4
        if refined:
            new_slab += slots * (d + 4)
        sample = self._train_sample_target(n_live) * d * copy_item
        return new_slab + chunk_rows * d * copy_item + sample

    # -- delete / search -----------------------------------------------------------

    def _delete_slots_device(self, slots: np.ndarray) -> None:
        self.state = V.delete_slots(self.state, jnp.asarray(slots))

    def _query_device(self, qj: jnp.ndarray, k: int, exact: bool):
        if exact:
            return V.brute_force(
                self.state, qj, k, metric=self.metric, power=self.metric_power,
                precision=self.options.exact_precision,
                approx=self.options.approx_topk,
                chunk=131072 if self.options.approx_topk else 8192,
            )
        rerank = self.options.rerank
        if rerank.startswith("pallas") and jax.default_backend() == "cpu":
            rerank = "xla"  # Mosaic kernels need a real TPU; same results
        return V.query(
            self.state,
            qj,
            k,
            metric=self.metric,
            num_probes=self.options.resolved_probes(),
            power=self.metric_power,
            rerank=rerank,
            rerank_dots=self.options.rerank_dots,
            probe_sel=self.options.probe_sel,
            refine_k=self._refine_k(k),
            refine_scan=self._refine_scan(),
        )

    def _refine_k(self, k: int) -> int:
        """Oversampled candidate width of the residual refine pass (0 = off /
        scan mode)."""
        if self.state is None or self.state.residual is None:
            return 0
        return self.options.refine_k(k)

    def _refine_scan(self) -> bool:
        return (
            self.options.refine_is_scan()
            and self.state is not None
            and self.state.residual is not None
        )

    # -- persistence -----------------------------------------------------------------

    def _take_rows(self, flat_idx):
        fi = jnp.asarray(flat_idx)
        rows = jnp.take(self._slab2d(), fi, axis=0)
        if self.state.residual is not None:
            # refined int8: reconstruct in f32 — a bf16 copy would round the
            # ~15-bit values back to 8 mantissa bits and defeat the refine
            sc = jnp.take(self.state.scales, fi)
            r8 = jnp.take(self.state.residual, fi, axis=0)
            rs = jnp.take(self.state.rscales, fi)
            return (
                rows.astype(jnp.float32) * sc[:, None]
                + r8.astype(jnp.float32) * rs[:, None]
            )
        if self.state.scales is not None:  # int8: dequantise (bf16 transient)
            sc = jnp.take(self.state.scales, fi)
            rows = rows.astype(jnp.bfloat16) * sc[:, None].astype(jnp.bfloat16)
        return rows

    def _snapshot_arrays(self) -> dict:
        # raw device arrays: the streamed snapshot writer fetches them in
        # bounded chunks (bf16 slab ships as uint16 bits — slab_from_np's
        # format contract)
        st = self.state
        out = {
            "centroids": st.centroids,
            "counts": st.counts,
            "vectors": st.vectors,
            "norms": st.norms,
            "valid": st.valid,
            "overflow": st.overflow,
            "ccap": np.asarray(st.cluster_capacity, dtype=np.int32),
        }
        if st.scales is not None:
            out["scales"] = st.scales
        if st.residual is not None:
            out["residual"] = st.residual
            out["rscales"] = st.rscales
        return out

    def _restore_arrays(self, z) -> None:
        counts = np.asarray(z["counts"])
        self._used_slots = int(counts.sum())
        self._spare_used = int(counts[-1])
        self.state = V.IVFState(
            centroids=jnp.asarray(z["centroids"]),
            counts=jnp.asarray(z["counts"]),
            vectors=slab_from_np(z["vectors"], self.dtype),
            norms=jnp.asarray(z["norms"]),
            valid=jnp.asarray(z["valid"]),
            overflow=jnp.asarray(z["overflow"]),
            scales=jnp.asarray(z["scales"]) if "scales" in z else None,
            residual=jnp.asarray(z["residual"]) if "residual" in z else None,
            rscales=jnp.asarray(z["rscales"]) if "rscales" in z else None,
            ccap=int(z["ccap"]),
        )

    # -- maintenance stats --------------------------------------------------------

    def stats(self) -> dict:
        if self.state is None:
            return {"vectors": 0, "built": False}
        st = self.state
        counts = np.asarray(st.counts)
        used = int(counts.sum())
        return {
            "vectors": len(self._id_to_slot),
            "built": True,
            "clusters": st.num_clusters,
            "cluster_capacity": st.cluster_capacity,
            "spare_capacity": st.spare_capacity,
            "spare_used": int(counts[-1]),
            "slab_capacity": st.slab_capacity,
            "used_slots": used,
            "max_cluster_load": int(counts[:-1].max()),
            "overflow": int(st.overflow),
            "tombstones": used - len(self._id_to_slot),
        }
