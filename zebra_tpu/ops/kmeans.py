"""Device k-means (Lloyd's) for IVF coarse quantization.

The reference partitions space with random perpendicular-bisector hyperplanes
(``src/database/index/lsh.rs:221-230``); the IVF index instead learns K
centroids from the data — a strictly better partition for the same probe
budget, and a perfect fit for the TPU: every Lloyd iteration is one big
assignment matmul (MXU) plus one segment-sum scatter (VPU), all static shapes.

Assignment runs in ``lax.Precision.DEFAULT`` (bf16-grade MXU passes): k-means
regions tolerate ~0.5% relative distance error — only exact ties flip — and
the default tier is ~6x faster, which matters at 1M x 4096 x 768.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: out-of-bounds cluster id used to drop masked rows from scatters
_OOB = np.int32(2**30)  # np scalar — see note in ops/topk.py


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x: jnp.ndarray, centroids: jnp.ndarray, chunk: int = 65536):
    """Nearest-centroid assignment, chunked over rows.

    Args:
      x: ``[n, D]`` vectors (n a multiple of ``chunk`` or smaller than it).
      centroids: ``[K, D]`` float32.

    Returns:
      ``[n]`` int32 cluster ids.
    """
    n = x.shape[0]
    cn2 = jnp.sum(centroids * centroids, axis=-1)  # [K]
    if n <= chunk:
        dot = jnp.dot(x.astype(jnp.float32), centroids.T,
                      preferred_element_type=jnp.float32)
        return jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)

    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    def body(_, xc):
        dot = jnp.dot(xc.astype(jnp.float32), centroids.T,
                      preferred_element_type=jnp.float32)
        return 0, jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)

    _, a = jax.lax.scan(body, 0, xp.reshape(n_chunks, chunk, -1))
    return a.reshape(-1)[:n]


def warm_compile(
    n_rows: int,
    dim: int,
    dtype,
    k: int,
    iters: int = 8,
    chunk: int = 65536,
    balance_rounds: int = 2,
) -> None:
    """AOT-compile ``kmeans`` for the given input shapes (no device arrays).

    Writes the executable into JAX's persistent compilation cache so the
    real call's backend compile becomes a disk read. Meant to run on a
    BACKGROUND thread at the start of a cold build: the remote compile
    (~28s over this box's tunnel — tools/profile_kmeans.py measured the
    30.4s "full kmeans" as ~1.5s compute + ~28s compile) then overlaps the
    staged slab transfers instead of serialising after them. Requires the
    persistent cache (``utils.enable_compile_cache``) — without it the AOT
    executable is unreachable from the later traced call. Exceptions are
    the caller's to swallow: a warm miss only costs the compile time back.
    """
    key_t = jax.ShapeDtypeStruct((2,), jnp.uint32)  # random.PRNGKey layout
    data_t = jax.ShapeDtypeStruct((int(n_rows), int(dim)), dtype)
    nv_t = jax.ShapeDtypeStruct((), jnp.int32)
    kmeans.lower(
        key_t, data_t, nv_t, k=int(k), iters=int(iters), chunk=int(chunk),
        balance_rounds=int(balance_rounds),
    ).compile()


@functools.partial(
    jax.jit, static_argnames=("n", "k", "total_iters", "m", "balance_rounds")
)
def _paced_plan(key, n: int, n_valid, k: int, total_iters: int, m: int,
                balance_rounds: int):
    """Init/reseed/split row indices for :func:`kmeans_paced` — mirrors the
    key-splitting structure of :func:`kmeans` (one tiny dispatch)."""
    k_init, k_reseed, k_split = jax.random.split(key, 3)
    nv = jnp.maximum(n_valid, 1)
    init_idx = jax.random.randint(k_init, (k,), 0, n) % nv
    reseed_idx = jax.random.randint(k_reseed, (total_iters, k), 0, n) % nv
    split_idx = jax.random.randint(k_split, (max(balance_rounds, 1), m), 0, n) % nv
    return init_idx, reseed_idx, split_idx


def _lloyd_pass(data, n_valid, cents, reseed_rows, chunk: int):
    """One Lloyd assignment+update pass (traced body shared by the paced
    step jits). ``data`` may be bf16; per-chunk casts run inside the scan."""
    n, dim = data.shape
    k = cents.shape[0]
    row = jnp.arange(n, dtype=jnp.int32)
    mask = row < n_valid
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    dp = jnp.pad(data, ((0, pad), (0, 0))) if pad else data
    mp = jnp.pad(mask, (0, pad)) if pad else mask
    cn2 = jnp.sum(cents * cents, axis=-1)

    def body(acc, xs):
        sums, counts = acc
        xc, mc = xs
        xc = xc.astype(jnp.float32)
        dot = jnp.dot(xc, cents.T, preferred_element_type=jnp.float32)
        a = jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)
        a = jnp.where(mc, a, _OOB)
        sums = sums.at[a].add(xc, mode="drop")
        counts = counts.at[a].add(mc.astype(jnp.int32), mode="drop")
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body,
        (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.int32)),
        (dp.reshape(n_chunks, -1, dim), mp.reshape(n_chunks, -1)),
    )
    mean = sums / jnp.maximum(counts, 1)[:, None]
    cents = jnp.where(
        (counts > 0)[:, None], mean, data[reseed_rows].astype(jnp.float32)
    )
    return cents, counts


@functools.partial(jax.jit, static_argnames=("chunk",))
def _paced_lloyd_step(data, n_valid, cents, reseed_rows, chunk: int):
    return _lloyd_pass(data, n_valid, cents, reseed_rows, chunk)


@functools.partial(jax.jit, static_argnames=("chunk", "m"))
def _paced_balance_step(data, n_valid, cents, counts, split_rows, reseed_pair,
                        chunk: int, m: int):
    """One split-heavy balance round (nudge + 2 settle passes) as a single
    dispatch — ~2x a Lloyd pass, still well under the paced stall budget."""
    k = cents.shape[0]
    order = jnp.argsort(-counts)
    heavy = order[:m]
    light = order[k - m:]
    nudged = 0.99 * cents[heavy] + 0.01 * data[split_rows].astype(jnp.float32)
    cents = cents.at[light].set(nudged)
    cents, counts = _lloyd_pass(data, n_valid, cents, reseed_pair[0], chunk)
    cents, counts = _lloyd_pass(data, n_valid, cents, reseed_pair[1], chunk)
    return cents, counts


def kmeans_paced(
    key: jax.Array,
    data: jnp.ndarray,
    n_valid,
    k: int,
    iters: int = 8,
    chunk: int = 65536,
    balance_rounds: int = 2,
    pacer=None,
):
    """Same clustering procedure as :func:`kmeans`, dispatched ONE pass at a
    time with a sync between dispatches.

    The monolithic :func:`kmeans` is a single device dispatch of
    ``iters + 2*balance_rounds`` Lloyd passes — seconds of uninterruptible
    device time at the flagship sizing, during which every concurrently
    submitted query queues behind it. The BACKGROUND retrain path (round-4
    verdict #2: readers must never black out O(database)) uses this paced
    variant instead: each pass is its own dispatch and the pacer (default
    :func:`zebra_tpu.utils.device_sync`) drains the queue between passes,
    so a concurrent query waits at most ~one pass, not the whole training
    run. Foreground cold builds keep the monolithic version (faster, and
    nothing else is running).

    Same signature + return as :func:`kmeans`; the math per pass is
    identical but it is NOT guaranteed bit-equal (separate XLA programs may
    fuse differently) — tests assert clustering-quality equivalence.
    """
    if pacer is None:
        from zebra_tpu.utils import device_sync

        pacer = device_sync
    n = data.shape[0]
    total_iters = iters + 2 * balance_rounds
    m = max(k // 8, 1)
    nv = jnp.asarray(n_valid, jnp.int32)
    init_idx, reseed_idx, split_idx = _paced_plan(
        key, n, nv, k, total_iters, m, balance_rounds
    )
    cents = jnp.take(data, init_idx, axis=0).astype(jnp.float32)
    counts = jnp.zeros((k,), jnp.int32)
    for it in range(iters):
        cents, counts = _paced_lloyd_step(data, nv, cents, reseed_idx[it], chunk)
        pacer(counts)
    for r in range(balance_rounds):
        pair = reseed_idx[iters + 2 * r : iters + 2 * r + 2]
        cents, counts = _paced_balance_step(
            data, nv, cents, counts, split_idx[r], pair, chunk, m
        )
        pacer(counts)
    return cents, counts


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "chunk", "balance_rounds")
)
def kmeans(
    key: jax.Array,
    data: jnp.ndarray,
    n_valid: jnp.ndarray,
    k: int,
    iters: int = 8,
    chunk: int = 65536,
    balance_rounds: int = 2,
):
    """Lloyd's k-means on device, with load-balancing split passes.

    After the main Lloyd iterations, each balance round moves the k/8
    lightest centroids next to the k/8 heaviest (a perturbed copy) and runs
    two more Lloyd iterations — the classic split-heavy repair. This shrinks
    the max cluster load substantially, which directly bounds the IVF
    spill/spare pressure (cluster blocks have fixed capacity).

    Args:
      key: PRNG key (init sampling + empty-cluster reseeding + splits).
      data: ``[n, D]`` training vectors; rows ``>= n_valid`` are padding.
      n_valid: scalar int32 count of real rows (must be ``>= k`` for a
        sensible result; fewer real rows leave some clusters on random init).
      k: number of centroids (static).
      iters: main Lloyd iterations (static).
      balance_rounds: split-heavy repair rounds of 2 Lloyd iterations each.

    Returns:
      ``(centroids [k, D] f32, counts [k] i32)`` — counts from the last
      assignment pass (diagnostic; drives host sizing decisions).
    """
    n, dim = data.shape
    data32 = data.astype(jnp.float32)
    row = jnp.arange(n, dtype=jnp.int32)
    mask = row < n_valid

    k_init, k_reseed, k_split = jax.random.split(key, 3)
    # init: k random real rows (with replacement — duplicates collapse to
    # empty clusters that the per-iteration reseed repairs; this also keeps
    # the op total when k exceeds the sample size)
    init_idx = jax.random.randint(k_init, (k,), 0, n) % jnp.maximum(n_valid, 1)
    centroids = data32[init_idx]

    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    dp = jnp.pad(data32, ((0, pad), (0, 0))) if pad else data32
    mp = jnp.pad(mask, (0, pad)) if pad else mask
    dchunks = dp.reshape(n_chunks, -1, dim)
    mchunks = mp.reshape(n_chunks, -1)

    total_iters = iters + 2 * balance_rounds
    # per-iteration reseed candidates for empty clusters: random real rows
    reseed_idx = (
        jax.random.randint(k_reseed, (total_iters, k), 0, n)
        % jnp.maximum(n_valid, 1)
    )

    def lloyd(cents, reseed_rows):
        cn2 = jnp.sum(cents * cents, axis=-1)  # [K]

        def body(acc, xs):
            sums, counts = acc
            xc, mc = xs
            dot = jnp.dot(xc, cents.T, preferred_element_type=jnp.float32)
            a = jnp.argmin(cn2[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)
            a = jnp.where(mc, a, _OOB)
            sums = sums.at[a].add(xc, mode="drop")
            counts = counts.at[a].add(mc.astype(jnp.int32), mode="drop")
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.int32)),
            (dchunks, mchunks),
        )
        mean = sums / jnp.maximum(counts, 1)[:, None]
        # empty clusters restart at a random data point (classic Lloyd repair)
        cents = jnp.where((counts > 0)[:, None], mean, data32[reseed_rows])
        return cents, counts

    def main_step(cents, rows):
        return lloyd(cents, rows)

    centroids, counts_hist = jax.lax.scan(
        main_step, centroids, reseed_idx[:iters]
    )
    counts = counts_hist[-1] if iters else jnp.zeros((k,), jnp.int32)

    if balance_rounds:
        m = max(k // 8, 1)
        # symmetry-breaking nudge toward a random real data point: index-based
        # randomness keeps the op identical across zero-padded stored dims
        # (pallas-aligned and unpadded variants of one index train the same)
        split_idx = (
            jax.random.randint(k_split, (balance_rounds, m), 0, n)
            % jnp.maximum(n_valid, 1)
        )
        reseed_bal = reseed_idx[iters:].reshape(balance_rounds, 2, k)

        # scanned (not unrolled — compile-size) balance rounds: move the m
        # lightest centroids next to the m heaviest, then settle 2 iterations
        def balance_round(carry, xs):
            cents, counts = carry
            split_rows, reseed_pair = xs
            order = jnp.argsort(-counts)
            heavy = order[:m]
            light = order[k - m :]
            nudged = 0.99 * cents[heavy] + 0.01 * data32[split_rows]
            cents = cents.at[light].set(nudged)
            cents, counts = lloyd(cents, reseed_pair[0])
            cents, counts = lloyd(cents, reseed_pair[1])
            return (cents, counts), None

        (centroids, counts), _ = jax.lax.scan(
            balance_round, (centroids, counts), (split_idx, reseed_bal)
        )

    return centroids, counts
