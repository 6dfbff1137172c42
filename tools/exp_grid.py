"""Grid-layout feasibility experiment (round 2, VERDICT item 2).

Question: can a SINGLE-table, bucket-contiguous layout with query-adaptive
multiprobe reach candidate recall@10 >= ~0.92 on 1M x 768 clustered cosine
data, and at what scan cost (rows/query)?

Everything runs device-side (data generated with jax.random) — no tunnel
transfers. Reports, per (bits, P, plane_mode):
  - cand_recall: fraction of true top-10 whose bucket is among the P probes
  - rows/query:  mean total occupancy of probed buckets (the streaming cost)

Usage: nohup python -u tools/exp_grid.py > /tmp/exp_grid.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

from zebra_tpu.utils import enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp

from zebra_tpu.ops import hashing as H

N, DIM, NQ, K = 1_000_000, 768, 1024, 10
NCLUST = N // 100


def make_data_device(key):
    kc, ka, kn, kq = jax.random.split(key, 4)
    centers = jax.random.normal(kc, (NCLUST, DIM), jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, NCLUST)
    x = centers[assign] + 0.15 * jax.random.normal(kn, (N, DIM), jnp.float32)
    qi = jax.random.permutation(kq, N)[:NQ]
    q = x[qi] + 0.05 * jax.random.normal(kq, (NQ, DIM), jnp.float32)
    return x, q


@functools.partial(jax.jit, static_argnames=("k",))
def true_topk(x, q, k):
    """Exact cosine top-k slots, chunked scan."""
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    chunk = 65536
    nch = x.shape[0] // chunk

    def body(carry, i):
        bd, bi = carry
        xc = jax.lax.dynamic_slice_in_dim(xn, i * chunk, chunk, 0)
        sims = jnp.dot(qn, xc.T, precision=jax.lax.Precision.HIGHEST)
        d = 1.0 - sims
        alld = jnp.concatenate([bd, d], axis=1)
        alli = jnp.concatenate(
            [bi, jnp.broadcast_to(i * chunk + jnp.arange(chunk, dtype=jnp.int32), d.shape)],
            axis=1,
        )
        nd, sel = jax.lax.top_k(-alld, k)
        return (-nd, jnp.take_along_axis(alli, sel, axis=1)), None

    init = (jnp.full((q.shape[0], k), jnp.inf), jnp.full((q.shape[0], k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(nch))
    return bi


def probe_codes_adaptive(acts, P, nflip=7):
    """Query-adaptive multiprobe: score all 2^nflip subsets of the nflip
    lowest-|margin| bits by summed margin, take the P best per query."""
    B, b = acts.shape
    nflip = min(nflip, b)
    absa = jnp.abs(acts)
    order = jnp.argsort(absa, axis=-1).astype(jnp.int32)  # [B, b]
    sm = jnp.take_along_axis(absa, order, axis=1)[:, :nflip]  # [B, nflip]
    S = 1 << nflip
    sub = jnp.arange(S, dtype=jnp.int32)
    bitmat = ((sub[:, None] >> jnp.arange(nflip, dtype=jnp.int32)[None, :]) & 1).astype(
        jnp.float32
    )  # [S, nflip]
    scores = sm @ bitmat.T  # [B, S]
    _, idx = jax.lax.top_k(-scores, P)  # [B, P] subset ids, best first
    chosen = bitmat[idx]  # [B, P, nflip]
    bitvals = jnp.left_shift(jnp.int32(1), order[:, :nflip])  # [B, nflip]
    masks = jnp.sum(chosen.astype(jnp.int32) * bitvals[:, None, :], axis=-1)
    codes = H.pack_signs(acts[:, None, :])[:, 0]  # [B]
    return codes[:, None] ^ masks  # [B, P]


@functools.partial(jax.jit, static_argnames=("P", "bits"))
def eval_config(x, q, true_i, planes, consts, P, bits):
    # codes of all data points under the single table
    code_x = H.hash_codes(x, planes, consts)[:, 0]  # [N]
    acts_q = H.hash_activations(q, planes, consts)[:, 0]  # [B, b]
    probes = probe_codes_adaptive(acts_q, P)  # [B, P]
    # candidate recall: true neighbor's code appears among the probes
    nbr_codes = code_x[true_i]  # [B, K]
    hit = jnp.any(nbr_codes[:, :, None] == probes[:, None, :], axis=-1)  # [B, K]
    recall = jnp.mean(hit.astype(jnp.float32))
    # scan cost: total occupancy of probed buckets
    R = 1 << bits
    occ = jnp.zeros((R,), jnp.int32).at[code_x].add(1)
    rows = jnp.mean(jnp.sum(occ[probes], axis=1).astype(jnp.float32))
    # p99 bucket load (grid window sizing)
    loads = jnp.sort(occ)
    return recall, rows, loads[int(R * 0.99)], loads[-1]


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x, q = make_data_device(key)
    x.block_until_ready()
    print("data ready", flush=True)
    t0 = time.time()
    true_i = true_topk(x, q, K)
    true_i.block_until_ready()
    print(f"ground truth in {time.time()-t0:.1f}s", flush=True)

    for mode in ("data", "random"):
        for bits in (11, 12, 13, 14):
            kk = jax.random.PRNGKey(42 + bits)
            if mode == "data":
                planes, consts = H.sample_planes_data(kk, 1, bits, x[:100000])
            else:
                planes, consts = H.sample_planes_random(kk, 1, bits, DIM)
            for P in (8, 16, 32, 64):
                t0 = time.time()
                r, rows, p99, mx = eval_config(x, q, true_i, planes, consts, P, bits)
                print(
                    f"mode={mode} bits={bits:2d} P={P:3d}: cand_recall={float(r):.4f} "
                    f"rows/q={float(rows):8.0f} p99_load={int(p99)} max_load={int(mx)} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
