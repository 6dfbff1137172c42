"""Partition-quality diagnostic: how balanced is k-means on the bench data?

Trains centroids under different sample sizes / balance rounds, assigns the
FULL 1M rows on device, and reports the load distribution + how much mass
exceeds the per-cluster capacity (the spill/spare pressure at insert time).

  nohup python -u tools/diag_partition.py > /tmp/diag_part.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from bench import make_data
from zebra_tpu.ops.kmeans import assign_clusters, kmeans

N, D = 1_000_000, 768
print("devices:", jax.devices(), flush=True)
data = make_data(N, D, seed=0)
dj = jax.device_put(data)
jax.block_until_ready(dj)
print("data staged", flush=True)

for K, C, sample_n, rounds in (
    (8192, 248, 262144, 2),
    (16384, 128, 262144, 2),
    (16384, 128, 262144, 6),
    (32768, 64, 262144, 2),
):
    rng = np.random.default_rng(1)
    idx = np.sort(rng.choice(N, size=sample_n, replace=False))
    sample = jnp.take(dj, jnp.asarray(idx.astype(np.int32)), axis=0)
    t0 = time.perf_counter()
    cents, _ = kmeans(
        jax.random.PRNGKey(0), sample, jnp.int32(sample_n), k=K, iters=8,
        balance_rounds=rounds,
    )
    jax.block_until_ready(cents)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    assign = np.asarray(assign_clusters(dj, cents))
    t_assign = time.perf_counter() - t0
    loads = np.bincount(assign, minlength=K)
    over = np.maximum(loads - C, 0).sum()
    print(
        f"K={K} C={C} sample={sample_n} rounds={rounds}: train {t_train:.1f}s assign {t_assign:.1f}s | "
        f"loads mean {loads.mean():.0f} p50 {np.percentile(loads,50):.0f} "
        f"p95 {np.percentile(loads,95):.0f} p99 {np.percentile(loads,99):.0f} "
        f"max {loads.max()} empty {(loads==0).sum()} | "
        f"first-choice overflow {over} ({100*over/N:.1f}%)",
        flush=True,
    )
print("diag done", flush=True)
