"""Decompose IVF query time at 1M x 768 bf16: scoring vs gathers vs kernel.

  nohup python -u tools/profile_query_ivf.py > /tmp/prof_q.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from bench import make_data
from zebra_tpu.config import IndexOptions
from zebra_tpu.index import ivf as V
from zebra_tpu.index.ivf_host import IVFIndex
from zebra_tpu.ops import distances as D
from zebra_tpu.ops.pallas_ivf import ivf_rerank, pallas_ivf_rerank

P_PROBES = int(sys.argv[sys.argv.index("--probes") + 1]) if "--probes" in sys.argv else 2
n, dim = 1_000_000, 768
B = int(sys.argv[sys.argv.index("--qbatch") + 1]) if "--qbatch" in sys.argv else 1024
print("devices:", jax.devices(), flush=True)
data = make_data(n, dim, seed=0)
idx = IVFIndex(dim=dim, metric="cosine",
               options=IndexOptions(index_type="ivf", rerank="pallas",
                                    dtype="bfloat16", seed=0))
idx.add(data)
device_sync(idx.state.vectors)
st = idx.state
rng = np.random.default_rng(1)
q = jnp.asarray(data[rng.permutation(n)[:B]] +
                0.05 * rng.standard_normal((B, dim)).astype(np.float32))
device_sync(q)


#: Per-iteration dispatch/sync overhead measured with a null program and
#: SUBTRACTED from every stage time. Without this, each standalone stage
#: reads ~0.75ms too high (30ms device_sync round trip / iters) — the trap
#: that made the norm/valid gathers and the centroid stage look like
#: bottlenecks in round 3 (they are nearly free in the fused program; see
#: ROADMAP "ceiling hunt" notes).
_null = jax.jit(lambda x: x + 1.0)


def _overhead(iters=30):
    x = jnp.zeros(())
    device_sync(_null(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = _null(x)
    device_sync(x)
    return (time.perf_counter() - t0) / iters


def bench(name, fn, iters=30, overhead=0.0):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    device_sync(out)
    dt = max((time.perf_counter() - t0) / iters - overhead, 1e-9)
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch  ({B/dt:,.0f} QPS)  "
          f"(dispatch-corrected)", flush=True)
    return out


@jax.jit
def score_and_probes(st, q):
    """The SHIPPED two-stage selection (probe_sel='auto')."""
    return V.select_probes(st, q, P_PROBES, "cosine", "auto")


oh = _overhead()
print(f"per-iteration dispatch overhead: {oh*1e3:.2f} ms (subtracted below)",
      flush=True)

probes = bench("centroid score + approx top-P",
               lambda: score_and_probes(st, q), overhead=oh)


@jax.jit
def gathers(st, probes):
    C = st.cluster_capacity
    K = st.num_clusters
    nrm2d = jax.lax.slice(st.norms, (0,), (K * C,)).reshape(K, C)
    val2d = (
        jax.lax.slice(st.valid, (0,), (K * C,)).reshape(K, C).astype(jnp.float32)
    )
    return jnp.take(nrm2d, probes, axis=0), jnp.take(val2d, probes, axis=0)


nrm, val = bench("norm/valid block gathers", lambda: gathers(st, probes),
                 overhead=oh)

nrm2 = nrm.reshape(B, -1).reshape(nrm.shape)
bench("pallas kernel only (bf16x2 dots)",
      lambda: pallas_ivf_rerank(st.vectors, st.cluster_capacity, q, probes,
                                nrm, val, metric="cosine", k=10,
                                dots="bf16x2")[0], overhead=oh)

bench("pallas kernel only (bf16x2f fused)",
      lambda: pallas_ivf_rerank(st.vectors, st.cluster_capacity, q, probes,
                                nrm, val, metric="cosine", k=10,
                                dots="bf16x2f")[0], overhead=oh)

bench("pallas kernel only (bf16 1-pass)",
      lambda: pallas_ivf_rerank(st.vectors, st.cluster_capacity, q, probes,
                                nrm, val, metric="cosine", k=10,
                                dots="bf16")[0], overhead=oh)

_rr = jax.jit(lambda st, q, probes: ivf_rerank(
    st, q, probes, 10, metric="cosine", wave=1, dots="bf16x2f"))
bench("ivf_rerank (gathers+kernel+slotmap)",
      lambda: _rr(st, q, probes)[0], overhead=oh)

bench("full ivf.query (pallas, defaults)",
      lambda: V.query(st, q, 10, metric="cosine", num_probes=P_PROBES,
                      rerank="pallas")[0], overhead=oh)
