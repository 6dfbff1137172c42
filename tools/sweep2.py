"""Post-reservoir parameter sweep: T/P/capacity + backend at 200k x 768."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from zebra_tpu.utils import enable_compile_cache

enable_compile_cache()
from zebra_tpu.config import IndexOptions
from zebra_tpu.index.lsh import LSHIndex
from bench import make_data

n, dim, nq, k = 200_000, 768, 512, 10
data = make_data(n, dim, seed=0)
rng = np.random.default_rng(1)
qall = data[rng.permutation(n)[:nq]] + 0.05 * rng.standard_normal((nq, dim)).astype(np.float32)
row_ids = [int(i + 1).to_bytes(16, "little") for i in range(n)]

ref = LSHIndex(dim=dim, metric="cosine", options=IndexOptions(num_tables=2, bits=4, seed=0))
ref.add(data, ids=list(row_ids))
_, st_, vt_ = ref.search_arrays(qall, k, exact=True)
truth = [set(st_[b][vt_[b]].tolist()) for b in range(nq)]
del ref
print("truth done", flush=True)


def run(tag, opts):
    idx = LSHIndex(dim=dim, metric="cosine", options=opts)
    t0 = time.perf_counter()
    idx.add(data, ids=list(row_ids))
    jax.block_until_ready(idx.state.buckets)
    bt = time.perf_counter() - t0
    d, s, v = idx.search_arrays(qall[:256], k)
    t0 = time.perf_counter()
    for _ in range(20):
        d, s, v = idx.search_arrays(qall[:256], k)
    dt = (time.perf_counter() - t0) / 20
    d2, s2, v2 = idx.search_arrays(qall, k)
    hits = sum(len(set(s2[b][v2[b]].tolist()) & truth[b]) for b in range(nq))
    print(f"{tag:34s} build={bt:6.1f}s qps={256/dt:8,.0f} recall={hits/(nq*k):.4f}",
          flush=True)


base = dict(seed=0)
for T, P, cap in ((15, 8, 0), (10, 8, 0), (8, 10, 0), (10, 6, 0), (15, 8, 32), (10, 8, 32), (6, 8, 0)):
    run(f"T={T} P={P} cap={cap or 20}",
        IndexOptions(num_tables=T, num_probes=P, bucket_capacity=cap, **base))
run("T=10 P=8 pallas", IndexOptions(num_tables=10, num_probes=8, rerank="pallas", **base))
run("flat (exact)", IndexOptions(index_type="flat", **base))
