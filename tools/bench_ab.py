"""A/B TPU benchmark: xla-f32 vs xla-bf16 vs pallas re-rank at one db size."""

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


def row_ids(n):
    return [int(i + 1).to_bytes(16, "little") for i in range(n)]


def run(tag, data, q, truth_rows, opts, metric="cosine", k=10, iters=20):
    idx = LSHIndex(dim=data.shape[1], metric=metric, options=opts)
    t0 = time.perf_counter()
    idx.add(data, ids=row_ids(data.shape[0]))
    jax.block_until_ready(idx.state.buckets)
    t_build = time.perf_counter() - t0
    # slot i corresponds to data row i (single contiguous add)

    d, s, v = idx.search_arrays(q, k)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        d, s, v = idx.search_arrays(q, k)
    dt = (time.perf_counter() - t0) / iters
    qps = q.shape[0] / dt

    # recall vs brute force (ids of returned slots)
    hits = total = 0
    for b in range(q.shape[0]):
        got = {int(x) for x, ok in zip(s[b], v[b]) if ok}
        hits += len(got & set(truth_rows[b]))
        total += k
    # warm insert
    inc = data[:65536]
    t0 = time.perf_counter()
    idx.add(inc)
    jax.block_until_ready(idx.state.buckets)
    t_inc = time.perf_counter() - t0
    print(
        f"{tag:24s} build={t_build:7.1f}s  qps={qps:9,.0f}  "
        f"recall@{k}={hits/total:.4f}  warm_insert={65536/t_inc:9,.0f}/s",
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim, nq, k = 768, 256, 10
    data = make_data(n, dim, seed=0)
    rng = np.random.default_rng(1)
    qsel = rng.permutation(n)[:nq]
    q = data[qsel] + 0.05 * rng.standard_normal((nq, dim)).astype(np.float32)

    # ground truth by brute force on a disposable index (slots == data rows)
    ref = LSHIndex(dim=dim, metric="cosine", options=IndexOptions(num_tables=2, bits=4, seed=0))
    ref.add(data, ids=row_ids(n))
    d, s, v = ref.search_arrays(q, k, exact=True)
    truth = [[int(x) for x, ok in zip(s[b], v[b]) if ok] for b in range(nq)]
    del ref
    print(f"n={n} dim={dim} queries={nq}", flush=True)

    base = dict(num_tables=15, num_probes=8, seed=0)
    run("xla f32", data, q, truth, IndexOptions(**base))
    run("xla f32 nocompact", data, q, truth, IndexOptions(**base, max_candidates=-1))
    run("xla bf16", data, q, truth, IndexOptions(**base, dtype="bfloat16"))
    run("pallas f32 (pad1024)", data, q, truth, IndexOptions(**base, rerank="pallas"))


if __name__ == "__main__":
    main()
