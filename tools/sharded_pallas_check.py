"""Run the SHARDED query path with rerank='pallas' on the real TPU.

Round-2 gap: `_sharded_query_ivf` was CPU-mesh tested and dryrun-compiled,
but the pallas wave kernel under shard_map had never executed on TPU (only
one chip exists — a shards=1 mesh still exercises the shard_map + collective
merge + Mosaic kernel combination on hardware). This records:
  * result parity: sharded+pallas vs unsharded+pallas vs unsharded+xla
  * QPS parity: the shard_map wrapper must not tax the kernel

Usage (serially, nothing else on the TPU):
  nohup python -u tools/sharded_pallas_check.py > /tmp/spc.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_data
from zebra_tpu.config import IndexOptions
from zebra_tpu.index.ivf_host import IVFIndex
from zebra_tpu.parallel.sharded import ShardedIndex
from zebra_tpu.utils import device_sync, enable_compile_cache


def main(n: int = 200_000, dim: int = 768, qbatch: int = 1024, iters: int = 10):
    enable_compile_cache()
    data = make_data(n, dim, seed=0)
    rng = np.random.default_rng(1)
    q = data[rng.permutation(n)[:qbatch]] + 0.05 * rng.standard_normal(
        (qbatch, dim)
    ).astype(np.float32)

    opts = dict(index_type="ivf", dtype="bfloat16", num_probes=4, seed=0)
    results = {}
    per_cfg = {}
    for name, cls, kw, okw in (
        ("unsharded_xla", IVFIndex, {}, {"rerank": "xla"}),
        ("unsharded_pallas", IVFIndex, {}, {"rerank": "pallas"}),
        ("sharded1_pallas", ShardedIndex, {"shards": 1}, {"rerank": "pallas"}),
    ):
        ix = cls(dim=dim, metric="cosine",
                 options=IndexOptions(**{**opts, **okw}), **kw)
        t0 = time.perf_counter()
        ids = ix.add(data)
        sync_leaf = ix.state.vectors
        device_sync(sync_leaf)
        build_s = time.perf_counter() - t0
        d, s, v = ix.search_arrays(q, 10)
        t0 = time.perf_counter()
        for _ in range(iters):
            d, s, v = ix.search_arrays(q, 10)
        qps = qbatch * iters / (time.perf_counter() - t0)
        selfres = ix.search(data[:256], k=1)
        selfhit = sum(
            bool(row) and row[0][0] == ids[i] for i, row in enumerate(selfres)
        ) / 256
        per_cfg[name] = {
            "qps": round(qps, 1),
            "build_s": round(build_s, 1),
            "self_retrieval": round(selfhit, 4),
        }
        results[name] = (np.asarray(s), np.asarray(v))
        print(f"{name}: {qps:,.0f} QPS (build {build_s:.1f}s)", file=sys.stderr)
        del ix  # free HBM before the next build

    def overlap(a, b):
        sa, va = results[a]
        sb, vb = results[b]
        hits = sum(
            len(set(sa[i][va[i]].tolist()) & set(sb[i][vb[i]].tolist()))
            for i in range(qbatch)
        )
        return hits / (qbatch * 10)

    out = {
        "metric": "sharded_pallas_tpu_check",
        "configs": per_cfg,
        "overlap_pallas_vs_xla": round(overlap("unsharded_pallas", "unsharded_xla"), 4),
        # NB: shard slots differ from unsharded slots; compare via rank sets
        # of the unsharded runs only — the sharded run's health signal is its
        # own QPS + the self-retrieval below
        "n": n,
        "dim": dim,
    }
    print(json.dumps(out), flush=True)
    with open("bench_results/r3_sharded_pallas.json", "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
