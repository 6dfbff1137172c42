"""Time device-side maintenance at 1M x 768: rebuild + deduplicate.

VERDICT round-1 #4 asked for recorded timings of the no-readback paths.
  nohup python -u tools/time_rebuild.py > /tmp/time_rebuild.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax

from bench import make_data
from zebra_tpu.config import IndexOptions
from zebra_tpu.index.ivf_host import IVFIndex

n, dim = 1_000_000, 768
print("devices:", jax.devices(), flush=True)
data = make_data(n, dim, seed=0)

idx = IVFIndex(
    dim=dim, metric="cosine",
    options=IndexOptions(index_type="ivf", rerank="pallas", dtype="bfloat16", seed=0),
)
t0 = time.perf_counter()
ids = idx.add(data)
device_sync(idx.state.vectors)
print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

# tombstone 40% (below the auto-compaction threshold), then force a rebuild
idx.remove(ids[: int(0.4 * n)])
t0 = time.perf_counter()
idx.rebuild()
device_sync(idx.state.vectors)
t_rebuild = time.perf_counter() - t0
print(
    f"device-side rebuild of {len(idx):,} live vectors: {t_rebuild:.1f}s "
    f"(permutation gather + retrain + re-insert; no slab readback)",
    flush=True,
)

# dedup with no duplicates: device hash + zero collider confirms
t0 = time.perf_counter()
removed = idx.deduplicate()
print(
    f"deduplicate over {len(idx):,} rows: {time.perf_counter()-t0:.1f}s "
    f"({len(removed)} removed; device row-hash + collider-only confirm)",
    flush=True,
)

# sanity: search still exact on survivors
q = data[int(0.4 * n) : int(0.4 * n) + 16]
res = idx.search(q, k=1)
ok = sum(row[0][0] == ids[int(0.4 * n) + i] for i, row in enumerate(res))
print(f"post-maintenance self-lookup: {ok}/16", flush=True)
