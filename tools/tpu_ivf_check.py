"""TPU validation of the IVF pallas kernel: Mosaic compile + match vs XLA.

Run serially (one TPU process at a time):
  nohup python -u tools/tpu_ivf_check.py > /tmp/ivf_check.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from zebra_tpu.index import ivf
from zebra_tpu.ops.kmeans import kmeans

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
D = 768
K = 256
C = 128
n = 16384
centers = rng.standard_normal((200, D)).astype(np.float32)
data = centers[rng.integers(0, 200, n)] + 0.1 * rng.standard_normal((n, D)).astype(
    np.float32
)

t0 = time.perf_counter()
cents, counts = kmeans(jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=K, iters=5)
device_sync(cents)
print(f"kmeans: {time.perf_counter()-t0:.1f}s, max load {int(np.asarray(counts).max())}", flush=True)

st = ivf.empty_state(cents, cluster_capacity=C)
t0 = time.perf_counter()
st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
slots = np.asarray(slots)
print(f"insert: {time.perf_counter()-t0:.1f}s, dropped={int(st.overflow)}", flush=True)

# tombstones exercise the valid mask
st = ivf.delete_slots(st, jnp.asarray(slots[:100].astype(np.int32)))

q = jnp.asarray(data[:256] + 0.02 * rng.standard_normal((256, D)).astype(np.float32))
for metric in ("cosine", "sql2"):
    t0 = time.perf_counter()
    d1, s1, v1 = ivf.query(st, q, 10, metric=metric, num_probes=8, rerank="xla")
    device_sync(d1)
    t_xla_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    d2, s2, v2 = ivf.query(st, q, 10, metric=metric, num_probes=8, rerank="pallas")
    device_sync(d2)
    t_pal_c = time.perf_counter() - t0
    s1, s2, v1, v2 = map(np.asarray, (s1, s2, v1, v2))
    d1, d2 = map(np.asarray, (d1, d2))
    eq_slots = (s1 == s2).mean()
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(d1, d2, rtol=2e-3, atol=2e-3)
    print(
        f"{metric}: slots agree {eq_slots:.4f} "
        f"(compile+run xla {t_xla_c:.1f}s pallas {t_pal_c:.1f}s)",
        flush=True,
    )

print("TPU IVF kernel check: OK", flush=True)
