"""ANN index backends: device state/ops plus host orchestration layers.

Backends: "lsh" (bucket tables, reference parity), "flat" (exact MXU scan),
"ivf" (learned partitions, cluster-contiguous slab — the TPU-fast path).
"""

from zebra_tpu.index.buckets import IndexState, empty_state, insert, delete_slots, query, brute_force
from zebra_tpu.index.ivf_host import IVFIndex
from zebra_tpu.index.lsh import LSHIndex


def make_index(dim: int, metric: str = "cosine", options=None, metric_power: float = 3.0):
    """Construct the right backend for ``options.index_type``."""
    from zebra_tpu.config import IndexOptions

    options = options or IndexOptions()
    cls = IVFIndex if options.index_type == "ivf" else LSHIndex
    return cls(dim=dim, metric=metric, options=options, metric_power=metric_power)


def load_index(directory: str):
    """Open a saved index, dispatching on the snapshot's ``index_type``."""
    import json
    import os

    with open(os.path.join(directory, "index.json"), "rb") as f:
        meta = json.loads(f.read())
    itype = meta.get("options", {}).get("index_type", "lsh")
    cls = IVFIndex if itype == "ivf" else LSHIndex
    return cls.load(directory)


__all__ = [
    "IndexState",
    "empty_state",
    "insert",
    "delete_slots",
    "query",
    "brute_force",
    "LSHIndex",
    "IVFIndex",
    "make_index",
    "load_index",
]
