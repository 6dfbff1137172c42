"""zebra-tpu: a TPU-native embedded approximate-nearest-neighbour vector database.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of ``emmyoh/zebra``
(reference: Rust LSH forest over an LSM KV store). The design is TPU-first:

- random-hyperplane hashing is ONE batched matmul on the MXU with sign-bit
  packing into integer hash keys (reference: per-vector SIMD dot products while
  descending a pointer tree, ``src/database/index/lsh.rs:39-43``);
- the forest of binary trees becomes HBM-resident fixed-capacity bucket tables
  ``[num_tables, 2^bits, bucket_capacity]`` (reference: serialized tree nodes in
  an LSM store, ``src/database/index/lsh.rs:46-60``);
- tree backtracking becomes multi-probe (flipping lowest-|margin| hash bits,
  reference: sibling descent at ``src/database/index/lsh.rs:340-345``);
- candidate re-rank is a fused gather + exact-distance + top-k kernel;
- scale-out is a ``jax.sharding.Mesh``: bucket tables and the vector slab are
  sharded across devices, per-shard partial top-k results merge with an ICI
  all-gather (the reference's rayon thread pool + DashSet union,
  ``src/database/index/lsh.rs:550-556``, has no multi-device analogue).
"""

from zebra_tpu.config import IndexOptions, DatabaseConfig
from zebra_tpu.db import Database
from zebra_tpu.index.lsh import LSHIndex
from zebra_tpu.index.ivf_host import IVFIndex
from zebra_tpu.index import make_index, load_index
from zebra_tpu import defaults
from zebra_tpu.defaults import (
    DefaultTextDatabase,
    DefaultImageDatabase,
    DefaultAudioDatabase,
    text_db,
    image_db,
    audio_db,
)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: ShardedLSHIndex builds a Mesh at construction, keep import light
    if name == "ShardedLSHIndex":
        from zebra_tpu.parallel.sharded import ShardedLSHIndex

        return ShardedLSHIndex
    raise AttributeError(name)


__all__ = [
    "IndexOptions",
    "DatabaseConfig",
    "Database",
    "LSHIndex",
    "IVFIndex",
    "make_index",
    "load_index",
    "ShardedLSHIndex",
    "DefaultTextDatabase",
    "DefaultImageDatabase",
    "DefaultAudioDatabase",
    "text_db",
    "image_db",
    "audio_db",
    "__version__",
]
