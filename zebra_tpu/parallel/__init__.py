"""Device-mesh parallelism: sharded bucket tables, collective top-k merge,
tensor-parallel embedding towers."""

from zebra_tpu.parallel.mesh import make_mesh, shard_axis_size
from zebra_tpu.parallel.sharded import ShardedLSHIndex
from zebra_tpu.parallel.towers import make_tower_mesh, shard_tower

__all__ = [
    "make_mesh",
    "shard_axis_size",
    "ShardedLSHIndex",
    "make_tower_mesh",
    "shard_tower",
]
