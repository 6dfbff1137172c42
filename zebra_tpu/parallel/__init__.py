"""Device-mesh parallelism: sharded bucket tables + collective top-k merge."""

from zebra_tpu.parallel.mesh import make_mesh, shard_axis_size
from zebra_tpu.parallel.sharded import ShardedLSHIndex

__all__ = ["make_mesh", "shard_axis_size", "ShardedLSHIndex"]
