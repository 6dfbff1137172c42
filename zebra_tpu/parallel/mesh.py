"""Mesh helpers.

The reference's only parallelism is a rayon thread pool in one process
(SURVEY.md §2); its README *argues* LSH shards cleanly but implements nothing
(``README.md:31``). This module realises that claim on a TPU mesh: one named
axis ``"shard"`` over which bucket tables and vector slabs are partitioned.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def make_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    """1-D device mesh with axis ``"shard"``.

    ``n_shards`` defaults to every visible device; it must divide the device
    count (extra devices are left idle if fewer shards are requested).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is None:
        n_shards = len(devices)
    if n_shards > len(devices):
        raise ValueError(f"requested {n_shards} shards but only {len(devices)} devices")
    import numpy as np

    return Mesh(np.array(devices[:n_shards]), (SHARD_AXIS,))


def shard_axis_size(mesh: Mesh) -> int:
    return mesh.shape[SHARD_AXIS]
