"""Optional orbax/tensorstore snapshot backend (``snapshot_format="orbax"``).

The default streamed-npz writer (:mod:`zebra_tpu.storage.snapshots`) is a
single file with bounded host memory — ideal for one host. On a MULTI-HOST
mesh it would still funnel every shard's bytes through one process. This
backend persists the same snapshot dict as an orbax checkpoint (a directory
of tensorstore arrays): jax device arrays are written through orbax's
standard multi-host protocol — each host writes only the shards it owns —
with chunked, checksummed tensorstore I/O and an atomic finalise (tmp dir +
commit marker + rename, the same crash contract as
:func:`zebra_tpu.utils.fsync_write`).

Select with ``IndexOptions(snapshot_format="orbax")``; the chosen format is
recorded in the snapshot's ``index.json`` so ``load()`` dispatches without
user input. Restore is host-side numpy (bf16 arrives as native ml_dtypes
bfloat16 — :func:`zebra_tpu.index.base.slab_from_np` accepts both that and
the npz uint16-bits encoding), so a checkpoint written on an 8-host mesh
opens on a single dev box and vice versa.

Reference analogue: fjall LSM segment persistence
(``/root/reference/src/database/index/lsh.rs:71-89``) — this is the
multi-host-capable variant of the same durability contract.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["have_orbax", "save_arrays_orbax", "load_arrays_orbax"]


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def _checkpointer():
    try:
        import orbax.checkpoint as ocp
    except Exception as e:  # pragma: no cover - exercised only without orbax
        raise ImportError(
            "snapshot_format='orbax' requires the optional dependency "
            "orbax-checkpoint (pip install 'zebra-tpu[orbax]'); use the "
            "default snapshot_format='npz' otherwise"
        ) from e
    return ocp, ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_arrays_orbax(path: str, arrays: dict) -> None:
    """Write ``arrays`` (np arrays, np scalars, or jax device arrays —
    including mesh-sharded ones) as an orbax checkpoint directory at
    ``path``, atomically replacing any previous checkpoint there."""
    _, ckptr = _checkpointer()
    # orbax requires an absolute path and finalises atomically; force=True
    # gives overwrite semantics matching write_npz_streamed's os.replace
    ckptr.save(os.path.abspath(path), dict(arrays), force=True)


def load_arrays_orbax(path: str) -> dict:
    """Restore an orbax checkpoint directory as ``{name: np.ndarray}``.

    Restores host-side on purpose (``RestoreArgs(restore_type=np.ndarray)``):
    the index's ``_restore_arrays`` re-places arrays onto whatever mesh the
    OPENING process has, so a checkpoint is topology-portable — restoring
    with the saved sharding would pin it to the writing topology.
    """
    ocp, ckptr = _checkpointer()
    apath = os.path.abspath(path)
    keys = list(ckptr.metadata(apath).item_metadata.keys())
    restore_args = {k: ocp.RestoreArgs(restore_type=np.ndarray) for k in keys}
    return dict(ckptr.restore(apath, restore_args=restore_args))
