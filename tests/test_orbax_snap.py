"""Optional orbax snapshot backend (IndexOptions.snapshot_format="orbax").

Round-trips single-shard and mesh-sharded indexes through an orbax
checkpoint directory, and verifies format dispatch/switching: the container
is recorded in index.json, so load() needs no knob, and re-saving under the
other format removes the stale artifact.
"""

import os

import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import load_index, make_index
from zebra_tpu.storage import orbax_snap


def test_orbax_arrays_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    arrays = {
        "f32": rng.standard_normal((50, 7)).astype(np.float32),
        "u8": rng.integers(0, 255, (9, 16)).astype(np.uint8),
        "scalar": np.asarray(42, np.int32),
        "dev_bf16": jnp.asarray(
            rng.standard_normal((17, 4)).astype(np.float32)
        ).astype(jnp.bfloat16),
    }
    path = str(tmp_path / "ck")
    orbax_snap.save_arrays_orbax(path, arrays)
    out = orbax_snap.load_arrays_orbax(path)
    assert set(out) == set(arrays)
    np.testing.assert_array_equal(out["f32"], arrays["f32"])
    np.testing.assert_array_equal(out["u8"], arrays["u8"])
    assert int(out["scalar"]) == 42
    # bf16 restores as native ml_dtypes bf16 (slab_from_np accepts it)
    np.testing.assert_array_equal(
        np.asarray(out["dev_bf16"], dtype=np.float32),
        np.asarray(arrays["dev_bf16"], dtype=np.float32),
    )
    # overwrite (force) with different content must fully replace
    orbax_snap.save_arrays_orbax(path, {"only": np.arange(3)})
    out2 = orbax_snap.load_arrays_orbax(path)
    assert set(out2) == {"only"}


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_index_orbax_snapshot_roundtrip(tmp_path, rng, dtype):
    data = rng.standard_normal((300, 16)).astype(np.float32)
    idx = make_index(
        16, metric="sql2", options=IndexOptions(seed=0, dtype=dtype, snapshot_format="orbax")
    )
    ids = idx.add(data)
    idx.remove([ids[7]])
    d = str(tmp_path / "idx")
    idx.save(d)
    assert os.path.isdir(os.path.join(d, "arrays.orbax"))
    assert not os.path.exists(os.path.join(d, "arrays.npz"))
    idx2 = load_index(d)  # dispatches on index.json, no knob needed
    assert len(idx2) == 299
    res = idx2.search(data[:5], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]
    assert ids[7] not in idx2


def test_snapshot_format_switch_removes_stale_artifact(tmp_path, rng):
    data = rng.standard_normal((100, 8)).astype(np.float32)
    idx = make_index(8, options=IndexOptions(seed=1, snapshot_format="orbax"))
    idx.add(data)
    d = str(tmp_path / "idx")
    idx.save(d)
    assert os.path.isdir(os.path.join(d, "arrays.orbax"))
    # switch back to npz: the orbax dir must not linger beside the npz
    idx.options = IndexOptions(seed=1, snapshot_format="npz")
    idx.save(d)
    assert os.path.exists(os.path.join(d, "arrays.npz"))
    assert not os.path.exists(os.path.join(d, "arrays.orbax"))
    idx2 = load_index(d)
    assert len(idx2) == 100


def test_sharded_orbax_snapshot_roundtrip(tmp_path, rng):
    """Mesh-sharded device arrays write through orbax (the multi-host
    rationale for the backend) and restore topology-portably."""
    from zebra_tpu.parallel.sharded import ShardedIndex

    data = rng.standard_normal((400, 12)).astype(np.float32)
    idx = ShardedIndex(
        12,
        metric="cosine",
        options=IndexOptions(seed=0, dtype="bfloat16", snapshot_format="orbax"),
        shards=4,
    )
    ids = idx.add(data)
    d = str(tmp_path / "sh")
    idx.save(d)
    assert os.path.isdir(os.path.join(d, "arrays.orbax"))
    idx2 = ShardedIndex.load(d)
    assert len(idx2) == 400
    res = idx2.search(data[:6], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]
    # reshard-on-load path reads through the same dispatcher
    idx3 = ShardedIndex.load(d, shards=2)
    assert idx3.shards == 2 and len(idx3) == 400
    res3 = idx3.search(data[:6], k=1)
    for i, row in enumerate(res3):
        assert row[0][0] == ids[i]
