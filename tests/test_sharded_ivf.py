"""Sharded IVF: per-shard partitions, collective merge, persistence."""

import numpy as np
import pytest

from zebra_tpu.config import IndexOptions
from zebra_tpu.parallel.sharded import ShardedLSHIndex


def _opts(**kw):
    kw.setdefault("index_type", "ivf")
    kw.setdefault("seed", 0)
    kw.setdefault("num_probes", 8)
    return IndexOptions(**kw)


def _data(rng, n, dim, clusters=32, sigma=0.08):
    centers = rng.standard_normal((clusters, dim)).astype(np.float32)
    a = rng.integers(0, clusters, n)
    return centers[a] + sigma * rng.standard_normal((n, dim)).astype(np.float32)


def test_sharded_ivf_matches_exact(rng):
    data = _data(rng, 1200, 32)
    ix = ShardedLSHIndex(dim=32, metric="cosine", options=_opts(), shards=8)
    ids = ix.add(data)
    assert len(ix) == 1200
    q = data[:64] + 0.02 * rng.standard_normal((64, 32)).astype(np.float32)
    approx = ix.search(q, k=10)
    exact = ix.search(q, k=10, exact=True)
    hits = sum(
        len({i for i, _ in approx[b]} & {i for i, _ in exact[b]}) for b in range(64)
    )
    assert hits / 640 >= 0.9
    st = ix.stats()
    assert st["shards"] == 8 and st["used_slots"] == 1200


def test_sharded_ivf_self_lookup_and_remove(rng):
    data = _data(rng, 800, 24)
    ix = ShardedLSHIndex(dim=24, metric="sql2", options=_opts(), shards=4)
    ids = ix.add(data)
    res = ix.search(data[:40], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i] and row[0][1] < 1e-3
    removed = ix.remove(ids[:100])
    assert len(removed) == 100 and len(ix) == 700
    res2 = ix.search(data[:40], k=1)
    gone = set(ids[:100])
    for row in res2:
        assert row and row[0][0] not in gone


def test_sharded_ivf_save_load_roundtrip(tmp_path, rng):
    data = _data(rng, 600, 16)
    ix = ShardedLSHIndex(dim=16, options=_opts(), shards=8)
    ids = ix.add(data)
    ix.save(str(tmp_path / "si"))
    loaded = ShardedLSHIndex.load(str(tmp_path / "si"))
    assert loaded._ivf and len(loaded) == 600
    assert loaded.search(data[:10], k=1) == ix.search(data[:10], k=1)
    # reshard on load to a smaller mesh
    re2 = ShardedLSHIndex.load(str(tmp_path / "si"), shards=2)
    assert re2.shards == 2 and len(re2) == 600
    got = re2.search(data[:10], k=1, exact=True)
    want = ix.search(data[:10], k=1, exact=True)
    for a, b in zip(want, got):
        assert a[0][0] == b[0][0]


def test_sharded_ivf_spare_growth(rng):
    # near-identical vectors saturate clusters; spare must absorb on shards
    data = np.ones((400, 16), np.float32) + 0.001 * rng.standard_normal(
        (400, 16)
    ).astype(np.float32)
    ix = ShardedLSHIndex(
        dim=16,
        options=_opts(num_clusters=4, cluster_capacity=16, spill=2,
                      spare_capacity=32),
        shards=2,
    )
    ix.add(data)
    assert len(ix) == 400  # nothing dropped
    res = ix.search(data[:20], k=1)
    assert all(row and row[0][1] < 1e-4 for row in res)


def test_sharded_ivf_pallas_dim_guard():
    with pytest.raises(ValueError, match="128"):
        ShardedLSHIndex(dim=48, options=_opts(rerank="pallas"), shards=2)
