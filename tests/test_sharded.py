"""Sharded index over the virtual 8-device CPU mesh (SURVEY.md §4 (5))."""

import numpy as np
import pytest

from zebra_tpu.config import IndexOptions
from zebra_tpu.parallel.sharded import ShardedLSHIndex


def make_index(dim=32, metric="cosine", shards=8, **kw):
    # this module targets the LSH sharded path (IVF sharding: test_sharded_ivf)
    defaults = dict(index_type="lsh", num_tables=8, num_probes=8, seed=0)
    defaults.update(kw)
    return ShardedLSHIndex(
        dim=dim, metric=metric, options=IndexOptions(**defaults), shards=shards
    )


def test_mesh_has_8_devices():
    import jax

    assert len(jax.devices()) == 8


def test_sharded_insert_query_roundtrip(rng):
    idx = make_index()
    data = rng.standard_normal((400, 32)).astype(np.float32)
    ids = idx.add(data)
    assert len(ids) == 400 and len(idx) == 400
    res = idx.search(data[:16], k=1)
    for i, row in enumerate(res):
        assert row and row[0][0] == ids[i] and row[0][1] < 1e-3


def test_sharded_matches_exact_on_clustered(rng):
    centers = rng.standard_normal((32, 32)).astype(np.float32)
    data = (centers[rng.integers(0, 32, 2000)] + 0.1 * rng.standard_normal((2000, 32))).astype(np.float32)
    q = data[rng.permutation(2000)[:20]] + 0.03 * rng.standard_normal((20, 32)).astype(np.float32)
    idx = make_index(num_tables=15, num_probes=12)
    idx.add(data)
    approx = idx.search(q, k=10)
    exact = idx.search(q, k=10, exact=True)
    hits = sum(len({i for i, _ in a} & {i for i, _ in e}) for a, e in zip(approx, exact))
    assert hits / (20 * 10) >= 0.9


def test_sharded_exact_matches_single_device_brute_force(rng):
    from zebra_tpu.index.lsh import LSHIndex

    data = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    sharded = make_index(dim=16, shards=8)
    single = LSHIndex(dim=16, metric="cosine", options=IndexOptions(num_tables=8, seed=0))
    ids = [bytes([j]) + bytes([1]) + bytes(14) for j in range(256)] + [
        bytes([j, 2]) + bytes(14) for j in range(244)
    ]
    sharded.add(data, ids=list(ids))
    single.add(data, ids=list(ids))
    rs = sharded.search(q, k=5, exact=True)
    r1 = single.search(q, k=5, exact=True)
    for a, b in zip(rs, r1):
        assert [i for i, _ in a] == [i for i, _ in b]
        np.testing.assert_allclose([d for _, d in a], [d for _, d in b], rtol=1e-4, atol=1e-5)


def test_sharded_remove_and_dedup(rng):
    idx = make_index()
    data = rng.standard_normal((200, 32)).astype(np.float32)
    dup = np.concatenate([data, data[:30]])
    ids = idx.add(dup)
    removed = idx.deduplicate()
    assert len(removed) == 30 and len(idx) == 200
    idx.remove(ids[:100])
    assert len(idx) == 100
    res = idx.search(data[:5], k=3)
    alive = set(ids[100:200])
    for row in res:
        for rid, _ in row:
            assert rid in alive


def test_sharded_save_load(rng, tmp_path):
    idx = make_index()
    data = rng.standard_normal((300, 32)).astype(np.float32)
    idx.add(data)
    idx.save(str(tmp_path / "sidx"))
    idx2 = ShardedLSHIndex.load(str(tmp_path / "sidx"))
    assert len(idx2) == 300
    r1 = idx.search(data[:8], k=3)
    r2 = idx2.search(data[:8], k=3)
    assert [[i for i, _ in row] for row in r1] == [[i for i, _ in row] for row in r2]


def test_sharded_growth(rng):
    idx = make_index()
    for _ in range(4):
        idx.add(rng.standard_normal((600, 32)).astype(np.float32))
    assert len(idx) == 2400
    assert idx.search(rng.standard_normal((32,)).astype(np.float32), 5)[0]


def test_sharded_database_facade(rng, tmp_path):
    from zebra_tpu.config import DatabaseConfig
    from zebra_tpu.db import Database

    cfg = DatabaseConfig(dim=24, metric="cosine", model="hash-24", shards=4)
    db = Database.open_or_create(str(tmp_path / "s.zebra"), cfg)
    docs = [f"doc {i}".encode() for i in range(100)]
    db.insert_documents(docs)
    res = db.query_documents([docs[7]], number_of_results=2)
    assert docs[7] in res[0].values()
    db2 = Database.open(str(tmp_path / "s.zebra"))
    assert len(db2) == 100
    res2 = db2.query_documents([docs[7]], number_of_results=2)
    assert docs[7] in res2[0].values()
