"""Flat (exact brute-force) index mode — TPU-native addition."""

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.index.lsh import LSHIndex
from zebra_tpu.ops.distances import pairwise
from zebra_tpu.parallel.sharded import ShardedLSHIndex


def test_flat_exact_results(rng):
    data = rng.standard_normal((500, 32)).astype(np.float32)
    idx = LSHIndex(dim=32, metric="cosine", options=IndexOptions(index_type="flat", seed=0))
    ids = idx.add(data)
    q = rng.standard_normal((7, 32)).astype(np.float32)
    res = idx.search(q, k=5)
    d = np.asarray(pairwise(q, data, metric="cosine"))
    for b, row in enumerate(res):
        want = [ids[j] for j in np.argsort(d[b])[:5]]
        assert [i for i, _ in row] == want


def test_flat_churn_no_rebuild_loop(rng):
    idx = LSHIndex(dim=16, options=IndexOptions(index_type="flat", seed=0))
    for _ in range(5):
        ids = idx.add(rng.standard_normal((200, 16)).astype(np.float32))
        idx.remove(ids[:50])
    assert len(idx) == 5 * 150
    assert idx.search(rng.standard_normal((16,)).astype(np.float32), 3)[0]


def test_flat_approx_topk(rng):
    data = rng.standard_normal((2000, 32)).astype(np.float32)
    exact = LSHIndex(dim=32, options=IndexOptions(index_type="flat", seed=0))
    approx = LSHIndex(dim=32, options=IndexOptions(index_type="flat", seed=0, approx_topk=True))
    ids = [int(i + 1).to_bytes(16, "little") for i in range(2000)]
    exact.add(data, ids=list(ids))
    approx.add(data, ids=list(ids))
    q = data[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32)
    re = exact.search(q, k=10)
    ra = approx.search(q, k=10)
    agree = np.mean([
        len({i for i, _ in a} & {i for i, _ in b}) / 10 for a, b in zip(re, ra)
    ])
    assert agree >= 0.9  # approx_max_k default recall target ~0.95
    assert ra[0][0][0] == ids[0]  # self-match survives approximation


def test_flat_sharded(rng):
    data = rng.standard_normal((400, 24)).astype(np.float32)
    idx = ShardedLSHIndex(dim=24, metric="sql2",
                          options=IndexOptions(index_type="flat", seed=0), shards=8)
    ids = idx.add(data)
    res = idx.search(data[:5], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i] and row[0][1] < 1e-3


def test_flat_database_roundtrip(tmp_path, rng):
    from zebra_tpu.db import Database

    cfg = DatabaseConfig(dim=16, metric="l2", model="hash-16",
                         index=IndexOptions(index_type="flat"))
    db = Database.create(str(tmp_path / "f.zebra"), cfg)
    docs = [f"d{i}".encode() for i in range(40)]
    db.insert_documents(docs)
    db2 = Database.open(str(tmp_path / "f.zebra"))
    assert db2.config.index.index_type == "flat"
    res = db2.query_documents([docs[3]], 1)
    assert docs[3] in res[0].values()
