"""Config serialization, utils, and metric-power plumbing."""

import json
import os

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.utils import fsync_write, next_pow2, uuid7_bytes


def test_index_options_json_roundtrip():
    o = IndexOptions(num_tables=7, bits=9, num_probes=3, dtype="bfloat16",
                     plane_mode="random", index_type="flat", rerank="pallas")
    o2 = IndexOptions.from_json(json.loads(json.dumps(o.to_json())))
    assert o == o2


def test_database_config_roundtrip():
    c = DatabaseConfig(dim=123, metric="minkowski", metric_power=4.0,
                       model="hash-123", shards=4,
                       index=IndexOptions(num_tables=3))
    c2 = DatabaseConfig.loads(c.dumps())
    assert c == c2


def test_config_ignores_unknown_fields():
    d = DatabaseConfig(dim=8).to_json()
    d["future_field"] = 42
    d["index"]["other_future"] = "x"
    c = DatabaseConfig.from_json(d)
    assert c.dim == 8


def test_resolved_bits_monotone():
    o = IndexOptions()
    bits = [o.resolved_bits(n) for n in (10, 100, 10_000, 1_000_000, 10**9)]
    assert bits == sorted(bits)
    assert bits[-1] <= 16
    assert IndexOptions(bits=7).resolved_bits(10**9) == 7


def test_next_pow2():
    assert [next_pow2(x) for x in (1, 2, 3, 1024, 1025)] == [1, 2, 4, 1024, 2048]


def test_uuid7_layout_and_ordering():
    a, b = uuid7_bytes(), uuid7_bytes()
    assert len(a) == 16 and a != b
    assert a[6] >> 4 == 7  # version nibble
    assert a[8] >> 6 == 0b10  # variant
    assert a[:6] <= b[:6]  # time-ordered prefix


def test_fsync_write_atomic(tmp_path):
    p = str(tmp_path / "f.bin")
    fsync_write(p, b"one")
    fsync_write(p, b"two")
    with open(p, "rb") as f:
        assert f.read() == b"two"
    assert not [x for x in os.listdir(tmp_path) if ".tmp" in x]


def test_metric_power_flows_to_results(rng, tmp_path):
    from zebra_tpu.index.lsh import LSHIndex
    from zebra_tpu.ops.distances import pairwise

    data = rng.standard_normal((100, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    for power in (3.0, 4.0):
        idx = LSHIndex(dim=16, metric="minkowski", metric_power=power,
                       options=IndexOptions(num_tables=6, seed=0))
        ids = idx.add(data)
        res = idx.search(q, k=3, exact=True)
        d = np.asarray(pairwise(q, data, metric="minkowski", power=power))
        for b, row in enumerate(res):
            want = [ids[j] for j in np.argsort(d[b])[:3]]
            assert [i for i, _ in row] == want


def test_uuid7_batch_format_and_uniqueness():
    from zebra_tpu.utils import uuid7_batch, uuid7_bytes

    ids = uuid7_batch(5000)
    assert len(ids) == 5000 and len(set(ids)) == 5000
    for i in ids[:50]:
        assert len(i) == 16
        assert i[6] >> 4 == 0x7  # version 7
        assert i[8] >> 6 == 0b10  # RFC variant
    # layout matches the scalar generator
    one = uuid7_bytes()
    assert one[6] >> 4 == 0x7 and one[8] >> 6 == 0b10
    assert uuid7_batch(0) == []
