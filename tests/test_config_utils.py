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
    # cap is now the HBM table budget, not a hard 16 (round-4 verdict #4)
    per_bucket = o.num_tables * (o.resolved_bucket_capacity() + 1) * 4
    assert per_bucket * 2 ** bits[-1] <= IndexOptions.TABLE_HBM_BUDGET
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


def test_auto_tier_resolution():
    """The bare defaults ARE the measured headline tier (round-3 verdict
    #2): "auto" knobs resolve at index construction, keyed on the ACTUAL
    backend class, and the manifest keeps the user's "auto" so each process
    re-resolves (rerank is platform-dependent by design)."""
    from zebra_tpu.index import make_index
    from zebra_tpu.index.lsh import LSHIndex

    opts = IndexOptions()
    assert (opts.dtype, opts.refine, opts.rerank) == ("auto", "auto", "auto")
    # ivf (the default index_type): the headline tier
    idx = make_index(dim=256, options=opts)
    assert idx.options.dtype == "int8"
    assert idx.options.refine == "scan"
    assert idx.options.rerank == "xla"  # CPU backend in tests -> xla
    assert idx.options.resolved_probes() == 2
    # a DIRECTLY constructed LSHIndex resolves for what it IS, even though
    # the options field still says "ivf"
    lsh = LSHIndex(dim=16, options=IndexOptions(num_tables=4))
    assert lsh.options.dtype == "float32" and lsh.options.refine == 0
    # manifest round-trip persists the user's "auto"
    cfg = DatabaseConfig(dim=768)
    assert DatabaseConfig.loads(cfg.dumps()).index.dtype == "auto"
    # explicit knobs pass through untouched
    ex = IndexOptions(dtype="bfloat16", refine=0, rerank="xla")
    assert ex.concrete(768) is ex


def test_tier_presets():
    fast = IndexOptions.tier("fast")
    assert (fast.dtype, fast.refine) == ("int8", "scan")
    bal = IndexOptions.tier("balanced", num_probes=8)
    assert bal.dtype == "bfloat16" and bal.num_probes == 8
    exact = IndexOptions.tier("exact")
    assert exact.index_type == "flat" and exact.dtype == "float32"
    with pytest.raises(ValueError, match="unknown tier"):
        IndexOptions.tier("warp")


def test_query_wire_policy():
    """search path / shape warm / bench stage table all consult this one
    helper — policy: auto = bf16 for reduced slabs except refined int8
    (measured flip keeps recall but costs ~4e-4 distance error,
    r5_ann_qwire_bf16.json — so it stays an opt-in); bfloat16 forces;
    float32 never."""
    auto_int8 = IndexOptions(index_type="ivf", dtype="int8", refine="scan")
    assert not auto_int8.query_wire_is_bf16()  # refined: exact f32 queries
    assert IndexOptions(index_type="ivf", dtype="int8", refine=0).query_wire_is_bf16()
    assert IndexOptions(dtype="bfloat16").query_wire_is_bf16()
    assert not IndexOptions(dtype="float32").query_wire_is_bf16()
    forced = IndexOptions(index_type="ivf", dtype="int8", refine="scan",
                          query_wire="bfloat16")
    assert forced.query_wire_is_bf16()
    assert not IndexOptions(dtype="bfloat16", query_wire="float32").query_wire_is_bf16()


def test_resolved_capacity_hbm_aware():
    """Default cluster capacity steps its padding multiplier down at
    capacity scale so the whole slab fits the HBM stage budget (a bare
    4M x 768 int8+residual build used to resolve 2.2n slots = 13.4GB and
    OOM a 16GB chip); the 1M x 768 headline sizing is unchanged."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import (
        _STAGE_HBM_BUDGET, _slot_hbm_bytes, resolved_capacity,
        resolved_clusters, resolved_spare,
    )

    o = IndexOptions(index_type="ivf").concrete(768, index_type="ivf")
    k1 = resolved_clusters(o, 1_000_000)
    assert resolved_capacity(o, 1_000_000, k1, dim=768) == 128
    k4 = resolved_clusters(o, 4_000_000)
    c4 = resolved_capacity(o, 4_000_000, k4, dim=768)
    slab = (k4 * c4 + resolved_spare(o, 4_000_000)) * _slot_hbm_bytes(o, 768)
    assert slab <= 0.85 * _STAGE_HBM_BUDGET
    assert c4 * k4 >= 1.2 * 4_000_000  # still real headroom over mean load
    # dim unknown -> legacy 2x-mean sizing; explicit capacity always wins
    assert resolved_capacity(o, 4_000_000, k4) > c4
    o2 = IndexOptions(index_type="ivf", cluster_capacity=64)
    assert resolved_capacity(o2, 4_000_000, k4, dim=768) == 64
