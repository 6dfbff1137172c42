"""Profiling/observability layer (SURVEY.md §5: tracing rebuild)."""

import numpy as np

from zebra_tpu.profiling import Stats, timed, query_plan_stats


def test_timed_records():
    s = Stats()
    with timed("op", items=10, stats=s):
        pass
    with timed("op", items=5, stats=s):
        pass
    summary = s.summary()
    assert summary["op"]["calls"] == 2
    assert summary["op"]["items"] == 15
    assert summary["op"]["seconds"] >= 0


def test_database_records_stats(tmp_path, rng):
    from zebra_tpu.config import DatabaseConfig
    from zebra_tpu.db import Database

    db = Database.create(str(tmp_path / "s.zebra"), DatabaseConfig(dim=16, model="hash-16"))
    db.insert_documents([b"a", b"b", b"c"])
    db.query_documents([b"a"], 1)
    s = db.stats.summary()
    assert s["insert"]["items"] == 3
    assert s["query"]["calls"] == 1


def test_query_plan_stats(rng):
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.lsh import LSHIndex

    idx = LSHIndex(dim=8, options=IndexOptions(num_tables=4, bits=5, seed=0))
    idx.add(rng.standard_normal((50, 8)).astype(np.float32))
    plan = query_plan_stats(idx.state, num_probes=6)
    assert plan["buckets_probed"] == 24
    assert plan["max_candidates"] == 24 * idx.state.bucket_capacity
    assert plan["bucket_rows"] == 32


def test_device_trace_annotation_noop():
    from zebra_tpu.profiling import device_trace

    with device_trace("test-region"):
        pass
