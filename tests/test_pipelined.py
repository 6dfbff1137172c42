"""Double-buffered query pipelining (round-3 verdict #6).

The contract: search_stream / query_stream return exactly what per-batch
search() / query() would, batch for batch — pipelining only reorders the
host-side waits (submit t+1 before collecting t), never the math.
"""

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database
from zebra_tpu.index import make_index


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("index_type", ["ivf", "lsh"])
def test_search_stream_matches_search(rng, index_type):
    pts = rng.standard_normal((600, 32)).astype(np.float32)
    idx = make_index(
        dim=32, metric="sql2",
        options=IndexOptions(index_type=index_type, seed=0),
    )
    idx.add(pts)
    batches = [pts[i * 50 : (i + 1) * 50] + 0.01 for i in range(4)]
    expect = [idx.search(b, k=5) for b in batches]
    got = list(idx.search_stream(batches, k=5))
    assert got == expect


def test_search_submit_collect_overlap(rng):
    """Two submits may be in flight; collects resolve in any order."""
    pts = rng.standard_normal((400, 16)).astype(np.float32)
    idx = make_index(dim=16, options=IndexOptions(index_type="ivf", seed=0))
    idx.add(pts)
    t1 = idx.search_submit(pts[:10], 3)
    t2 = idx.search_submit(pts[10:20], 3)
    d2, s2, v2 = idx.search_collect(t2)
    d1, s1, v1 = idx.search_collect(t1)
    ds, ss, vs = idx.search_arrays(pts[:20], 3)
    assert np.allclose(np.concatenate([d1, d2]), ds, rtol=1e-5)
    assert np.array_equal(np.concatenate([s1, s2]), ss)


def test_query_stream_matches_query(tmp_path, rng):
    pts = rng.standard_normal((300, 24)).astype(np.float32)
    db = Database.create(
        str(tmp_path / "p.zebra"),
        DatabaseConfig(dim=24, metric="sql2",
                       index=IndexOptions(index_type="ivf", seed=0)),
    )
    db.insert_vectors(pts)
    batches = [pts[:40], pts[40:80], pts[80:120]]
    expect = [db.query(b, number_of_results=4) for b in batches]
    got = list(db.query_stream(batches, number_of_results=4))
    assert got == expect
    db.close()


def test_query_stream_empty_db(tmp_path, rng):
    db = Database.create(
        str(tmp_path / "e.zebra"), DatabaseConfig(dim=8, metric="sql2")
    )
    out = list(db.query_stream([rng.standard_normal((3, 8))], 2))
    assert out == [[[], [], []]]
    db.close()


def test_query_stream_mutation_between_batches(tmp_path, rng):
    """A mutation between submit and collect must not corrupt the in-flight
    batch (functional state: the dispatched computation references the
    pre-mutation arrays)."""
    pts = rng.standard_normal((200, 16)).astype(np.float32)
    db = Database.create(
        str(tmp_path / "m.zebra"),
        DatabaseConfig(dim=16, metric="sql2",
                       index=IndexOptions(index_type="ivf", seed=0)),
    )
    db.insert_vectors(pts)
    expect_first = db.query(pts[:10], number_of_results=3)

    def gen():
        yield pts[:10]
        # first batch is now in flight; mutate before it is collected
        db.insert_vectors(rng.standard_normal((50, 16)).astype(np.float32))
        yield pts[10:20]

    got = list(db.query_stream(gen(), number_of_results=3))
    assert got[0] == expect_first
    assert len(got) == 2 and got[1]
    db.close()
