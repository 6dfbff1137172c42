"""Property-based CRUD sequences (hypothesis) against a reference model.

Random interleavings of add / remove / deduplicate / save+reload must keep
the index consistent with a plain dict model: same live set, exact search
returns the true nearest stored vector, removed ids never reappear.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zebra_tpu.config import IndexOptions
from zebra_tpu.index import load_index, make_index

DIM = 12


def _vec(rng, tag: int) -> np.ndarray:
    r = np.random.default_rng(tag)
    return r.standard_normal(DIM).astype(np.float32)


ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(1, 12)),
        st.tuples(st.just("remove"), st.integers(0, 30)),
        st.tuples(st.just("dedup"), st.just(0)),
        st.tuples(st.just("reload"), st.just(0)),
    ),
    min_size=1,
    max_size=8,
)


@pytest.mark.parametrize("index_type", ["lsh", "ivf"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy, seed=st.integers(0, 2**16))
def test_crud_sequences_match_model(tmp_path_factory, index_type, ops, seed):
    rng = np.random.default_rng(seed)
    idx = make_index(
        DIM, metric="sql2",
        options=IndexOptions(index_type=index_type, seed=0, num_probes=8),
    )
    model: dict[bytes, int] = {}  # id -> vector tag
    next_tag = seed * 1000 + 1

    for op, arg in ops:
        if op == "add":
            tags = list(range(next_tag, next_tag + arg))
            next_tag += arg
            vecs = np.stack([_vec(rng, t) for t in tags])
            ids = idx.add(vecs)
            for i, t in zip(ids, tags):
                model[i] = t
        elif op == "remove":
            live = sorted(model)
            kill = live[: arg % (len(live) + 1)]
            removed = idx.remove(list(kill) + [b"\xff" * 16])  # unknown id too
            assert sorted(removed) == sorted(kill)
            for i in kill:
                del model[i]
        elif op == "dedup":
            # vectors are tag-unique here, so dedup must remove nothing
            assert idx.deduplicate() == []
        elif op == "reload":
            d = tmp_path_factory.mktemp("ix")
            idx.save(str(d))
            idx = load_index(str(d))

        assert len(idx) == len(model)
        for i in model:
            assert i in idx
        if model:
            # exact search: the stored vector itself must come back first.
            # Self-distance bound: the DEFAULT ivf tier stores ~15-bit
            # reconstructions (int8 + int8 residual), whose self sql2
            # distance measures ~2e-6 at DIM=12 — 1e-4 keeps the property
            # meaningful (inter-point distances are O(2*DIM)) without
            # pinning the tier to f32.
            probe_ids = sorted(model)[:3]
            queries = np.stack([_vec(rng, model[i]) for i in probe_ids])
            res = idx.search(queries, k=1, exact=True)
            for want, row in zip(probe_ids, res):
                assert row and row[0][0] == want and row[0][1] < 1e-4


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(2, 40),
    dup_every=st.integers(2, 5),
    seed=st.integers(0, 2**16),
)
def test_dedup_keeps_exactly_one_of_each(n, dup_every, seed):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM)).astype(np.float32)
    dups = base[::dup_every]
    idx = make_index(DIM, options=IndexOptions(index_type="ivf", seed=0))
    idx.add(np.concatenate([base, dups]))
    removed = idx.deduplicate()
    assert len(removed) == len(dups)
    assert len(idx) == n
    assert idx.deduplicate() == []  # idempotent


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("insert"), st.integers(1, 16)),
            st.tuples(st.just("remove"), st.integers(1, 8)),
            st.tuples(st.just("dedup"), st.just(0)),
            st.tuples(st.just("reopen"), st.just(0)),
            st.tuples(st.just("save"), st.just(0)),
        ),
        min_size=2,
        max_size=6,
    ),
    seed=st.integers(0, 2**16),
)
def test_sharded_facade_crud_interleavings(tmp_path_factory, ops, seed):
    """Random CRUD interleavings through the full `Database` FACADE with
    shards > 1 (ROADMAP #7): blobs, WRITE-AHEAD delta log, id maps and the
    sharded index must stay mutually consistent across close/reopen — the
    reopen replays the delta log (crash-recovery path), so every interleaving
    also exercises WAL replay on a sharded index."""
    from zebra_tpu.config import DatabaseConfig
    from zebra_tpu.db import Database

    d = tmp_path_factory.mktemp("sfac")
    path = str(d / "db.zebra")
    cfg = DatabaseConfig(
        dim=12,
        metric="sql2",
        model="hash-12",
        shards=4,
        durability="full",
        index=IndexOptions(seed=1, kmeans_iters=2, kmeans_balance_rounds=1),
    )
    db = Database.open_or_create(path, cfg)
    live: dict[bytes, bytes] = {}  # id -> document
    tag = seed * 10_000
    try:
        for op, arg in ops:
            if op == "insert":
                docs = [f"doc-{tag + i}".encode() for i in range(arg)]
                tag += arg
                ids = db.insert_documents(docs)
                assert len(ids) == len(docs)
                live.update(zip(ids, docs))
            elif op == "remove" and live:
                victims = sorted(live)[:arg]
                db.remove(victims + [b"\xfe" * 16])  # unknown id is a no-op
                for v in victims:
                    live.pop(v)
            elif op == "dedup":
                db.deduplicate()  # tag-unique docs: must remove nothing
            elif op == "save":
                db.save()
            elif op == "reopen":
                db.close()
                db = Database.open(path)
            assert len(db) == len(live)
        if live:
            probe = sorted(live)[:8]
            res = db.query_documents([live[i] for i in probe],
                                     number_of_results=1)
            for qi, want in enumerate(probe):
                hit = res[qi]
                assert list(hit.keys()) == [want]
                assert hit[want] == live[want]
    finally:
        db.close()


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("add"), st.integers(1, 24)),
            st.tuples(st.just("remove"), st.integers(1, 12)),
            st.tuples(st.just("dedup"), st.just(0)),
            st.tuples(st.just("reload"), st.just(0)),
        ),
        min_size=2,
        max_size=6,
    ),
    seed=st.integers(0, 2**16),
)
def test_sharded_crud_interleavings(tmp_path_factory, ops, seed):
    """Random CRUD interleavings on the SHARDED index (8-way CPU mesh) keep
    the live set exact — same contract the single-shard property test
    enforces (ROADMAP round-3 item)."""
    from zebra_tpu.parallel.sharded import ShardedIndex

    rng = np.random.default_rng(seed)
    dim = 12
    idx = ShardedIndex(
        dim=dim, metric="sql2",
        options=IndexOptions(seed=1, kmeans_iters=2, kmeans_balance_rounds=1),
        shards=8,
    )
    live: dict[bytes, np.ndarray] = {}
    tag = 0
    tmp = tmp_path_factory.mktemp("sprop")
    for op, arg in ops:
        if op == "add":
            # tag-unique vectors so dedup is a guaranteed no-op
            vecs = np.zeros((arg, dim), np.float32)
            vecs[:, 0] = np.arange(tag, tag + arg)
            vecs[:, 1:] = rng.standard_normal((arg, dim - 1)).astype(np.float32)
            tag += arg
            ids = idx.add(vecs)
            live.update(zip(ids, vecs))
        elif op == "remove" and live:
            victims = list(live)[:arg]
            removed = idx.remove(victims)
            assert sorted(removed) == sorted(victims)
            for v in victims:
                live.pop(v)
        elif op == "dedup":
            assert idx.deduplicate() == []
        elif op == "reload":
            d = str(tmp / f"s{tag}")
            idx.save(d)
            idx = ShardedIndex.load(d)
        assert len(idx) == len(live)
    if live:
        items = list(live.items())[:16]
        res = idx.search(np.stack([v for _, v in items]), k=1)
        for (i, _v), row in zip(items, res):
            assert row and row[0][0] == i
