"""Database facade: lifecycle, CRUD, persistence (SURVEY.md §4 (3))."""

import json
import os

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database


@pytest.fixture
def cfg():
    return DatabaseConfig(dim=32, metric="cosine", model="hash-32",
                          index=IndexOptions(num_tables=8, seed=0))


def test_create_open_roundtrip(tmp_path, cfg):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, cfg)
    docs = [f"document {i}".encode() for i in range(50)]
    ids = db.insert_documents(docs)
    assert len(db) == 50

    db2 = Database.open(path)
    assert len(db2) == 50
    assert db2.config == cfg
    assert db2.uuid == db.uuid
    res = db2.query_documents([docs[7]], 1)
    assert docs[7] in res[0].values()


def test_insert_records_and_query_vectors(tmp_path, cfg, rng):
    db = Database.create(str(tmp_path / "v.zebra"), cfg)
    vecs = rng.standard_normal((30, 32)).astype(np.float32)
    docs = [f"payload {i}".encode() for i in range(30)]
    db.insert_records(vecs, docs)
    res = db.query_vectors(vecs[:3], 1)
    for qi in range(3):
        assert docs[qi] in res[qi].values()


def test_query_detailed_sorted(tmp_path, cfg, rng):
    db = Database.create(str(tmp_path / "d.zebra"), cfg)
    vecs = rng.standard_normal((100, 32)).astype(np.float32)
    db.insert_records(vecs, [f"{i}".encode() for i in range(100)])
    rows = db.query(vecs[:2], number_of_results=5, with_documents=True)
    for row in rows:
        dists = [d for _, d, _ in row]
        assert dists == sorted(dists)
        assert row[0][1] < 1e-3
        assert row[0][2] is not None


def test_remove_and_dedup_drop_blobs(tmp_path, cfg):
    db = Database.create(str(tmp_path / "r.zebra"), cfg)
    docs = [f"doc {i}".encode() for i in range(20)] + [b"doc 0"]  # exact dup
    ids = db.insert_documents(docs)
    db.deduplicate()
    assert len(db) == 20
    db.remove(ids[:5])
    assert len(db) == 15
    res = db.query_documents([docs[1]], 3)
    assert docs[1] not in res.get(0, {}).values()  # removed doc 1 gone


def test_vectors_only_database(tmp_path, rng):
    cfg = DatabaseConfig(dim=16, metric="l2")  # no model
    db = Database.create(str(tmp_path / "raw.zebra"), cfg)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    ids = db.insert_vectors(vecs)
    rows = db.query(vecs[:2], number_of_results=1)
    assert rows[0][0][0] == ids[0]
    with pytest.raises(ValueError):
        db.insert_documents([b"no model configured"])


def test_manifest_contents(tmp_path, cfg):
    path = str(tmp_path / "m.zebra")
    Database.create(path, cfg)
    with open(path) as f:
        manifest = json.load(f)
    assert manifest["format"] == 1
    assert manifest["config"]["dim"] == 32
    assert manifest["config"]["index"]["num_tables"] == 8
    assert manifest["blob_backend"] in ("packed", "files")


def test_clear_database_removes_everything(tmp_path, cfg):
    path = str(tmp_path / "c.zebra")
    db = Database.create(path, cfg)
    db.insert_documents([b"a", b"b"])
    db.clear_database()
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".d")
    assert len(db) == 0


def test_insert_after_clear_survives_reopen(tmp_path, cfg):
    """Round-1 advisor (high): with the packed backend, clear_database left
    the blob-log fd pointing at a deleted inode — documents inserted after a
    clear were silently lost on reopen."""
    path = str(tmp_path / "cc.zebra")
    db = Database.create(path, cfg)
    db.insert_documents([b"before-a", b"before-b"])
    db.clear_database()
    ids = db.insert_documents([b"after-a", b"after-b"])
    db.save()
    db2 = Database.open(path)
    assert len(db2) == 2
    res = db2.query_documents([b"after-a"], 1)
    assert b"after-a" in res[0].values()
    rows = db2.query(db2.model.embed_documents([b"after-b"]), 1, with_documents=True)
    assert rows[0][0][2] == b"after-b"
    assert set(ids) == {rows[0][0][0]} | set(res[0].keys())


def test_explicit_durability_defers_snapshot(tmp_path, rng):
    cfg = DatabaseConfig(dim=16, model="hash-16", durability="explicit")
    path = str(tmp_path / "e.zebra")
    db = Database.create(path, cfg)
    # create() snapshots once; subsequent inserts should NOT rewrite arrays
    import os

    arrays = os.path.join(path + ".d", "index", "arrays.npz")
    mtime0 = os.path.getmtime(arrays) if os.path.exists(arrays) else None
    db.insert_documents([f"d{i}".encode() for i in range(20)])
    mtime1 = os.path.getmtime(arrays) if os.path.exists(arrays) else None
    assert mtime0 == mtime1  # no per-insert snapshot
    db.save()  # explicit snapshot
    db2 = Database.open(path)
    assert len(db2) == 20
    res = db2.query_documents([b"d3"], 1)
    assert b"d3" in res[0].values()


def test_open_or_create_corrupt_manifest_falls_back(tmp_path, cfg):
    path = str(tmp_path / "bad.zebra")
    with open(path, "w") as f:
        f.write("garbage{{{")
    db = Database.open_or_create(path, cfg)  # reference core.rs:168-176
    assert len(db) == 0
    with pytest.raises(Exception):
        Database.open_or_create(str(tmp_path / "missing.zebra"))  # no config


def test_close_and_context_manager(tmp_path, rng):
    from zebra_tpu.config import DatabaseConfig
    from zebra_tpu.db import Database

    path = str(tmp_path / "cm.zebra")
    with Database.create(path, DatabaseConfig(dim=8, metric="sql2")) as db:
        v = rng.standard_normal((30, 8)).astype("float32")
        ids = db.insert_records(v, [b"x"] * 30)
    # context exit saved + closed; reopen sees everything
    db2 = Database.open(path)
    assert len(db2) == 30
    out = db2.query_vectors(v[:3], number_of_results=1)
    assert out[0] == {ids[0]: b"x"}
    db2.close()
    # operations after close keep working (stores reopen lazily)
    db2.insert_records(v[:2] + 1.0, [b"y", b"z"])
    assert len(db2) == 32


def test_huge_insert_chunks_write_lock(tmp_path, rng):
    """Warm inserts past _INSERT_LOCK_BLOCK re-acquire the write lock per
    block (round-5 churn sampler: a 1M-row call held it ~27s, blacking out
    readers). Correctness here; a reader thread checks interleaving."""
    import threading

    from zebra_tpu.config import DatabaseConfig, IndexOptions
    from zebra_tpu.db import Database

    db = Database.create(
        str(tmp_path / "blk.zebra"),
        DatabaseConfig(dim=16, metric="sql2", durability="full",
                       index=IndexOptions(index_type="ivf", seed=0)),
    )
    first = db.insert_vectors(rng.standard_normal((400, 16)).astype(np.float32))
    db._INSERT_LOCK_BLOCK = 500  # instance override for the test
    probe = rng.standard_normal((4, 16)).astype(np.float32)
    got = {"reads": 0}
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            assert len(db.query(probe, 3)) == 4
            got["reads"] += 1

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    ids = db.insert_vectors(rng.standard_normal((2100, 16)).astype(np.float32))
    stop.set()
    t.join(30)
    assert len(ids) == 2100 and len(set(ids)) == 2100
    assert all(i in db.index for i in ids[::97])
    assert got["reads"] > 0  # readers made progress around the blocks
    db.wait_for_retrain(timeout=120)
    # crash (no save): WAL must replay every block
    db2 = Database.open(db.path)
    assert len(db2.index) == 400 + 2100
    assert all(i in db2.index for i in ids[::97] + first[::97])
    db2.close()
    db.close()
