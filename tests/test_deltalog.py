"""Delta-log durability: crash replay, torn tails, idempotency, checkpoints."""

import os

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database
from zebra_tpu.storage.deltalog import DeltaLog


def _cfg(**kw):
    kw.setdefault("dim", 16)
    kw.setdefault("metric", "sql2")
    return DatabaseConfig(index=IndexOptions(seed=0), **kw)


def _vecs(rng, n, dim=16):
    return rng.standard_normal((n, dim)).astype(np.float32)


# -- unit: the log itself -----------------------------------------------------


def test_log_roundtrip(tmp_path, rng):
    log = DeltaLog(str(tmp_path / "d.log"))
    ids = [bytes([i + 1]) + bytes(15) for i in range(5)]
    v = _vecs(rng, 5)
    log.append_insert(ids, v)
    log.append_remove(ids[:2])
    ops = list(log.replay())
    assert ops[0][0] == "insert" and ops[0][1] == ids
    np.testing.assert_array_equal(ops[0][2], v)
    assert ops[1][0] == "remove" and ops[1][1] == ids[:2]
    log.reset()
    assert list(log.replay()) == [] and log.size() == 0


def test_log_torn_tail_truncated(tmp_path, rng):
    log = DeltaLog(str(tmp_path / "d.log"))
    ids = [bytes([1]) + bytes(15)]
    log.append_insert(ids, _vecs(rng, 1))
    log.append_insert([bytes([2]) + bytes(15)], _vecs(rng, 1))
    log.close()
    size = os.path.getsize(log.path)
    with open(log.path, "r+b") as f:  # torn write: cut the last record short
        f.truncate(size - 7)
    ops = list(log.replay())
    assert len(ops) == 1 and ops[0][1] == ids
    assert os.path.getsize(log.path) < size - 7  # tail removed
    # appends after recovery still replay cleanly
    log.append_remove(ids)
    assert [op for op, *_ in log.replay()] == ["insert", "remove"]


def test_log_corrupt_crc_stops_replay(tmp_path, rng):
    log = DeltaLog(str(tmp_path / "d.log"))
    log.append_insert([bytes([1]) + bytes(15)], _vecs(rng, 1))
    log.append_insert([bytes([2]) + bytes(15)], _vecs(rng, 1))
    log.close()
    with open(log.path, "r+b") as f:  # flip a payload byte of record 2
        f.seek(os.path.getsize(log.path) - 3)
        f.write(b"\xff")
    assert len(list(log.replay())) == 1


# -- integration: Database durability="full" ----------------------------------


def test_crash_reopen_replays_inserts(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="full"))
    v = _vecs(rng, 50)
    docs = [f"doc{i}".encode() for i in range(50)]
    ids = db.insert_records(v, docs)
    # NO save() — simulate a crash by just reopening from disk
    db2 = Database.open(path)
    assert len(db2) == 50
    out = db2.query_vectors(v[:5], number_of_results=1)
    for qi in range(5):
        assert out[qi] == {ids[qi]: docs[qi]}


def test_crash_reopen_replays_removes(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="full"))
    v = _vecs(rng, 30)
    ids = db.insert_records(v, [b"x"] * 30)
    db.save()  # snapshot covers the inserts
    db.remove(ids[:10])  # logged only
    db2 = Database.open(path)
    assert len(db2) == 20
    res = db2.query(v[:10], number_of_results=1)
    gone = set(ids[:10])
    for row in res:
        assert row and row[0][0] not in gone


def test_save_resets_log_and_replay_is_idempotent(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="full"))
    v = _vecs(rng, 20)
    ids = db.insert_records(v, [b"d"] * 20)
    db.save()
    assert db._delta.size() == 0
    # simulate a crash BETWEEN snapshot write and log reset: re-append a
    # record whose ids are already covered by the snapshot
    db._delta.append_insert(ids[:5], v[:5])
    db._delta.close()
    db2 = Database.open(path)  # replay must skip the duplicates
    assert len(db2) == 20


def test_explicit_durability_writes_no_log(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="explicit"))
    db.insert_records(_vecs(rng, 10), [b"d"] * 10)
    assert db._delta.size() == 0
    # without save(), the index is NOT durable in explicit mode
    db2 = Database.open(path)
    assert len(db2) == 0


def test_clear_database_drops_log(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="full"))
    db.insert_records(_vecs(rng, 10), [b"d"] * 10)
    assert db._delta.size() > 0
    db.clear_database()
    assert db._delta.size() == 0
    db.save()
    assert len(Database.open(path)) == 0


def test_mixed_ops_replay_order(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    db = Database.create(path, _cfg(durability="full"))
    v = _vecs(rng, 40)
    ids = db.insert_records(v[:20], [b"a"] * 20)
    db.remove(ids[:5])
    ids2 = db.insert_records(v[20:], [b"b"] * 20)
    db.remove([ids2[0], ids[6]])
    db2 = Database.open(path)
    assert len(db2) == 33
    assert ids[7] in db2.index and ids2[1] in db2.index
    assert ids[0] not in db2.index and ids2[0] not in db2.index


def test_bf16_log_records_halve_and_replay(tmp_path, rng):
    import ml_dtypes

    log = DeltaLog(str(tmp_path / "b.log"))
    ids = [bytes([i + 1]) + bytes(15) for i in range(8)]
    v = _vecs(rng, 8)
    log.append_insert(ids, v, bf16=True)
    size_bf16 = log.size()
    log.reset()
    log.append_insert(ids, v, bf16=False)
    assert size_bf16 < log.size()  # ~half the vector bytes
    log.reset()
    log.append_insert(ids, v, bf16=True)
    (op, got_ids, got_v), = list(log.replay())
    assert op == "insert" and got_ids == ids
    np.testing.assert_array_equal(
        got_v, v.astype(ml_dtypes.bfloat16).astype(np.float32)
    )


def test_bf16_database_crash_replay(tmp_path, rng):
    path = str(tmp_path / "db.zebra")
    cfg = DatabaseConfig(
        dim=16, metric="sql2",
        index=IndexOptions(seed=0, index_type="ivf", dtype="bfloat16"),
        durability="full",
    )
    db = Database.create(path, cfg)
    v = _vecs(rng, 40)
    ids = db.insert_records(v, [b"d"] * 40)
    db2 = Database.open(path)  # crash-reopen: bf16 log replays
    assert len(db2) == 40
    res = db2.query(v[:5], number_of_results=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]


def test_log_dtype_follows_index_wire(tmp_path, rng):
    """int8 slabs log bf16 records (their insert wire IS bf16 — lossless,
    half the fsync'd bytes); refined int8 logs the host-quantised q8 pair
    (bitwise the slab content at ~half the f32 bytes)."""
    from zebra_tpu.storage.deltalog import (
        INSERT, INSERT_BF16, INSERT_Q8, _HDR, _MAGIC,
    )
    import struct

    def first_rtype(path):
        with open(path, "rb") as f:
            magic, rtype, _, _ = _HDR.unpack(f.read(_HDR.size))
        assert magic == _MAGIC
        return rtype

    v = _vecs(rng, 12)
    for dtype, refine, want in (
        ("int8", 0, INSERT_BF16),
        ("int8", 4, INSERT_Q8),
        ("float32", 0, INSERT),
        ("bfloat16", 0, INSERT_BF16),
    ):
        path = str(tmp_path / f"{dtype}{refine}.zebra")
        cfg = DatabaseConfig(
            dim=16, metric="sql2",
            index=IndexOptions(seed=0, index_type="ivf", dtype=dtype,
                               refine=refine),
            durability="full",
        )
        db = Database.create(path, cfg)
        ids = db.insert_vectors(v)
        assert first_rtype(db._delta.path) == want, (dtype, refine)
        db2 = Database.open(path)  # crash-reopen replays losslessly
        assert len(db2) == 12
        res = db2.query(v[:4], number_of_results=1)
        for i, row in enumerate(res):
            assert row[0][0] == ids[i]
        db2._delta.close()
        db._delta.close()
