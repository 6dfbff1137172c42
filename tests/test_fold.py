"""Background bandwidth-aware log folds (round-3 verdict #7).

Contract: once the delta log outgrows the fold threshold, a BACKGROUND
thread snapshots a consistent capture (mutations never stall O(database)),
swaps it in atomically, and drops exactly the covered log prefix — while
crashes at any point in the sequence recover the full database.
"""

import os

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database
from zebra_tpu.storage.deltalog import DeltaLog


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _mkdb(tmp_path, rng, floor=1 << 12):
    db = Database.create(
        str(tmp_path / "f.zebra"),
        DatabaseConfig(
            dim=16, metric="sql2", durability="full",
            index=IndexOptions(index_type="ivf", seed=0),
        ),
    )
    db._fold_floor = floor
    return db


def test_truncate_prefix(tmp_path, rng):
    log = DeltaLog(str(tmp_path / "d.log"))
    ids1 = [bytes([i]) * 16 for i in range(4)]
    ids2 = [bytes([100 + i]) * 16 for i in range(3)]
    log.append_insert(ids1, rng.standard_normal((4, 8)).astype(np.float32))
    boundary = log.size()
    v2 = rng.standard_normal((3, 8)).astype(np.float32)
    log.append_insert(ids2, v2)
    log.truncate_prefix(boundary)
    ops = list(log.replay())
    assert len(ops) == 1
    op, ids, vecs = ops[0]
    assert op == "insert" and ids == ids2
    np.testing.assert_allclose(vecs, v2, rtol=1e-6)
    # truncating everything == reset
    log.truncate_prefix(log.size())
    assert log.size() == 0


def test_background_fold_truncates_and_recovers(tmp_path, rng):
    db = _mkdb(tmp_path, rng)
    all_ids = []
    for _ in range(6):
        all_ids += db.insert_vectors(
            rng.standard_normal((200, 16)).astype(np.float32)
        )
    db.wait_for_fold(timeout=60)
    # the log must have been folded at least once: far below the total
    # volume the six full-precision batches appended
    assert db._delta.size() < 3 * db._fold_floor
    # crash (no close/save) — reopen must see every row via snapshot + tail
    db2 = Database.open(db.path)
    assert len(db2.index) == len(all_ids)
    assert all(i in db2.index for i in all_ids[:50])
    db2.close()


def test_mutations_during_fold_survive(tmp_path, rng, monkeypatch):
    """Rows inserted WHILE the fold streams its capture land past the fold
    offset and must survive the prefix truncation."""
    db = _mkdb(tmp_path, rng)
    during: list[bytes] = []
    orig = type(db.index).write_capture

    def slow_write(self, directory, cap):
        # runs on the fold thread with NO lock held: a concurrent insert
        # must proceed and be preserved
        if not during:
            during.extend(
                db.insert_vectors(rng.standard_normal((32, 16)).astype(np.float32))
            )
        return orig(self, directory, cap)

    monkeypatch.setattr(type(db.index), "write_capture", slow_write)
    for _ in range(6):
        db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_fold(timeout=60)
    assert during, "fold never ran"
    db2 = Database.open(db.path)
    assert all(i in db2.index for i in during)
    db2.close()


def test_crash_between_arrays_and_meta_swap(tmp_path, rng):
    """Simulated crash mid-commit (new arrays.npz in place, old index.json,
    log NOT truncated): replay is idempotent, recovery exact."""
    db = _mkdb(tmp_path, rng, floor=1 << 30)  # never auto-fold
    ids = db.insert_vectors(rng.standard_normal((300, 16)).astype(np.float32))
    db.save()  # baseline snapshot: index.json now has_state=True
    ids += db.insert_vectors(rng.standard_normal((300, 16)).astype(np.float32))
    # manual fold, stopped after the arrays replace
    cap = db.index.snapshot_capture()
    tmp = db._index_dir() + ".fold"
    db.index.write_capture(tmp, cap)
    os.replace(os.path.join(tmp, "arrays.npz"),
               os.path.join(db._index_dir(), "arrays.npz"))
    # CRASH here: index.json still the create()-time empty-state meta,
    # arrays.npz has all rows, delta log has all records
    db2 = Database.open(db.path)
    assert len(db2.index) == len(ids)
    assert all(i in db2.index for i in ids[:20])
    db2.close()


def test_explicit_save_supersedes_fold(tmp_path, rng, monkeypatch):
    """A save() racing the fold's slow write invalidates the fold commit
    (the newer snapshot must not be clobbered by the older capture)."""
    db = _mkdb(tmp_path, rng)
    seen = {}
    orig = type(db.index).write_capture

    def racing_write(self, directory, cap):
        if directory.endswith(".fold") and "saved" not in seen:
            seen["saved"] = True
            extra = db.insert_vectors(
                rng.standard_normal((16, 16)).astype(np.float32)
            )
            seen["extra"] = extra
            db.save()  # bumps _save_gen -> the fold must abort its commit
        return orig(self, directory, cap)

    monkeypatch.setattr(type(db.index), "write_capture", racing_write)
    for _ in range(6):
        db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_fold(timeout=60)
    assert seen.get("saved"), "fold never raced the save"
    assert not os.path.exists(db._index_dir() + ".fold")
    db2 = Database.open(db.path)
    assert all(i in db2.index for i in seen["extra"])
    db2.close()
