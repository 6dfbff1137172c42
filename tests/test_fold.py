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


def test_background_fold_truncates_and_recovers(tmp_path, rng, monkeypatch):
    db = _mkdb(tmp_path, rng)
    # pin the replay-vs-readback policy to the floor: this test exercises
    # the fold MECHANISM deterministically (with the real policy the outcome
    # races snapshot size vs capture timing — once arrays.npz outweighs the
    # residual log, NOT folding is the correct policy decision)
    monkeypatch.setattr(
        type(db), "_fold_threshold", lambda self, allow_measure=False: self._fold_floor
    )
    all_ids = []
    for _ in range(6):
        all_ids += db.insert_vectors(
            rng.standard_normal((200, 16)).astype(np.float32)
        )
    db.wait_for_fold(timeout=60)
    # the fold worker loops under write pressure until the log is at or
    # below the (pinned) threshold — everything appended above it folded
    assert db._fold_count >= 1
    assert db._delta.size() <= db._fold_floor
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


def test_fold_capture_survives_donating_insert(tmp_path, rng):
    """Inserts DONATE the old state buffers to their jit — donation deletes
    a buffer even while Python references exist. The CPU backend ignores
    donation, which is why only the round-4 TPU 10M churn caught this:
    every background fold died with "Array has been deleted" mid-stream.
    Simulate donation by deleting the pre-capture device buffers after a
    post-capture insert: a clone=True capture must still stream a complete,
    loadable snapshot."""
    import jax

    db = _mkdb(tmp_path, rng, floor=1 << 30)  # no auto-folds; drive by hand
    ids = db.insert_vectors(rng.standard_normal((300, 16)).astype(np.float32))
    old_leaves = [
        leaf for leaf in jax.tree.leaves(db.index.state)
        if hasattr(leaf, "delete")
    ]
    cap = db.index.snapshot_capture(clone=True)
    assert cap["cloned"] is True
    ids += db.insert_vectors(rng.standard_normal((32, 16)).astype(np.float32))
    for leaf in old_leaves:  # what donation does on TPU
        leaf.delete()
    tmp = db._index_dir() + ".fold"
    db.index.write_capture(tmp, cap)  # must not raise on deleted sources
    # the capture predates the second insert: 300 rows, standalone-loadable
    loaded = type(db.index).load(tmp)
    assert len(loaded) == 300
    # over-budget clones are refused -> the fold worker switches to the
    # fuzzy CHUNKED capture (tests below)
    import zebra_tpu.index.base as base_mod

    orig_budget = base_mod._CLONE_HBM_BUDGET
    try:
        base_mod._CLONE_HBM_BUDGET = 0
        cap2 = db.index.snapshot_capture(clone=True)
        assert cap2["cloned"] is False
    finally:
        base_mod._CLONE_HBM_BUDGET = orig_budget
    db.close()


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


def _pin_budget_zero(monkeypatch):
    """Force every clone=True capture over budget -> chunked fold path."""
    import zebra_tpu.index.base as base_mod

    monkeypatch.setattr(base_mod, "_CLONE_HBM_BUDGET", 0)


def test_chunked_fold_over_budget_never_takes_write_lock(
    tmp_path, rng, monkeypatch
):
    """Past the clone HBM budget the fold must stream a fuzzy chunked
    capture under brief read locks — NOT fall back to a write-locked full
    save (round-4 advisor medium)."""
    _pin_budget_zero(monkeypatch)
    db = _mkdb(tmp_path, rng)
    monkeypatch.setattr(
        type(db), "_fold_threshold", lambda self, allow_measure=False: self._fold_floor
    )
    all_ids = []
    for _ in range(6):
        all_ids += db.insert_vectors(
            rng.standard_normal((200, 16)).astype(np.float32)
        )
    db.wait_for_fold(timeout=60)
    assert db._fold_count >= 1
    assert db._fold_sync_count == 0  # npz never folds under the write lock
    assert db._delta.size() <= db._fold_floor
    # crash (no close/save): snapshot + log tail must recover every row
    db2 = Database.open(db.path)
    assert len(db2.index) == len(all_ids)
    assert all(i in db2.index for i in all_ids[:50])
    db2.close()


def test_chunked_fold_fuzzy_mutations_repaired_by_replay(
    tmp_path, rng, monkeypatch
):
    """Mutations landing BETWEEN chunk fetches make the written snapshot a
    fuzzy mixture; the untruncated WAL suffix must repair it exactly
    (inserts idempotent by id, removes of absent ids no-ops)."""
    _pin_budget_zero(monkeypatch)
    db = _mkdb(tmp_path, rng)
    monkeypatch.setattr(
        type(db), "_fold_threshold", lambda self, allow_measure=False: self._fold_floor
    )
    state = {"during": [], "removed": None}
    orig = type(db)._fold_fetch_chunk

    def mutating_fetch(self, name, shape, gen, sgen, prefix, s, e):
        out = orig(self, name, shape, gen, sgen, prefix, s, e)
        # runs on the fold thread with NO lock held: interleave real
        # mutations between chunk windows (once, to keep the test fast)
        if not state["during"]:
            state["during"] = db.insert_vectors(
                rng.standard_normal((32, 16)).astype(np.float32)
            )
            state["removed"] = state["keep"][0]
            db.remove([state["removed"]])
        return out

    monkeypatch.setattr(type(db), "_fold_fetch_chunk", mutating_fetch)
    state["keep"] = db.insert_vectors(
        rng.standard_normal((300, 16)).astype(np.float32)
    )
    for _ in range(6):
        db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_fold(timeout=60)
    assert state["during"], "chunked fold never ran"
    db2 = Database.open(db.path)
    assert all(i in db2.index for i in state["during"])
    assert state["removed"] not in db2.index
    assert all(i in db2.index for i in state["keep"][1:])
    db2.close()


def test_chunked_fold_aborts_on_struct_change(tmp_path, rng, monkeypatch):
    """A rebuild swap mid-stream invalidates the fuzzy premise (slot
    meanings change wholesale): the fold must abort cleanly — serving state
    untouched, no partial snapshot committed, recovery exact."""
    _pin_budget_zero(monkeypatch)
    db = _mkdb(tmp_path, rng)
    monkeypatch.setattr(
        type(db), "_fold_threshold", lambda self, allow_measure=False: self._fold_floor
    )
    fired = {}
    orig = type(db)._fold_fetch_chunk

    def rebuilding_fetch(self, name, shape, gen, sgen, prefix, s, e):
        out = orig(self, name, shape, gen, sgen, prefix, s, e)
        if "rebuilt" not in fired:
            fired["rebuilt"] = True
            with db._lock.write():
                db.index.rebuild("test")  # bumps _struct_gen
        return out

    monkeypatch.setattr(type(db), "_fold_fetch_chunk", rebuilding_fetch)
    ids = db.insert_vectors(rng.standard_normal((300, 16)).astype(np.float32))
    for _ in range(6):
        ids += db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_fold(timeout=60)
    assert fired.get("rebuilt"), "chunked fold never raced the rebuild"
    assert not os.path.exists(db._index_dir() + ".fold")
    db2 = Database.open(db.path)
    assert len(db2.index) == len(ids)
    db2.close()
