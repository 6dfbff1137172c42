"""Background retrains (round-4 verdict #2) + LSH sizing levers (verdict #4).

Contract: growth/overflow/tombstone rebuilds never run inside the mutating
call (the reference never blocks readers O(database) on maintenance,
``core.rs:299-311``). The index defers the rebuild; the facade builds a
SHADOW index off-lock from chunked live captures, replays the mutations that
landed meanwhile from a journal, and swaps under a brief write lock. A crash
at ANY point — including right across the swap, which never touches disk —
recovers everything from WAL + snapshot.
"""

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database
from zebra_tpu.index.lsh import LSHIndex


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _mkdb(tmp_path, name="r.zebra", **cfg_kw):
    cfg = DatabaseConfig(
        dim=16, metric="sql2", durability="full",
        index=IndexOptions(index_type="ivf", seed=0), **cfg_kw,
    )
    db = Database.create(str(tmp_path / name), cfg)
    db._fold_floor = 1 << 30  # isolate retrains from fold machinery
    return db


def test_growth_retrain_runs_in_background(tmp_path, rng):
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    assert db.index._built_n == 200
    for _ in range(5):  # push past the 4x growth trigger
        ids += db.insert_vectors(
            rng.standard_normal((200, 16)).astype(np.float32)
        )
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    assert db.index._rebuild_wanted is None
    assert db.index._built_n == 1200 and len(db.index) == 1200
    assert all(i in db.index for i in ids)
    db.close()


def test_tombstone_retrain_compacts(tmp_path, rng):
    db = _mkdb(tmp_path)
    v = rng.standard_normal((600, 16)).astype(np.float32)
    ids = db.insert_vectors(v)
    db.wait_for_retrain(timeout=120)
    before = db._retrain_count
    db.remove(ids[:500])  # 83% tombstones -> compaction retrain
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count > before
    # compaction preserved exact self-retrieval of the survivors
    res = db.query(v[500:520], 1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[500 + i]
    db.close()


def test_mutations_during_retrain_replayed(tmp_path, rng):
    """Inserts AND removes landing while the shadow builds are journaled and
    replayed onto it before the swap — nothing lost, nothing resurrected."""
    db = _mkdb(tmp_path)
    seeded = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    during: dict = {}
    orig = type(db.index)._shadow_ingest

    def mutate_during(self, data, ids):
        # runs on the retrain thread against the SHADOW with no lock held:
        # a concurrent facade mutation must proceed and be journaled
        if "ins" not in during:
            during["ins"] = db.insert_vectors(
                rng.standard_normal((32, 16)).astype(np.float32)
            )
            db.remove(seeded[:8])
            during["rm"] = seeded[:8]
        return orig(self, data, ids)

    type(db.index)._shadow_ingest = mutate_during
    try:
        for _ in range(5):
            db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_retrain(timeout=120)
    finally:
        type(db.index)._shadow_ingest = orig
    assert during, "retrain never ran"
    assert db._retrain_count >= 1
    assert all(i in db.index for i in during["ins"])
    assert all(i not in db.index for i in during["rm"])
    db.close()


def test_clear_during_retrain_aborts_swap(tmp_path, rng):
    db = _mkdb(tmp_path)
    db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    fired: dict = {}
    orig = type(db.index)._shadow_ingest

    def clear_during(self, data, ids):
        if "cleared" not in fired:
            fired["cleared"] = True
            db.clear_database()
        return orig(self, data, ids)

    type(db.index)._shadow_ingest = clear_during
    try:
        for _ in range(5):
            db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
        db.wait_for_retrain(timeout=120)
    finally:
        type(db.index)._shadow_ingest = orig
    assert fired.get("cleared"), "retrain never raced the clear"
    # the stale shadow (built from pre-clear captures) must NOT be adopted
    assert db._retrain_count == 0
    assert len(db.index) == 0
    db.close()


def test_retrain_worker_crash_leaves_serving_state(tmp_path, rng):
    """A retrain that dies mid-build must not take the database down or
    corrupt it; the next trigger retries and succeeds."""
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    orig = type(db.index)._shadow_ingest
    boom: dict = {"n": 0}

    def explode(self, data, ids_):
        boom["n"] += 1
        raise RuntimeError("injected retrain crash")

    type(db.index)._shadow_ingest = explode
    try:
        for _ in range(5):
            ids += db.insert_vectors(
                rng.standard_normal((200, 16)).astype(np.float32)
            )
        db.wait_for_retrain(timeout=120)
    finally:
        type(db.index)._shadow_ingest = orig
    assert boom["n"] >= 1, "retrain never ran"
    assert db._retrain_count == 0
    assert db._retrain_journal is None  # worker cleaned up
    assert len(db.index) == 1200 and all(i in db.index for i in ids)
    # next mutation re-kicks; with the crash removed it completes
    db.insert_vectors(rng.standard_normal((8, 16)).astype(np.float32))
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    db.close()


def test_crash_across_retrain_swap_recovers(tmp_path, rng):
    """The swap never touches disk: a hard crash immediately after (no
    close/save) recovers every row from snapshot + WAL on reopen."""
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    for _ in range(5):
        ids += db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    db.remove(ids[:10])  # one post-swap mutation, WAL-logged
    # CRASH here: reopen from disk, in-memory swapped state discarded
    db2 = Database.open(db.path)
    assert len(db2.index) == 1190
    assert all(i in db2.index for i in ids[10:50])
    assert all(i not in db2.index for i in ids[:10])
    db2.close()
    db.close()


def test_hbm_budget_skip_defers_until_growth(tmp_path, rng, monkeypatch):
    """When the shadow transient cannot fit HBM the retrain SKIPS (serving
    state untouched, queries correct) and does not spin-retry until the
    index grows another 25%."""
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    import zebra_tpu.index.ivf_host as host_mod

    monkeypatch.setattr(host_mod, "_STAGE_HBM_BUDGET", 1)
    for _ in range(5):
        ids += db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    db.wait_for_retrain(timeout=120)
    # skip_n records whatever live count the worker OBSERVED when it
    # skipped — 1000 or 1200 depending on thread/insert interleaving
    assert db._retrain_count == 0 and db._retrain_skip_n in (1000, 1200)
    assert all(i in db.index for i in ids)  # still serving, still correct
    # budget restored + >=25% growth -> the retrain runs
    monkeypatch.setattr(host_mod, "_STAGE_HBM_BUDGET", 12 << 30)
    for _ in range(2):
        db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    db.close()


# -- paced k-means (the retrain shadow's training mode) ----------------------


def test_kmeans_paced_matches_monolithic_quality(rng):
    import jax
    import jax.numpy as jnp

    from zebra_tpu.ops.kmeans import kmeans, kmeans_paced

    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    data = np.concatenate(
        [c + 0.1 * rng.standard_normal((64, 16)) for c in centers]
    ).astype(np.float32)
    key = jax.random.PRNGKey(3)
    dj = jnp.asarray(data)

    def qerr(cents):
        c = np.asarray(cents)
        d = ((data[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return d.min(1).mean()

    c1, n1 = kmeans(key, dj, jnp.int32(len(data)), k=8, iters=6)
    c2, n2 = kmeans_paced(key, dj, jnp.int32(len(data)), k=8, iters=6,
                          pacer=lambda x: x.block_until_ready())
    assert int(np.asarray(n1).sum()) == len(data)
    assert int(np.asarray(n2).sum()) == len(data)
    # same procedure, separate dispatch granularity: equal clustering quality
    assert qerr(c2) <= 1.5 * qerr(c1) + 1e-3


# -- LSH sizing levers (round-4 verdict #4) ----------------------------------


def test_resolved_bits_budget_replaces_hard_cap():
    """The 16-bit hard cap (which silently dropped 75% of placements at 1M,
    round-4 verdict #4) is replaced by an HBM table budget."""
    o = IndexOptions(index_type="lsh")
    assert o.resolved_bits(1_000_000) == 18      # was capped at 16
    assert o.resolved_bits(10_000_000) == 20
    # the budget is real: huge buckets shrink the affordable width
    wide = o.resolved_bits(10_000_000, capacity=20_000)
    assert wide < o.resolved_bits(10_000_000)
    # and the table allocation stays inside the budget
    for n in (1_000_000, 10_000_000, 100_000_000):
        b = o.resolved_bits(n)
        table = o.num_tables * (2 ** b) * (o.resolved_bucket_capacity() + 1) * 4
        assert table <= IndexOptions.TABLE_HBM_BUDGET


def test_lsh_overflow_grows_bucket_capacity(rng):
    """When wider codes are exhausted (fixed bits), overflow-driven rebuilds
    double the physical bucket capacity instead of silently dropping
    placements — the reference's leaves split rather than drop
    (``lsh.rs:250-267``)."""
    opts = IndexOptions(
        index_type="lsh", num_tables=2, num_probes=4, bits=4,
        bucket_capacity=4, seed=0,
    )
    idx = LSHIndex(dim=16, options=opts)
    # tightly clustered data -> a handful of buckets take everything
    base = rng.standard_normal((4, 16)).astype(np.float32)
    data = np.repeat(base, 120, axis=0) + 0.01 * rng.standard_normal(
        (480, 16)
    ).astype(np.float32)
    ids = idx.add(data)
    assert idx._cap_boost > 1, "overflow never grew capacity"
    assert idx.state.vectors is not None
    assert len(idx) == 480
    # grown capacity is persisted so a reload doesn't shrink the tables back
    assert idx._meta_extra()["cap_boost"] == idx._cap_boost


def test_lsh_cap_boost_save_load_roundtrip(tmp_path, rng):
    opts = IndexOptions(
        index_type="lsh", num_tables=2, num_probes=4, bits=4,
        bucket_capacity=4, seed=0,
    )
    idx = LSHIndex(dim=16, options=opts)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    data = np.repeat(base, 120, axis=0) + 0.01 * rng.standard_normal(
        (480, 16)
    ).astype(np.float32)
    idx.add(data)
    assert idx._cap_boost > 1
    idx.save(str(tmp_path / "ix"))
    from zebra_tpu.index import load_index

    idx2 = load_index(str(tmp_path / "ix"))
    assert idx2._cap_boost == idx._cap_boost
    assert len(idx2) == 480


def test_crash_after_swap_recovers_from_wal(tmp_path, rng):
    """Process crash right after a retrain's swap (nothing saved since):
    the swap changed only DEVICE structures — the WAL still holds every
    mutation, so reopen must reconstruct the full database exactly."""
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    for _ in range(5):  # growth retrain fires in the background
        ids += db.insert_vectors(
            rng.standard_normal((200, 16)).astype(np.float32)
        )
    db.remove(ids[:50])
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    # CRASH: no close(), no save() — reopen from manifest + WAL only
    db2 = Database.open(db.path)
    assert len(db2.index) == len(ids) - 50
    assert all(i not in db2.index for i in ids[:50])
    assert all(i in db2.index for i in ids[50:])
    db2.close()


def test_critical_pressure_drains_on_mutating_thread(tmp_path, rng, monkeypatch):
    """A "-critical" rebuild reason is BACKPRESSURE: the mutating call
    blocks (with no locks held) until the rebalance lands — the round-5
    10M churn grew the spare to 33M rows because mutations raced ahead of
    a starved background retrain."""
    db = _mkdb(tmp_path)
    ids = db.insert_vectors(rng.standard_normal((800, 16)).astype(np.float32))
    monkeypatch.setattr(db.index, "_rebuild_reason", lambda: "spare-critical")
    ids += db.insert_vectors(rng.standard_normal((100, 16)).astype(np.float32))
    # the insert call itself drained the critical retrain before returning
    assert db._retrain_drains >= 1
    assert db._retrain_count >= 1
    assert db.index._rebuild_wanted is None
    assert not db._retrain_critical
    assert all(i in db.index for i in ids[::37])
    db.close()


def test_spare_critical_reason_fires(rng):
    """IVFIndex reports the critical tier when the spare is nearly full or
    has ballooned past its resolved sizing."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import IVFIndex

    idx = IVFIndex(dim=16, metric="sql2",
                   options=IndexOptions(index_type="ivf", seed=0))
    idx.add(rng.standard_normal((600, 16)).astype(np.float32))
    assert idx._rebuild_reason() is None
    idx._spare_used = int(0.95 * idx.state.spare_capacity)
    assert idx._rebuild_reason() == "spare-critical"


def test_warm_serving_shapes_compiles_served_query(rng):
    """warm_serving_shapes runs the REAL query path for each recorded
    (padded_qbatch, k) shape (populating the in-process jit cache the
    adopted state will hit) and is harmless to results."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import IVFIndex

    idx = IVFIndex(dim=16, metric="sql2",
                   options=IndexOptions(index_type="ivf", seed=0))
    v = rng.standard_normal((400, 16)).astype(np.float32)
    idx.add(v)
    before = idx.search(v[:20], 3)
    assert (32, 3) in idx._served_qshapes  # padded to next pow2 >= 8
    assert idx.warm_serving_shapes(tuple(idx._served_qshapes)) == 1
    assert idx.search(v[:20], 3) == before


def test_retrain_warms_shadow_at_served_shapes(tmp_path, rng, monkeypatch):
    """The shadow retrain pre-compiles the serving query program at the
    shapes the LIVE index served, BEFORE the swap — the first post-adopt
    reader must not pay the (remote) compile (round-5 churn: 53s)."""
    from zebra_tpu.index.ivf_host import IVFIndex

    calls = []
    orig = IVFIndex.warm_serving_shapes

    def spy(self, shapes):
        calls.append(tuple(shapes))
        return orig(self, shapes)

    monkeypatch.setattr(IVFIndex, "warm_serving_shapes", spy)
    db = _mkdb(tmp_path)
    v = rng.standard_normal((200, 16)).astype(np.float32)
    db.insert_vectors(v)
    db.query(v[:10], 2)  # records the serving shape (padded 16, k 2)
    for _ in range(5):  # push past the growth trigger -> background retrain
        db.insert_vectors(rng.standard_normal((200, 16)).astype(np.float32))
    db.wait_for_retrain(timeout=120)
    assert db._retrain_count >= 1
    assert any((16, 2) in c for c in calls)
    db.close()


def test_mutation_shape_change_kicks_aot_warm(tmp_path, rng, monkeypatch):
    """A mutation that changes the state's shape signature fires the
    background AOT warm at the served shapes; an unchanged signature does
    not re-fire it."""
    from zebra_tpu.index.ivf_host import IVFIndex

    calls = []
    monkeypatch.setattr(
        IVFIndex, "warm_query_aot",
        lambda self, shapes: calls.append(tuple(shapes)) or len(shapes),
    )
    db = _mkdb(tmp_path)
    v = rng.standard_normal((300, 16)).astype(np.float32)
    db.insert_vectors(v)
    db.query(v[:10], 2)
    # first post-query mutation: sig (never warmed) != _warmed_qsig -> fires
    db.insert_vectors(rng.standard_normal((8, 16)).astype(np.float32))
    db.wait_for_warm(timeout=60)
    assert calls and (16, 2) in calls[0]
    n = len(calls)
    # same shapes again: signature unchanged -> no new warm
    db.insert_vectors(rng.standard_normal((8, 16)).astype(np.float32))
    db.wait_for_warm(timeout=60)
    assert len(calls) == n
    db.close()


def test_warm_query_aot_gated_off_without_persistent_cache(rng):
    """Without a persistent compilation cache the AOT executables would be
    unreachable from the later jit call — the warm must no-op (and MUST
    not enable one itself: CPU cache writes segfault this jaxlib)."""
    import jax

    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import IVFIndex

    assert not getattr(jax.config, "jax_compilation_cache_dir", None)
    idx = IVFIndex(dim=16, metric="sql2",
                   options=IndexOptions(index_type="ivf", seed=0))
    idx.add(rng.standard_normal((100, 16)).astype(np.float32))
    idx.search(rng.standard_normal((4, 16)).astype(np.float32), 2)
    assert idx.warm_query_aot(tuple(idx._served_qshapes)) == 0


def test_warm_query_aot_lowers_serving_program(rng, monkeypatch):
    """With the cache gate forced open, the AOT body lowers + compiles the
    exact serving statics without error (CPU-safe: no persistent cache is
    actually enabled, so nothing is written to it)."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import IVFIndex

    monkeypatch.setattr(IVFIndex, "_aot_cache_ready", staticmethod(lambda: True))
    idx = IVFIndex(dim=16, metric="sql2",
                   options=IndexOptions(index_type="ivf", seed=0))
    v = rng.standard_normal((300, 16)).astype(np.float32)
    idx.add(v)
    before = idx.search(v[:4], 2)
    assert idx.warm_query_aot(((8, 2), (16, 5))) == 2
    assert idx.search(v[:4], 2) == before


def test_lsh_retrain_peak_bytes_accounted(rng):
    """The LSH background-retrain HBM admission sees the shadow's real
    allocation (fresh slab + bucket tables + capture chunk) — the
    base-class 0 meant 'no concern' and a capacity-scale retrain OOMed."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.lsh import LSHIndex

    idx = LSHIndex(dim=768, metric="cosine",
                   options=IndexOptions(index_type="lsh", dtype="float32"))
    peak = idx._retrain_bg_peak_bytes(1_000_000, 131072)
    # fresh 2M-row f32 slab alone is ~6.4GB; tables add the rest
    assert peak > 6 << 30
    assert peak < 32 << 30


def test_lsh_adaptive_depth_presizes_hot_buckets(rng):
    """Tightly clustered data collapses whole clusters onto single hash
    codes; the cold build must detect it from a hashed sample and deepen
    buckets BEFORE allocation (no overflow, no rebuild ladder)."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.lsh import LSHIndex

    centers = 10.0 * rng.standard_normal((64, 16))
    data = (
        centers[rng.integers(0, 64, 65536)]
        + 0.01 * rng.standard_normal((65536, 16))
    ).astype(np.float32)
    idx = LSHIndex(dim=16, metric="sql2",
                   options=IndexOptions(index_type="lsh", dtype="float32"))
    idx.add(data)
    assert idx._cap_boost > 1  # sample predicted the hot load
    assert int(idx.state.overflow) < 0.05 * 65536 * 10  # <5% of placements
    r = idx.search(data[:8], 3)
    assert all(row for row in r)
