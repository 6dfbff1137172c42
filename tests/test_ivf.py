"""IVF backend: device ops, host facade, CRUD, persistence, db integration."""

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.index import make_index, load_index
from zebra_tpu.index.ivf_host import IVFIndex


def _data(rng, n, dim, clusters=16, sigma=0.1):
    centers = rng.standard_normal((clusters, dim)).astype(np.float32)
    a = rng.integers(0, clusters, n)
    return centers[a] + sigma * rng.standard_normal((n, dim)).astype(np.float32)


def _opts(**kw):
    kw.setdefault("index_type", "ivf")
    kw.setdefault("seed", 0)
    return IndexOptions(**kw)


def test_ivf_recall_vs_brute(rng):
    data = _data(rng, 3000, 48)
    idx = IVFIndex(dim=48, metric="cosine", options=_opts(num_probes=16))
    ids = idx.add(data)
    assert len(ids) == 3000 and len(idx) == 3000
    q = data[:100] + 0.02 * rng.standard_normal((100, 48)).astype(np.float32)
    approx = idx.search(q, k=10)
    exact = idx.search(q, k=10, exact=True)
    hits = sum(
        len({i for i, _ in approx[b]} & {i for i, _ in exact[b]}) for b in range(100)
    )
    assert hits / 1000 >= 0.95


def test_ivf_self_lookup_and_distances(rng):
    data = _data(rng, 500, 32)
    idx = IVFIndex(dim=32, metric="sql2", options=_opts())
    ids = idx.add(data)
    res = idx.search(data[:50], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]
        assert row[0][1] < 1e-3


def test_ivf_remove_and_tombstones(rng):
    data = _data(rng, 400, 24)
    idx = IVFIndex(dim=24, options=_opts())
    ids = idx.add(data)
    removed = idx.remove(ids[:100])
    assert sorted(removed) == sorted(ids[:100])
    assert len(idx) == 300
    res = idx.search(data[:100], k=1)
    gone = {bytes(i) for i in ids[:100]}
    for row in res:
        assert row and row[0][0] not in gone
    # removing unknown ids is a no-op
    assert idx.remove([b"\x01" * 16]) == []


def test_ivf_spill_overflow_lands_in_spare(rng):
    # tiny capacity + all vectors in one blob forces spill into the spare
    data = np.ones((200, 16), np.float32) + 0.001 * rng.standard_normal(
        (200, 16)
    ).astype(np.float32)
    idx = IVFIndex(
        dim=16,
        options=_opts(num_clusters=4, cluster_capacity=16, spill=2,
                      spare_capacity=4096),
    )
    ids = idx.add(data)
    assert len(idx) == 200  # nothing dropped
    st = idx.stats()
    assert st["used_slots"] == 200
    assert st["spare_used"] > 0  # overflow went to the spare region
    # spare members are searchable (vectors are near-identical, so exact
    # self-match is not guaranteed under f32 near-ties — distance ~0 is)
    res = idx.search(data[:200], k=1)
    assert all(row and row[0][1] < 1e-4 for row in res)


def test_ivf_spare_growth_never_drops(rng):
    # spare too small for the overflow: it must grow, ids never dropped,
    # and slot numbering must stay stable (search still exact)
    data = np.ones((300, 16), np.float32) + 0.001 * rng.standard_normal(
        (300, 16)
    ).astype(np.float32)
    idx = IVFIndex(
        dim=16,
        # exact f32 slab: the assert below wants exact self-match among
        # near-identical rows, which the default quantised tier can't
        # promise under near-ties (this test is about spare growth)
        options=_opts(num_clusters=4, cluster_capacity=8, spill=1,
                      spare_capacity=64, dtype="float32"),
    )
    ids = idx.add(data)
    assert len(idx) == 300
    assert idx.stats()["spare_capacity"] > 64
    res = idx.search(data[:50], k=1)
    assert all(row[0][0] == ids[i] for i, row in enumerate(res))


def test_ivf_rebuild_on_growth(rng):
    # every add() draws FRESH blob centers, so the final index holds ~96
    # scattered blobs — probe wide enough for that (IVF recall is a
    # probes/clusters ratio; the auto sizing targets the clustered regime)
    idx = IVFIndex(dim=24, options=_opts(num_probes=32))
    centers = rng.standard_normal((96, 24)).astype(np.float32)

    def wave(seed, n):
        r = np.random.default_rng(seed)
        a = r.integers(0, 96, n)
        return centers[a] + 0.05 * r.standard_normal((n, 24)).astype(np.float32)

    idx.add(wave(0, 200))
    k0 = idx.stats()["clusters"]
    for s in range(5):
        idx.add(wave(s + 1, 400))
    assert len(idx) == 2200
    assert idx.stats()["clusters"] > k0  # retrained with more partitions
    q = wave(9, 32)
    approx = idx.search(q, 10)
    exact = idx.search(q, 10, exact=True)
    hits = sum(
        len({i for i, _ in approx[b]} & {i for i, _ in exact[b]}) for b in range(32)
    )
    assert hits / 320 >= 0.9


def test_ivf_tombstone_compaction(rng):
    idx = IVFIndex(dim=16, options=_opts())
    data = _data(rng, 600, 16)
    ids = idx.add(data)
    idx.remove(ids[:400])
    st = idx.stats()
    assert st["tombstones"] <= 200  # compaction triggered
    res = idx.search(data[400:420], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[400 + i]


def test_ivf_rebuild_skipped_when_transient_exceeds_hbm(rng, monkeypatch):
    """Capacity-scale guard: when the rebuild's HBM transient cannot fit,
    auto-maintenance SKIPS (queries stay correct) instead of crashing with
    RESOURCE_EXHAUSTED mid-churn; shrinking pressure resumes it."""
    from zebra_tpu.index import ivf_host as host_mod

    idx = IVFIndex(dim=16, options=_opts())
    data = _data(rng, 600, 16)
    ids = idx.add(data)
    calls = []
    monkeypatch.setattr(idx, "rebuild", lambda reason=None: calls.append(1))
    monkeypatch.setattr(host_mod, "_STAGE_HBM_BUDGET", 0)
    idx.remove(ids[:400])  # tombstone pressure fires _maybe_rebuild
    assert not calls and idx._rebuild_skip_warned
    # tombstoned rows stay masked — search still correct without the rebuild
    res = idx.search(data[400:420], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[400 + i]
    # budget restored -> the next maintenance pass rebuilds again
    monkeypatch.setattr(host_mod, "_STAGE_HBM_BUDGET", 12 << 30)
    idx.remove(ids[400:500])
    assert calls


def test_ivf_save_load_roundtrip(tmp_path, rng):
    data = _data(rng, 300, 32)
    idx = IVFIndex(dim=32, metric="cosine", options=_opts())
    ids = idx.add(data)
    idx.remove(ids[:10])
    idx.save(str(tmp_path / "ix"))
    idx2 = load_index(str(tmp_path / "ix"))
    assert isinstance(idx2, IVFIndex)
    assert len(idx2) == 290
    r1 = idx.search(data[10:40], k=5)
    r2 = idx2.search(data[10:40], k=5)
    assert r1 == r2
    # adds after reopen keep working
    more = idx2.add(_data(np.random.default_rng(7), 50, 32))
    assert len(idx2) == 340 and len(more) == 50


def test_ivf_deduplicate(rng):
    data = _data(rng, 200, 16)
    dup = np.concatenate([data, data[:50]])
    idx = IVFIndex(dim=16, options=_opts())
    idx.add(dup)
    removed = idx.deduplicate()
    assert len(removed) == 50
    assert len(idx) == 200


def test_factory_dispatch():
    ix = make_index(8, options=_opts())
    assert isinstance(ix, IVFIndex)
    # IVF is the library default; LSH is the opt-in reference-parity mode
    assert isinstance(make_index(8, options=IndexOptions()), IVFIndex)
    from zebra_tpu.index import LSHIndex

    assert isinstance(make_index(8, options=IndexOptions(index_type="lsh")), LSHIndex)


def test_ivf_database_integration(tmp_path, rng):
    cfg = DatabaseConfig(dim=24, metric="sql2", index=_opts(), durability="explicit")
    from zebra_tpu.db import Database

    db = Database.create(str(tmp_path / "v.zebra"), cfg)
    vecs = _data(rng, 200, 24)
    docs = [f"doc {i}".encode() for i in range(200)]
    ids = db.insert_records(vecs, docs)
    out = db.query_vectors(vecs[:5], number_of_results=1)
    for qi in range(5):
        assert out[qi] == {ids[qi]: docs[qi]}
    db.save()
    db2 = Database.open(str(tmp_path / "v.zebra"))
    assert isinstance(db2.index, IVFIndex)
    out2 = db2.query_vectors(vecs[:5], number_of_results=1)
    assert out2 == out


def test_ivf_bf16_slab(rng):
    data = _data(rng, 300, 32)
    idx = IVFIndex(dim=32, options=_opts(dtype="bfloat16"))
    ids = idx.add(data)
    res = idx.search(data[:20], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]


@pytest.mark.parametrize("metric", ["manhattan", "chebyshev"])
def test_ivf_non_mxu_metric(rng, metric):
    data = _data(rng, 400, 16)
    idx = IVFIndex(dim=16, metric=metric, options=_opts(num_probes=8))
    ids = idx.add(data)
    res = idx.search(data[:20], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids[i]


def test_ivf_bf16_snapshot_roundtrip(tmp_path, rng):
    """bf16 slabs snapshot as uint16 bit patterns (half the bytes) and must
    reload exactly (same stored bits -> same distances)."""
    data = _data(rng, 250, 32)
    idx = IVFIndex(dim=32, options=_opts(dtype="bfloat16"))
    idx.add(data)
    idx.save(str(tmp_path / "b"))
    import numpy as np

    with np.load(str(tmp_path / "b" / "arrays.npz")) as z:
        assert z["vectors"].dtype == np.uint16
    idx2 = load_index(str(tmp_path / "b"))
    assert idx2.search(data[:20], k=3) == idx.search(data[:20], k=3)


def test_ivf_k_exceeds_cluster_capacity(rng):
    """k wider than the per-cluster block must select across blocks, not
    crash in lax.top_k (round-2 advisor finding)."""
    data = _data(rng, 400, 24)
    idx = IVFIndex(
        dim=24, metric="sql2",
        options=_opts(num_clusters=8, cluster_capacity=16, spare_capacity=512,
                      num_probes=8),
    )
    ids = idx.add(data)
    res = idx.search(data[:4], k=40)
    exact = idx.search(data[:4], k=40, exact=True)
    for row, erow in zip(res, exact):
        assert len(row) >= 30  # probes cover most of the 8 blocks + spare
        # self-hit must rank first with distance ~0
        assert row[0][1] == pytest.approx(0.0, abs=1e-4)
    # k larger than the whole database: every live vector is returned once
    res_all = idx.search(data[:2], k=512)
    for row in res_all:
        assert len(row) == 400
        assert len({i for i, _ in row}) == 400


def test_ivf_cold_build_prestaged(rng, monkeypatch):
    """The cold-build fast path (stage-all -> device-sample k-means ->
    prestaged inserts) must produce a working index identical in behavior
    to the generic path."""
    import zebra_tpu.index.base as base_mod
    import zebra_tpu.index.ivf_host as host_mod

    monkeypatch.setattr(base_mod, "BATCH", 1024)
    monkeypatch.setattr(host_mod, "BATCH", 1024)
    data = _data(rng, 5000, 24)
    idx = IVFIndex(dim=24, metric="cosine", options=_opts(num_probes=8))
    ids = idx.add(data)  # n >= 2*BATCH -> cold path
    assert len(idx) == 5000
    res = idx.search(data[:32], k=1)
    hits = sum(row[0][0] == ids[i] for i, row in enumerate(res))
    assert hits >= 31  # self-lookup through the staged build
    # incremental adds after a cold build still work
    more = idx.add(_data(rng, 300, 24))
    assert len(idx) == 5300 and len(more) == 300


def test_ivf_cold_build_partial_window(rng, monkeypatch):
    """When the staging window is smaller than the batch count (big-slab
    builds: the 10M x 768 case would OOM prestaging 15GB of wire buffers),
    the cold path must live-stage the tail spans and still build correctly."""
    import zebra_tpu.index.base as base_mod
    import zebra_tpu.index.ivf_host as host_mod

    monkeypatch.setattr(base_mod, "BATCH", 512)
    monkeypatch.setattr(host_mod, "BATCH", 512)
    monkeypatch.setattr(host_mod, "_STAGE_HBM_BUDGET", 0)  # force min window
    data = _data(rng, 5000, 24)
    idx = IVFIndex(dim=24, metric="cosine", options=_opts(num_probes=8))
    ids = idx.add(data)  # 10 spans, window clamps to 2
    assert len(idx) == 5000
    res = idx.search(data[:32], k=1)
    hits = sum(row[0][0] == ids[i] for i, row in enumerate(res))
    assert hits >= 31


def test_cell_choice_chunked_matches_unchunked(rng, monkeypatch):
    """Row-chunked insert cell scoring (the big-K OOM guard) must pick the
    same cells as the single-tile path: approx_max_k is per-row, so
    chunking the rows cannot change any row's result."""
    import jax.numpy as jnp

    from zebra_tpu.index import ivf

    x = jnp.asarray(rng.standard_normal((512, 24)).astype(np.float32))
    cents = jnp.asarray(rng.standard_normal((256, 24)).astype(np.float32))
    for metric in ("sql2", "cosine"):
        full = np.asarray(ivf._cell_choice(x, cents, metric, 4))
        monkeypatch.setattr(ivf, "_CHOICE_TRIGGER_ELEMS", 1)
        monkeypatch.setattr(ivf, "_CHOICE_TILE_ELEMS", 64 * 256)  # 64-row tiles
        chunked = np.asarray(ivf._cell_choice(x, cents, metric, 4))
        monkeypatch.undo()
        np.testing.assert_array_equal(full, chunked)


def test_ivf_int8_slab(rng):
    """int8 quantised slab: insert/search/remove/dedup/save-load, recall
    against the exact scan of the SAME (quantised) slab."""
    data = _data(rng, 2000, 32)
    idx = IVFIndex(dim=32, metric="cosine", options=_opts(dtype="int8", num_probes=16))
    ids = idx.add(data)
    assert idx.state.vectors.dtype.name == "int8" and idx.state.scales is not None
    res = idx.search(data[:50], k=1)
    hits = sum(row[0][0] == ids[i] for i, row in enumerate(res))
    assert hits >= 48  # int8 rounding can flip exact near-duplicates only
    approx = idx.search(data[:100], k=10)
    exact = idx.search(data[:100], k=10, exact=True)
    overlap = sum(
        len({i for i, _ in approx[b]} & {i for i, _ in exact[b]}) for b in range(100)
    )
    assert overlap / 1000 >= 0.95


def test_ivf_int8_roundtrip_and_dedup(tmp_path, rng):
    data = _data(rng, 400, 16)
    dup = np.concatenate([data, data[:40]])
    idx = IVFIndex(dim=16, metric="sql2", options=_opts(dtype="int8"))
    idx.add(dup)
    removed = idx.deduplicate()
    assert len(removed) == 40 and len(idx) == 400
    idx.save(str(tmp_path / "q"))
    idx2 = load_index(str(tmp_path / "q"))
    assert len(idx2) == 400 and idx2.state.scales is not None
    r1 = idx.search(data[:10], k=3)
    assert idx2.search(data[:10], k=3) == r1
    # rebuild (tombstone compaction) dequantises through the scales
    ids_live = idx2.ids()
    idx2.remove(ids_live[:300])
    assert len(idx2) == 100
    res = idx2.search(data[:5], k=1)
    assert all(row for row in res)


def test_int8_rejected_outside_ivf():
    from zebra_tpu.index.lsh import LSHIndex

    with pytest.raises(ValueError, match="int8"):
        LSHIndex(dim=16, options=IndexOptions(index_type="lsh", dtype="int8"))


def test_ivf_spare_flood_triggers_rebuild(rng):
    """Churn pattern that OOMed the 10M bench: clusters fill, a whole wave
    floods the spare, grow_spare doubles it — the rebuild policy must fire
    on spare OCCUPANCY vs live data (the old capacity-relative test could
    never fire after growth) and retrain/drain the spare."""
    idx = IVFIndex(dim=16, metric="sql2", options=_opts(num_probes=8))
    idx.add(_data(rng, 128, 16))  # tiny auto-sized partition (K=8)
    k0 = idx.stats()["clusters"]
    # flood: 20k more rows -> spare crosses the occupancy threshold
    idx.add(_data(rng, 20000, 16))
    st = idx.stats()
    assert len(idx) == 20128
    assert st["clusters"] > k0  # retrained to the grown population
    # post-rebuild the spare holds (far) less than the policy threshold
    assert st["spare_used"] <= max(0.125 * len(idx), 4096)
    q = _data(np.random.default_rng(3), 8, 16)
    assert all(row for row in idx.search(q, k=3))


@pytest.mark.parametrize("metric", ["cosine", "sql2"])
def test_two_stage_probe_selection_parity(rng, metric):
    """probe_sel='fast' (bf16 approx top-2P + exact f32 rescore) must agree
    with the single-stage f32 path at the RESULT level: needs K >= 128 so
    both use their non-trivial selection branches."""
    import jax.numpy as jnp

    from zebra_tpu.index import ivf
    from zebra_tpu.ops.kmeans import kmeans
    import jax

    data = _data(rng, 8000, 64, clusters=96, sigma=0.05)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(8000), k=256,
        iters=4, chunk=4096,
    )
    st = ivf.empty_state(cents, cluster_capacity=96)
    st, _ = ivf.insert(st, jnp.asarray(data), jnp.int32(8000))
    q = jnp.asarray(
        data[:64] + 0.01 * rng.standard_normal((64, 64)).astype(np.float32)
    )
    da, sa, va = ivf.query(st, q, 10, metric=metric, num_probes=4,
                           probe_sel="f32")
    db_, sb, vb = ivf.query(st, q, 10, metric=metric, num_probes=4,
                            probe_sel="fast")
    overlap = sum(
        len(set(np.asarray(sa)[b][np.asarray(va)[b]].tolist())
            & set(np.asarray(sb)[b][np.asarray(vb)[b]].tolist()))
        for b in range(64)
    )
    # both are approximate probe selections of the same index; the fast
    # path's top-P-of-2P refinement may legitimately pick BETTER probes
    assert overlap >= 0.9 * 64 * 10
    assert np.mean(np.asarray(sa)[:, 0] == np.asarray(sb)[:, 0]) >= 0.95
    # self-lookup through the fast path must be exact
    dself, sself, vself = ivf.query(st, jnp.asarray(data[:64]), 1,
                                    metric=metric, num_probes=4,
                                    probe_sel="fast")
    assert np.asarray(dself)[:, 0].max() < 1e-3


def test_query_batch_chunked_matches_unchunked(rng):
    """batch_chunk splits huge query batches inside ONE jitted program
    (lax.map) to bound the [B, K] centroid transient; results must equal
    the unchunked path exactly, including a non-divisible tail."""
    import jax.numpy as jnp

    from zebra_tpu.index import ivf as V

    data = _data(rng, 2000, 32)
    idx = IVFIndex(dim=32, metric="cosine", options=_opts(num_probes=4))
    idx.add(data)
    q = jnp.asarray(
        data[:300] + 0.02 * rng.standard_normal((300, 32)).astype(np.float32)
    )
    base = V.query(idx.state, q, 5, metric="cosine", num_probes=4,
                   batch_chunk=300)
    for chunk in (128, 100):  # 300 = 2x128 + 44 pad; 3x100 exact
        got = V.query(idx.state, q, 5, metric="cosine", num_probes=4,
                      batch_chunk=chunk)
        for a, b in zip(base, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_abstract_state_matches_real_build(rng, dtype):
    """The shape-warm's abstract state must be EXACTLY what _fresh_state
    builds (shape + dtype + static ccap, leaf for leaf) — a drift here
    turns every pre-warm compile into waste without failing anything."""
    import dataclasses

    import jax

    n = 600
    idx = make_index(16, metric="cosine", options=_opts(dtype=dtype))
    abstract = idx._abstract_state(n)
    idx.add(_data(rng, n, 16))
    real = idx.state
    assert abstract.ccap == real.ccap
    for f in dataclasses.fields(type(real)):
        if f.name == "ccap":
            continue
        a, r = getattr(abstract, f.name), getattr(real, f.name)
        if r is None or a is None:
            assert a is None and r is None, f.name
            continue
        assert tuple(a.shape) == tuple(r.shape), (f.name, a.shape, r.shape)
        assert jax.numpy.dtype(a.dtype) == jax.numpy.dtype(r.dtype), f.name


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_warm_shape_programs_lower(dtype):
    """The pre-warm lowering must stay callable for every slab tier (its
    static args mirror _insert_batch_dev/_query_device by hand)."""
    idx = make_index(16, metric="cosine", options=_opts(dtype=dtype))
    idx._warm_shape_programs(5000, qbatch=64, k=10)  # must not raise
