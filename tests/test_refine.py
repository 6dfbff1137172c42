"""int8 residual refinement: ~f32-grade true recall at int8 scan bandwidth.

The plain int8 slab's known limitation is TRUE recall (~0.954 at 1M x 768:
quantisation noise reorders neighbours whose distance gaps sit below the
int8 resolution). ``IndexOptions(refine=N)`` stores a second int8 slab of
per-row quantisation residuals (reconstruction ``scale*v8 + rscale*r8`` ~ 15
mantissa bits) and re-ranks an N*k-oversampled candidate set against it.
Reference parity: the reference stores exact f32 and has no reduced-precision
tier at all (src/database/index/lsh.rs stores Vec<f32>); this closes the gap
between our fastest slab and its exact recall.
"""

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.index import load_index
from zebra_tpu.index.ivf_host import IVFIndex
from zebra_tpu.parallel.sharded import ShardedLSHIndex


def _opts(**kw):
    kw.setdefault("index_type", "ivf")
    kw.setdefault("seed", 0)
    kw.setdefault("num_probes", 16)
    return IndexOptions(**kw)


def _adversarial(rng, nq=40, per=20, dim=64, step=1e-4):
    """Per query: ``per`` points at radii 0.5 + j*step in random directions.

    The squared-distance gaps (~step) sit far below plain-int8 noise but far
    above the refined reconstruction's — int8 scrambles the ranking, refine
    restores it.
    """
    qs = rng.standard_normal((nq, dim)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    pts, truth = [], []
    for i in range(nq):
        dirs = rng.standard_normal((per, dim)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radii = 0.5 + step * np.arange(per, dtype=np.float32)
        pts.append(qs[i] + radii[:, None] * dirs)
        truth.append(np.arange(i * per, i * per + 10))
    return qs, np.concatenate(pts), truth


def _adversarial_cos(rng, nq=20, per=20, dim=64, step=3e-4):
    """Cosine variant: per query, points along one geodesic at angles
    0.5 + j*step — cosine distance is monotone in the ANGLE (radius is
    scale-invariant), so truth is again the 10 smallest j."""
    qs = rng.standard_normal((nq, dim)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    pts, truth = [], []
    for i in range(nq):
        u = rng.standard_normal(dim).astype(np.float32)
        u -= (u @ qs[i]) * qs[i]
        u /= np.linalg.norm(u)
        th = (0.5 + step * np.arange(per, dtype=np.float32))[:, None]
        pts.append(np.cos(th) * qs[i] + np.sin(th) * u)
        truth.append(np.arange(i * per, i * per + 10))
    return qs, np.concatenate(pts), truth


def _recall(idx, qs, truth, ids):
    res = idx.search(qs, k=10)
    hit = 0
    for b, row in enumerate(res):
        want = {ids[t] for t in truth[b]}
        hit += len({i for i, _ in row} & want)
    return hit / (10 * len(truth))


def test_refine_state_and_reconstruction(rng):
    data = rng.standard_normal((600, 32)).astype(np.float32)
    idx = IVFIndex(dim=32, metric="sql2", options=_opts(dtype="int8", refine=4))
    ids = idx.add(data)
    st = idx.state
    assert st.vectors.dtype.name == "int8" and st.residual is not None
    assert st.residual.dtype.name == "int8" and st.rscales is not None
    # reconstruct every live row and compare to the original: the residual
    # stage bounds the error at ~absmax/127^2 per element — ~100x tighter
    # than plain int8's absmax/254
    slots = idx._slot_ids.live_slots()
    recon = np.asarray(idx._take_rows(slots.astype(np.int32)))
    assert recon.dtype == np.float32
    row_of = {i: r for r, i in enumerate(ids)}
    orig = data[[row_of[i] for i in idx.ids()]]
    absmax = np.abs(orig).max(axis=1, keepdims=True)
    err = np.abs(recon - orig)
    assert (err <= absmax / (127 * 127) + 1e-7).all()


@pytest.mark.parametrize("refine", [4, "scan"])
def test_refine_true_recall_beats_plain_int8(rng, refine):
    qs, pts, truth = _adversarial(rng)
    # refine=0 spells out "plain": with refine left at "auto" an int8 ivf
    # index resolves to the refined scan tier (the shipped default)
    plain = IVFIndex(dim=64, metric="sql2",
                     options=_opts(dtype="int8", refine=0))
    ids_p = plain.add(pts)
    refined = IVFIndex(
        dim=64, metric="sql2", options=_opts(dtype="int8", refine=refine)
    )
    ids_r = refined.add(pts)
    r_plain = _recall(plain, qs, truth, ids_p)
    r_ref = _recall(refined, qs, truth, ids_r)
    assert r_ref >= 0.98, f"refined recall {r_ref}"
    assert r_plain < 0.9, f"plain int8 unexpectedly exact ({r_plain}) — " \
        "the adversarial gap no longer separates the tiers"
    # reported distances are f32-grade: compare against the true sql2
    res = refined.search(qs, k=1)
    for b, row in enumerate(res):
        d_true = float(np.sum((qs[b] - pts[truth[b][0]]) ** 2))
        assert abs(row[0][1] - d_true) < 5e-4


@pytest.mark.parametrize("refine", [4, "scan"])
def test_refine_cosine_and_exact_path(rng, refine):
    qs, pts, truth = _adversarial_cos(rng, nq=20)
    idx = IVFIndex(dim=64, metric="cosine",
                   options=_opts(dtype="int8", refine=refine))
    ids = idx.add(pts)
    assert _recall(idx, qs, truth, ids) >= 0.95
    # exact (brute-force) search also refines: oversampled coarse scan +
    # residual re-rank
    ex = idx.search(qs, k=10, exact=True)
    ap = idx.search(qs, k=10)
    overlap = sum(
        len({i for i, _ in ap[b]} & {i for i, _ in ex[b]}) for b in range(20)
    )
    assert overlap / 200 >= 0.97


def test_refine_roundtrip_and_rebuild(tmp_path, rng):
    qs, pts, truth = _adversarial(rng, nq=20)
    idx = IVFIndex(dim=64, metric="sql2", options=_opts(dtype="int8", refine=4))
    ids = idx.add(pts)
    idx.save(str(tmp_path / "r"))
    idx2 = load_index(str(tmp_path / "r"))
    assert idx2.state.residual is not None
    assert idx2.search(qs[:5], k=3) == idx.search(qs[:5], k=3)
    # rebuild reconstructs rows in f32 — refined precision survives the
    # tombstone compaction (a bf16 copy would destroy it)
    idx2.remove(ids[-100:])
    idx2.rebuild()
    assert idx2.state.residual is not None
    r = _recall(idx2, qs[:10], truth[:10], ids)
    assert r >= 0.95


def test_refine_wire_is_quantised(rng):
    refined = IVFIndex(dim=16, options=_opts(dtype="int8", refine=4))
    plain = IVFIndex(dim=16, options=_opts(dtype="int8", refine=0))
    # refined tier: host-quantised tuple wire (~2B/elem), q8 WAL codec; the
    # f32 _wire_dtype is only the fallback array path (rebuild slices)
    assert refined._quant_wire and refined._wal_codec == "q8"
    assert refined._wire_row_bytes == 2 * refined._dev_dim + 8
    assert np.dtype(refined._wire_dtype) == np.float32
    assert not plain._quant_wire
    assert np.dtype(plain._wire_dtype).itemsize == 2  # bf16 wire


def test_host_quant_matches_device(rng):
    """quantise_pair_host must be BITWISE the device quantisation of
    ivf.insert (round-4 item #1's identity contract): same codes, same
    scales, same norms — whatever wire carried a vector, the slab is the
    same."""
    import jax.numpy as jnp

    from zebra_tpu.index import ivf as V
    from zebra_tpu.ops.kmeans import kmeans
    import jax

    n, dim, K = 256, 32, 8
    x = (rng.standard_normal((n, dim)) * rng.gamma(1.5, size=(n, 1))).astype(
        np.float32
    )
    cents, _ = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), jnp.int32(n),
                      k=K, iters=3, chunk=256)
    # insert donates the whole state (centroids included) — each state needs
    # its own centroid buffer
    mk = lambda: V.empty_state(jnp.array(cents, copy=True), cluster_capacity=64,
                               spare_capacity=64, dtype=jnp.int8, refine=True)
    st_dev, sl_dev = V.insert(mk(), jnp.asarray(x), jnp.int32(n))
    v8, r8, sc, rs = V.quantise_pair_host(x)
    st_q, sl_q = V.insert_quant(
        mk(), jnp.asarray(v8), jnp.asarray(r8),
        jnp.asarray(np.stack([sc, rs], axis=1)), jnp.int32(n),
    )
    sl_dev, sl_q = np.asarray(sl_dev), np.asarray(sl_q)
    assert (sl_dev >= 0).all() and (sl_q >= 0).all()
    dv, ds, dr, drs, dn = (
        np.asarray(a) for a in
        (st_dev.vectors, st_dev.scales, st_dev.residual, st_dev.rscales,
         st_dev.norms)
    )
    qv, qs_, qr, qrs, qn = (
        np.asarray(a) for a in
        (st_q.vectors, st_q.scales, st_q.residual, st_q.rscales, st_q.norms)
    )
    for i in range(n):
        a, b = sl_dev[i], sl_q[i]
        assert np.array_equal(dv[a], v8[i]), i  # device quant == host quant
        assert np.array_equal(dr[a], r8[i]), i
        assert ds[a] == sc[i] and drs[a] == rs[i], i
        assert np.array_equal(dv[a], qv[b]) and np.array_equal(dr[a], qr[b])
        assert ds[a] == qs_[b] and drs[a] == qrs[b], i
        # norms are reductions — two different jitted graphs may reassociate
        # the sum (measured 1-ulp drift), so the contract is codes + scales
        # bitwise, norms to f32 grade
        assert np.isclose(dn[a], qn[b], rtol=1e-6), i


def test_quant_wire_end_to_end(rng):
    """IVFIndex.add ships the host-quantised pair: every stored row is
    bitwise quantise_pair_host of the original input."""
    from zebra_tpu.index import ivf as V

    pts = rng.standard_normal((500, 48)).astype(np.float32)
    idx = IVFIndex(dim=48, metric="sql2",
                   options=_opts(dtype="int8", refine="scan"))
    ids = idx.add(pts)
    v8, r8, sc, rs = V.quantise_pair_host(pts)
    vecs = np.asarray(idx.state.vectors)
    res = np.asarray(idx.state.residual)
    scs = np.asarray(idx.state.scales)
    rss = np.asarray(idx.state.rscales)
    for i, doc_id in enumerate(ids):
        s = idx._id_to_slot.get(doc_id)
        assert np.array_equal(vecs[s], v8[i]), i
        assert np.array_equal(res[s], r8[i]), i
        assert scs[s] == sc[i] and rss[s] == rs[i], i
    # staged batches are (v8, r8, scales) tuples; the k-means sampling hook
    # reconstructs bf16 rows from them (cold-build path)
    staged = idx._stage_span(pts, (0, 500))
    assert isinstance(staged, tuple) and staged[0].dtype == np.int8
    rows = np.asarray(idx._staged_rows(staged, 5), dtype=np.float32)
    assert rows.shape == (5, 48)
    assert np.allclose(rows, pts[:5], atol=np.abs(pts[:5]).max() / 100)


@pytest.mark.parametrize("refine", [4, "scan"])
def test_refine_sharded(tmp_path, rng, refine):
    qs, pts, truth = _adversarial(rng, nq=20)
    ix = ShardedLSHIndex(
        dim=64, metric="sql2",
        options=_opts(dtype="int8", refine=refine), shards=8,
    )
    ids = ix.add(pts)
    assert ix.state.residual is not None
    assert _recall(ix, qs, truth, ids) >= 0.95
    ix.save(str(tmp_path / "s"))
    ix2 = ShardedLSHIndex.load(str(tmp_path / "s"))
    assert ix2.state.residual is not None
    assert ix2.search(qs[:5], k=3) == ix.search(qs[:5], k=3)
    # reshard-on-load reconstructs rows through the residual
    ix4 = ShardedLSHIndex.load(str(tmp_path / "s"), shards=4)
    assert len(ix4) == len(ix)
    assert _recall(ix4, qs, truth, ids) >= 0.95


def test_refine_through_database(tmp_path, rng):
    from zebra_tpu.db import Database

    qs, pts, truth = _adversarial(rng, nq=10)
    cfg = DatabaseConfig(
        dim=64, metric="sql2",
        index=_opts(dtype="int8", refine=4),
    )
    with Database.create(str(tmp_path / "db"), cfg) as db:
        ids = db.insert_vectors(pts)
        res = db.query(qs, 10)
        hit = 0
        for b, row in enumerate(res):
            want = {ids[t] for t in truth[b]}
            hit += len({i for i, _ in row} & want)
        assert hit / 100 >= 0.95


@pytest.mark.parametrize("refine", [4, "scan"])
@pytest.mark.parametrize("metric", ["sql2", "l2", "cosine"])
def test_refine_dot_inversion_matches_reconstruction(metric, refine, rng):
    """The refine pass recovers the hi dot by INVERTING the coarse distance
    (distances.mxu_invert_parts) instead of re-gathering v8 — the reported
    distances must still match an exact host-side computation against the
    reconstructed values, for every invertible metric (l2 exercises the
    square/unsquare roundtrip). Covers both the probe path and the
    brute-force path (exact_scan with norms=)."""
    pts = rng.standard_normal((800, 64)).astype(np.float32)
    qs = rng.standard_normal((16, 64)).astype(np.float32)
    idx = IVFIndex(dim=64, metric=metric,
                   options=_opts(dtype="int8", refine=refine))
    ids = idx.add(pts)
    slots = idx._slot_ids.live_slots()
    recon = np.asarray(idx._take_rows(slots.astype(np.int32)))  # [N, 64] f32
    slot_row = {int(s): r for r, s in enumerate(slots)}
    id_slot = {i: int(s) for i, s in zip(idx.ids(), slots)}

    def true_dist(qv, row):
        if metric == "cosine":
            den = np.linalg.norm(qv) * np.linalg.norm(row)
            return 1.0 - float(qv @ row) / den
        d2 = float(np.sum((qv - row) ** 2))
        return d2 if metric == "sql2" else float(np.sqrt(d2))

    for res in (idx.search(qs, k=5), idx.search(qs, k=5, exact=True)):
        for b, rows in enumerate(res):
            for i, d in rows:
                want = true_dist(qs[b], recon[slot_row[id_slot[i]]])
                assert abs(d - want) <= 2e-4 * (1.0 + abs(want)), (
                    metric, b, d, want)


def test_refine_rejected_outside_int8():
    with pytest.raises(ValueError, match="refine"):
        IVFIndex(dim=16, options=_opts(dtype="bfloat16", refine=4))
    with pytest.raises(ValueError, match="refine"):
        ShardedLSHIndex(
            dim=16, options=_opts(dtype="float32", refine=2), shards=2
        )


def test_native_quant_matches_numpy(rng):
    """The native fmaf kernel is BITWISE the numpy f64-emulation fallback
    (both compute the single-rounded FMA residual), across magnitudes from
    denormal-adjacent to huge, plus all-zero rows."""
    from zebra_tpu.index import ivf as V
    from zebra_tpu.native import quant as nq

    if not nq.available():
        pytest.skip("no native toolchain")
    x = np.concatenate([
        rng.standard_normal((64, 48)).astype(np.float32),
        (rng.standard_normal((16, 48)) * 1e-30).astype(np.float32),
        (rng.standard_normal((16, 48)) * 1e30).astype(np.float32),
        np.zeros((4, 48), np.float32),
    ])
    got = V.quantise_pair_host(x)
    want = V._quantise_pair_numpy(np.ascontiguousarray(x, np.float32))
    for g, w, name in zip(got, want, ("v8", "r8", "scale", "rscale")):
        assert np.array_equal(g, w), name
