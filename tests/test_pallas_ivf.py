"""Pallas IVF block re-rank vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zebra_tpu.ops.pallas_ivf as PI
import zebra_tpu.ops.experimental_ivf as PX
from zebra_tpu.index import ivf
from zebra_tpu.ops.kmeans import kmeans


@pytest.fixture
def interp_kernel():
    orig = PI.pallas_ivf_rerank

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    PI.pallas_ivf_rerank = interp
    yield
    PI.pallas_ivf_rerank = orig


@pytest.fixture
def ivf_state(rng):
    centers = rng.standard_normal((16, 128)).astype(np.float32)
    n = 2048
    data = centers[rng.integers(0, 16, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=32, iters=5,
        chunk=1024,
    )
    st = ivf.empty_state(cents, cluster_capacity=256)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    # tombstones exercise the validity mask inside the kernel
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:50].astype(np.int32)))
    return st, data


@pytest.mark.parametrize("metric", ["cosine", "l2", "sql2"])
@pytest.mark.parametrize("num_probes", [5, 8])  # odd width exercises pad+mask
def test_pallas_ivf_matches_xla(interp_kernel, ivf_state, rng, metric, num_probes):
    st, data = ivf_state
    q = jnp.asarray(
        data[:16] + 0.02 * rng.standard_normal((16, 128)).astype(np.float32)
    )
    d1, s1, v1 = ivf.query(st, q, 10, metric=metric, num_probes=num_probes, rerank="xla")
    # the exact 6-pass f32 dot must reproduce the XLA path bit-for-bit in
    # ranking; the default (f32 auto -> split bf16x3f dots, ~1e-4 distance
    # error) may swap near-ties, so it gets an overlap bound instead
    d2, s2, v2 = ivf.query(st, q, 10, metric=metric, num_probes=num_probes,
                           rerank="pallas", rerank_dots="highest")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-3, atol=2e-3)
    d3, s3, v3 = ivf.query(st, q, 10, metric=metric, num_probes=num_probes,
                           rerank="pallas")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v3))
    overlap = np.mean(np.asarray(s1) == np.asarray(s3))
    assert overlap >= 0.97, f"auto split dots overlap {overlap}"
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), rtol=5e-3, atol=5e-3)


def test_pallas_ivf_underfull(interp_kernel, rng):
    """Fewer live candidates than k: tail must be -1/+inf."""
    cents = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    st = ivf.empty_state(cents, cluster_capacity=16)
    data = rng.standard_normal((3, 128)).astype(np.float32)
    st, _ = ivf.insert(st, jnp.asarray(np.pad(data, ((0, 5), (0, 0)))), jnp.int32(3))
    q = jnp.asarray(data[:2])
    d, s, v = ivf.query(st, q, 10, metric="cosine", num_probes=8, rerank="pallas")
    d, s, v = map(np.asarray, (d, s, v))
    assert v[:, :3].all() and not v[:, 3:].any()
    assert (s[:, 3:] == -1).all()
    assert np.isinf(d[:, 3:]).all()


def test_ivf_host_pallas_dim_padding(interp_kernel, rng):
    """IVFIndex(rerank='pallas') pads stored dim to 128 lanes; results must
    match the xla-rerank index on the same data/seed."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.ivf_host import IVFIndex

    data = rng.standard_normal((500, 48)).astype(np.float32)
    ids = [bytes([(i + 1) % 256, (i + 1) // 256]) + bytes(14) for i in range(500)]
    kw = dict(index_type="ivf", num_probes=8, seed=0)
    ix_p = IVFIndex(dim=48, metric="cosine", options=IndexOptions(rerank="pallas", **kw))
    ix_x = IVFIndex(dim=48, metric="cosine", options=IndexOptions(**kw))
    assert ix_p._dev_dim == 128 and ix_x._dev_dim == 48
    ix_p.add(data, ids=list(ids))
    ix_x.add(data, ids=list(ids))
    q = data[:8] + 0.01 * rng.standard_normal((8, 48)).astype(np.float32)
    rp = ix_p.search(q, k=5)
    rx = ix_x.search(q, k=5)
    for a, b in zip(rp, rx):
        assert [i for i, _ in a] == [i for i, _ in b]
        np.testing.assert_allclose(
            [d for _, d in a], [d for _, d in b], rtol=2e-3, atol=2e-3
        )


def test_pallas_int8_scales_parity(rng, interp_kernel):
    """int8 slab through the wave kernel (interpret mode): results must
    match the XLA dequant path bit-for-bit in ranking."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=jnp.int8)
    st, _ = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    q = jnp.asarray(data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32))
    dp, sp, vp = ivf.query(st, q, 10, metric="cosine", num_probes=4, rerank="pallas")
    dx, sx, vx = ivf.query(st, q, 10, metric="cosine", num_probes=4, rerank="xla")
    overlap = sum(
        len(set(np.asarray(sp)[b][np.asarray(vp)[b]].tolist())
            & set(np.asarray(sx)[b][np.asarray(vx)[b]].tolist()))
        for b in range(32)
    )
    assert overlap >= 0.95 * 32 * 10  # f32-near-tie ordering may differ
    np.testing.assert_allclose(np.asarray(dp)[:, 0], np.asarray(dx)[:, 0], atol=1e-5)


@pytest.mark.parametrize("metric", ["cosine", "sql2"])
def test_pallas_residual_scan_parity(rng, interp_kernel, metric):
    """refine="scan": the residual-streaming wave kernel (both slabs DMA
    through the same waves, dot = s*dot(q,v8) + r*dot(q,r8)) must match the
    XLA reconstruction path — dots="highest" is exact f32 on both sides."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=jnp.int8,
                         refine=True)
    st, _ = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    assert st.residual is not None
    q = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    dx, sx, vx = ivf.query(st, q, 10, metric=metric, num_probes=4,
                           rerank="xla", refine_scan=True)
    dp, sp, vp = ivf.query(st, q, 10, metric=metric, num_probes=4,
                           rerank="pallas", rerank_dots="highest",
                           refine_scan=True)
    np.testing.assert_array_equal(np.asarray(vx), np.asarray(vp))
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sp))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dp),
                               rtol=2e-3, atol=2e-3)
    # the default recon dot (split-query bf16 hi + qhi lo) may swap
    # near-ties only
    d3, s3, v3 = ivf.query(st, q, 10, metric=metric, num_probes=4,
                           rerank="pallas", refine_scan=True)
    np.testing.assert_array_equal(np.asarray(vx), np.asarray(v3))
    overlap = np.mean(np.asarray(sx) == np.asarray(s3))
    assert overlap >= 0.97, f"recon split dots overlap {overlap}"
    # the scanned distances describe the reconstruction: spot-check row 0
    # against a host-side reconstruction of the selected slot
    recon = (
        np.asarray(st.vectors).astype(np.float32)
        * np.asarray(st.scales)[:, None]
        + np.asarray(st.residual).astype(np.float32)
        * np.asarray(st.rscales)[:, None]
    )
    q0 = np.asarray(q)[0]
    s0 = int(np.asarray(sp)[0, 0])
    r = recon[s0]
    if metric == "cosine":
        want = 1.0 - float(q0 @ r) / (np.linalg.norm(q0) * np.linalg.norm(r))
    else:
        want = float(np.sum((q0 - r) ** 2))
    assert abs(float(np.asarray(dp)[0, 0]) - want) <= 2e-4 * (1 + abs(want))


@pytest.mark.parametrize("dots", ["bf16", "bf16x2"])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_wave_dots_precision_matches_xla(rng, interp_kernel, dots, dtype):
    """Reduced-pass dot modes (the shipped 'auto' resolution for reduced
    slabs) keep ranking parity with the f32 XLA path: per-pass bf16 products
    are exact against bf16/int8 slab values; bf16x2 also keeps ~16 query
    mantissa bits (measured top-10 overlap 0.9999 on TPU, tools/abl_aux.py)."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    dt = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}[dtype]
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=dt)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:40].astype(np.int32)))
    q = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    dp, sp, vp = ivf.query(st, q, 10, metric="cosine", num_probes=4,
                           rerank="pallas", rerank_dots=dots)
    dx, sx, vx = ivf.query(st, q, 10, metric="cosine", num_probes=4,
                           rerank="xla")
    overlap = sum(
        len(set(np.asarray(sp)[b][np.asarray(vp)[b]].tolist())
            & set(np.asarray(sx)[b][np.asarray(vx)[b]].tolist()))
        for b in range(32)
    )
    min_frac = 0.95 if dots == "bf16x2" else 0.9
    assert overlap >= min_frac * 32 * 10
    assert np.mean(np.asarray(sp)[:, 0] == np.asarray(sx)[:, 0]) >= 0.9
    np.testing.assert_allclose(
        np.asarray(dp)[:, 0], np.asarray(dx)[:, 0], rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize(
    "pair", [("bf16x2", "bf16x2f", "bfloat16"), ("bf16x3", "bf16x3f", "float32")]
)
def test_fused_split_dots_match_multi_issue(rng, interp_kernel, pair):
    """The fused row-stacked split dots (qhi/qlo as two lhs ROWS of one MXU
    issue) must reproduce their multi-issue counterparts: same top-k slots,
    same distances up to f32 summation order (the backend may accumulate a
    [2, D] x [D, C] dot in a different contraction order than two separate
    [1, D] dots — observed ~3e-5 relative on the CPU interpreter)."""
    base, fused, dtype = pair
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=dt)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:40].astype(np.int32)))
    q = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    for metric in ("cosine", "sql2"):
        da, sa, va = ivf.query(st, q, 10, metric=metric, num_probes=4,
                               rerank="pallas", rerank_dots=base)
        db_, sb, vb = ivf.query(st, q, 10, metric=metric, num_probes=4,
                                rerank="pallas", rerank_dots=fused)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        overlap = np.mean(np.asarray(sa) == np.asarray(sb))
        assert overlap >= 0.99, f"{metric}: slot overlap {overlap}"
        np.testing.assert_allclose(
            np.asarray(da), np.asarray(db_), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("metric", ["cosine", "l2", "sql2"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_wave_v3_aug_matches_xla(rng, metric, dtype):
    """v3 (augmented slab, aux-free) parity vs the XLA path: same slots,
    same distances, dead rows and empty slots masked identically."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=dt)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:40].astype(np.int32)))
    q32 = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )

    # probe selection identical to ivf.query's K<128 path
    from zebra_tpu.ops import distances as DD

    sel = metric if metric in DD.MXU_METRICS else "sql2"
    score = DD.pairwise(q32, st.centroids, metric=sel, precision="default")
    _, probes = jax.lax.top_k(-score, 4)

    vec_aug = PX.augment_slab(st.vectors, st.norms, st.valid, metric)
    d3, s3, v3 = PX.ivf_rerank_aug(
        vec_aug, st.cluster_capacity, q32, probes.astype(jnp.int32), 10,
        metric=metric, interpret=True,
    )
    # the kernel's contract is to rank ITS OWN augmented slab exactly — the
    # oracle is numpy over the same representation (the augmented rows of a
    # bf16 slab are a slightly different rounding of the raw rows, so a
    # raw-row reference would only fuzzily agree; that representation delta
    # is the adapter's documented property, not a kernel bug)
    C = st.cluster_capacity
    va = np.asarray(vec_aug, dtype=np.float32)
    w = np.asarray(PX.aug_query(q32, metric))
    pr = np.asarray(probes)
    for b in range(32):
        cand_slots = np.concatenate([np.arange(c * C, (c + 1) * C) for c in pr[b]])
        draw = va[cand_slots] @ w[b]
        draw = np.minimum(draw, PI.BIG)
        order = np.argsort(draw, kind="stable")[:10]
        exp_slots = cand_slots[order]
        exp_valid = draw[order] < PI.BIG
        got_s = np.asarray(s3)[b]
        got_v = np.asarray(v3)[b]
        np.testing.assert_array_equal(got_v, exp_valid)
        # last-ulp accumulation-order ties may swap adjacent ranks between
        # the numpy oracle and the kernel's dot — compare the distance
        # SEQUENCE exactly-ish and the slot SET (supersets of any tie)
        exp_d = draw[order][exp_valid]
        got_d = np.asarray(d3)[b][got_v] - (1.0 if metric == "cosine" else 0.0)
        if metric == "l2":
            got_d = np.asarray(d3)[b][got_v] ** 2 - (q32[b] @ q32[b])
        elif metric == "sql2":
            got_d = np.asarray(d3)[b][got_v] - np.asarray(q32[b] @ q32[b])
        np.testing.assert_allclose(got_d, exp_d, rtol=1e-4, atol=1e-4)
        assert len(set(got_s[got_v].tolist()) ^ set(exp_slots[exp_valid].tolist())) <= 2
    # distances map back to true metric values vs the XLA path (loose: the
    # augmented bf16 representation re-rounds rows)
    dx, sx, vx = ivf.query(st, q32, 10, metric=metric, num_probes=4, rerank="xla")
    tol = 5e-3 if dtype == "bfloat16" else 2e-5
    np.testing.assert_allclose(
        np.asarray(d3)[:, 0], np.asarray(dx)[:, 0], rtol=tol, atol=tol
    )


def test_wave_v3_underfull(rng):
    """Fewer live candidates than k through v3: tail must be -1/+inf."""
    cents = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    st = ivf.empty_state(cents, cluster_capacity=16)
    data = rng.standard_normal((3, 128)).astype(np.float32)
    st, _ = ivf.insert(st, jnp.asarray(np.pad(data, ((0, 5), (0, 0)))), jnp.int32(3))
    q32 = jnp.asarray(data[:2])
    from zebra_tpu.ops import distances as DD

    score = DD.pairwise(q32, st.centroids, metric="cosine", precision="default")
    _, probes = jax.lax.top_k(-score, 8)
    vec_aug = PX.augment_slab(st.vectors, st.norms, st.valid, "cosine")
    d, s, v = PX.ivf_rerank_aug(
        vec_aug, st.cluster_capacity, q32, probes.astype(jnp.int32), 10,
        metric="cosine", interpret=True,
    )
    d, s, v = map(np.asarray, (d, s, v))
    assert v[:, :3].all() and not v[:, 3:].any()
    assert (s[:, 3:] == -1).all()
    assert np.isinf(d[:, 3:]).all()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_wave_v2_matches_xla(rng, interp_kernel, dtype):
    """v2 (one-matmul wave) parity vs the XLA path for every slab dtype."""
    import jax.numpy as jnp2

    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    dt = {"float32": jnp2.float32, "bfloat16": jnp2.bfloat16, "int8": jnp2.int8}[dtype]
    st = ivf.empty_state(cents, cluster_capacity=160, dtype=dt)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:40].astype(np.int32)))
    q = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    dp, sp, vp = ivf.query(st, q, 10, metric="cosine", num_probes=4, rerank="pallas2")
    dx, sx, vx = ivf.query(st, q, 10, metric="cosine", num_probes=4, rerank="xla")
    overlap = sum(
        len(set(np.asarray(sp)[b][np.asarray(vp)[b]].tolist())
            & set(np.asarray(sx)[b][np.asarray(vx)[b]].tolist()))
        for b in range(32)
    )
    # v2 on reduced-precision slabs ships bf16 queries (exact one-pass MXU);
    # near-tie orderings vs the f32-query XLA path may differ slightly
    assert overlap >= 0.9 * 32 * 10
    # the top hit (a 0.02-sigma self-neighbour) must agree
    agree = np.mean(np.asarray(sp)[:, 0] == np.asarray(sx)[:, 0])
    assert agree >= 0.9


def test_wave_dots_bf16x3_f32_slab(rng, interp_kernel):
    """bf16x3 (3-pass split of BOTH operands) on an f32 slab must match the
    6-pass HIGHEST XLA path: the dropped qlo*blo term is below f32 rounding."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1024
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=16, iters=4,
        chunk=1024,
    )
    st = ivf.empty_state(cents, cluster_capacity=160)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:40].astype(np.int32)))
    q = jnp.asarray(
        data[:32] + 0.02 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    dp, sp, vp = ivf.query(st, q, 10, metric="cosine", num_probes=4,
                           rerank="pallas", rerank_dots="bf16x3")
    dx, sx, vx = ivf.query(st, q, 10, metric="cosine", num_probes=4,
                           rerank="xla")
    overlap = sum(
        len(set(np.asarray(sp)[b][np.asarray(vp)[b]].tolist())
            & set(np.asarray(sx)[b][np.asarray(vx)[b]].tolist()))
        for b in range(32)
    )
    assert overlap >= 0.97 * 32 * 10
    np.testing.assert_array_equal(np.asarray(sp)[:, 0], np.asarray(sx)[:, 0])
    np.testing.assert_allclose(
        np.asarray(dp)[:, 0], np.asarray(dx)[:, 0], rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_tiled_fetch_matches_block_fetch(rng, interp_kernel, dtype):
    """fetch="tiles" DMAs only the occupied 32-row sub-tiles of each probed
    block (live rows sit in the prefix [0, counts[c])); results must be
    IDENTICAL to whole-block fetches — under-full clusters, tombstones and
    the odd-probe pad column included."""
    centers = rng.standard_normal((8, 128)).astype(np.float32)
    n = 1500  # ~47 rows/cluster at k=32, C=128: most blocks 2 of 4 sub-tiles
    data = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, 128)
    ).astype(np.float32)
    cents, _ = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(data), jnp.int32(n), k=32, iters=4,
        chunk=1024,
    )
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    st = ivf.empty_state(cents, cluster_capacity=128, dtype=dt)
    st, slots = ivf.insert(st, jnp.asarray(data), jnp.int32(n))
    st = ivf.delete_slots(st, jnp.asarray(np.asarray(slots)[:60].astype(np.int32)))
    q = jnp.asarray(
        data[:24] + 0.02 * rng.standard_normal((24, 128)).astype(np.float32)
    )
    for metric in ("cosine", "sql2"):
        for P in (3, 4):  # 3 exercises the pad column with tiles=0
            a = ivf.query(st, q, 10, metric=metric, num_probes=P,
                          rerank="pallas", rerank_fetch="block")
            for fetch in ("tiles", "switch"):
                b = ivf.query(st, q, 10, metric=metric, num_probes=P,
                              rerank="pallas", rerank_fetch=fetch)
                for x, y in zip(a, b):
                    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
