"""Pallas IVF block re-rank vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zebra_tpu.ops.pallas_ivf as PI
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
    d2, s2, v2 = ivf.query(st, q, 10, metric=metric, num_probes=num_probes, rerank="pallas")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-3, atol=2e-3)


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
