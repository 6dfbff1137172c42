"""Pallas fused re-rank kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zebra_tpu.ops.distances import pairwise
from zebra_tpu.ops.pallas_rerank import pallas_rerank

S, D, B, C, K = 512, 128, 4, 256, 5


@pytest.fixture
def setup(rng):
    vectors = rng.standard_normal((S, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    cand = rng.integers(0, S, (B, C)).astype(np.int32)
    cand[0, :10] = -1  # invalid entries
    # dedup within rows so ties are unambiguous
    for b in range(B):
        _, first = np.unique(cand[b], return_index=True)
        mask = np.zeros(C, bool)
        mask[first] = True
        cand[b, ~mask] = -1
    norms = (vectors**2).sum(1)[np.clip(cand, 0, S - 1)].astype(np.float32)
    valid = (cand >= 0).astype(np.float32)
    return vectors, q, cand, norms, valid


@pytest.mark.parametrize("metric", ["cosine", "sql2", "l2"])
def test_matches_oracle(metric, setup):
    vectors, q, cand, norms, valid = setup
    d, p = pallas_rerank(
        jnp.asarray(vectors), jnp.asarray(q), jnp.asarray(cand),
        jnp.asarray(norms), jnp.asarray(valid), metric=metric, k=K, interpret=True,
    )
    d, p = np.asarray(d), np.asarray(p)
    for b in range(B):
        dist = np.array(pairwise(q[b : b + 1], vectors[np.clip(cand[b], 0, S - 1)], metric=metric))[0].copy()
        dist[valid[b] == 0] = np.inf
        order = np.argsort(dist)[:K]
        np.testing.assert_allclose(np.sort(d[b]), np.sort(dist[order]), rtol=2e-3, atol=2e-3)
        assert set(p[b].tolist()) == set(order.tolist())


def test_underfull_candidates(rng):
    vectors = rng.standard_normal((S, D)).astype(np.float32)
    q = rng.standard_normal((1, D)).astype(np.float32)
    cand = np.full((1, 256), -1, np.int32)  # multiple of PAIR (two DMA buffers)
    cand[0, :3] = [5, 9, 100]
    norms = (vectors**2).sum(1)[np.clip(cand, 0, S - 1)].astype(np.float32)
    valid = (cand >= 0).astype(np.float32)
    d, p = pallas_rerank(
        jnp.asarray(vectors), jnp.asarray(q), jnp.asarray(cand),
        jnp.asarray(norms), jnp.asarray(valid), metric="cosine", k=K, interpret=True,
    )
    d, p = np.asarray(d), np.asarray(p)
    assert (p[0, :3] >= 0).all()
    assert (p[0, 3:] == -1).all()
    assert np.isinf(d[0, 3:]).all()


def test_lshindex_pallas_rerank_with_dim_padding(rng):
    """LSHIndex(rerank='pallas') pads the stored dim to the DMA tiling unit;
    results must match the xla index on the same data/seed."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index.lsh import LSHIndex
    import zebra_tpu.ops.pallas_rerank as PR

    orig = PR.pallas_rerank

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    PR.pallas_rerank = interp
    try:
        data = rng.standard_normal((400, 48)).astype(np.float32)
        ids = [bytes([(i + 1) % 256, (i + 1) // 256]) + bytes(14) for i in range(400)]
        ix_p = LSHIndex(dim=48, metric="cosine",
                        options=IndexOptions(num_tables=6, num_probes=4, seed=0, rerank="pallas"))
        ix_x = LSHIndex(dim=48, metric="cosine",
                        options=IndexOptions(num_tables=6, num_probes=4, seed=0))
        assert ix_p._dev_dim == 1024 and ix_x._dev_dim == 48
        ix_p.add(data, ids=list(ids))
        ix_x.add(data, ids=list(ids))
        q = data[:8] + 0.01 * rng.standard_normal((8, 48)).astype(np.float32)
        rp = ix_p.search(q, k=5)
        rx = ix_x.search(q, k=5)
        for a, b in zip(rp, rx):
            assert [i for i, _ in a] == [i for i, _ in b]
            np.testing.assert_allclose([d for _, d in a], [d for _, d in b], rtol=2e-3, atol=2e-3)
    finally:
        PR.pallas_rerank = orig


def test_query_pallas_path_matches_xla(rng):
    """End-to-end: B.query(rerank='pallas') == B.query(rerank='xla')."""
    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index import buckets as BK
    from zebra_tpu.index.lsh import LSHIndex

    # interpret mode is automatic off-TPU only if requested; patch the kernel
    # call through interpret by monkeypatching jit-static arg via env:
    import zebra_tpu.ops.pallas_rerank as PR

    orig = PR.pallas_rerank

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    PR.pallas_rerank = interp
    try:
        idx = LSHIndex(dim=32, metric="cosine", options=IndexOptions(num_tables=6, num_probes=4, seed=0))
        data = rng.standard_normal((300, 32)).astype(np.float32)
        idx.add(data)
        q = jnp.asarray(data[:8])
        d1, s1, v1 = BK.query(idx.state, q, 5, metric="cosine", num_probes=4, rerank="xla")
        d2, s2, v2 = BK.query(idx.state, q, 5, metric="cosine", num_probes=4, rerank="pallas")
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    finally:
        PR.pallas_rerank = orig
