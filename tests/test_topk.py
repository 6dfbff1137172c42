"""Masked top-k and merge (SURVEY.md §4 (1))."""

import numpy as np

from zebra_tpu.ops.topk import masked_topk, merge_topk


def test_masked_topk_respects_mask(rng):
    d = rng.standard_normal((3, 20)).astype(np.float32)
    ids = np.arange(60, dtype=np.int32).reshape(3, 20)
    valid = np.ones((3, 20), bool)
    valid[:, ::2] = False
    td, ti, tv = (np.asarray(a) for a in masked_topk(d, valid, ids, 5))
    for b in range(3):
        want = np.sort(d[b, valid[b]])[:5]
        np.testing.assert_allclose(td[b], want, rtol=1e-6)
        assert tv[b].all()
        assert all(ids[b][valid[b]].tolist().count(i) == 1 for i in ti[b])


def test_masked_topk_underfull(rng):
    d = rng.standard_normal((1, 6)).astype(np.float32)
    valid = np.array([[True, False, False, True, False, False]])
    ids = np.arange(6, dtype=np.int32)[None, :]
    td, ti, tv = (np.asarray(a) for a in masked_topk(d, valid, ids, 4))
    assert tv[0].sum() == 2
    assert (ti[0][~tv[0]] == -1).all()
    assert np.isinf(td[0][~tv[0]]).all()


def test_merge_equals_global_topk(rng):
    d = rng.standard_normal((2, 40)).astype(np.float32)
    ids = np.arange(80, dtype=np.int32).reshape(2, 40)
    valid = rng.random((2, 40)) > 0.3
    k = 7
    a = masked_topk(d[:, :20], valid[:, :20], ids[:, :20], k)
    b = masked_topk(d[:, 20:], valid[:, 20:], ids[:, 20:], k)
    md, mi, mv = (np.asarray(x) for x in merge_topk(*a, *b, k))
    gd, gi, gv = (np.asarray(x) for x in masked_topk(d, valid, ids, k))
    np.testing.assert_allclose(md, gd, rtol=1e-6)
    np.testing.assert_array_equal(mv, gv)
