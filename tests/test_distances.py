"""Distance metrics vs scipy/numpy references (SURVEY.md §4 test plan (1))."""

import numpy as np
import pytest
from scipy.spatial import distance as sp

from zebra_tpu.ops.distances import METRICS, pairwise, rowwise

Q, C, D = 7, 13, 33


@pytest.fixture
def data(rng):
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = rng.standard_normal((C, D)).astype(np.float32)
    return q, x


def _scipy_matrix(fn, q, x):
    out = np.zeros((q.shape[0], x.shape[0]), dtype=np.float64)
    for i in range(q.shape[0]):
        for j in range(x.shape[0]):
            out[i, j] = fn(q[i], x[j])
    return out


SCIPY_FNS = {
    "cosine": sp.cosine,
    "l2": sp.euclidean,
    "sql2": sp.sqeuclidean,
    "chebyshev": sp.chebyshev,
    "canberra": sp.canberra,
    "braycurtis": sp.braycurtis,
    "manhattan": sp.cityblock,
    "l3": lambda a, b: sp.minkowski(a, b, 3),
    "l4": lambda a, b: sp.minkowski(a, b, 4),
    "minkowski": lambda a, b: sp.minkowski(a, b, 3),
    "p_norm": lambda a, b: np.sum(np.abs(a - b) ** 3),
}


# MXU metrics use the f32 Gram expansion (||a||^2 + ||b||^2 - 2ab), which
# trades ~1e-3 relative precision for matmul throughput; elementwise metrics
# are numerically tight.
def _tol(metric):
    return 1e-3 if metric in ("cosine", "l2", "sql2") else 2e-4


@pytest.mark.parametrize("metric", sorted(SCIPY_FNS))
def test_pairwise_matches_scipy(metric, data):
    q, x = data
    got = np.asarray(pairwise(q, x, metric=metric, power=3.0))
    want = _scipy_matrix(SCIPY_FNS[metric], q, x)
    np.testing.assert_allclose(got, want, rtol=_tol(metric), atol=_tol(metric))


def test_hamming_reference_semantics(data):
    # reference distance.rs:146-157: popcount over low bytes of f32 bit patterns
    q, x = data
    got = np.asarray(pairwise(q, x, metric="hamming"))
    qa = q.view(np.uint32) & 0xFF
    xa = x.view(np.uint32) & 0xFF
    want = np.zeros((Q, C))
    for i in range(Q):
        for j in range(C):
            want[i, j] = sum(bin(int(a ^ b)).count("1") for a, b in zip(qa[i], xa[j]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("metric", sorted(SCIPY_FNS))
def test_rowwise_consistent_with_pairwise(metric, data, rng):
    q, x = data
    cands = np.stack([x[rng.permutation(C)[:5]] for _ in range(Q)])  # [Q, 5, D]
    got = np.asarray(rowwise(q, cands, metric=metric, power=3.0))
    for b in range(Q):
        want = np.asarray(pairwise(q[b : b + 1], cands[b], metric=metric, power=3.0))[0]
        np.testing.assert_allclose(got[b], want, rtol=_tol(metric), atol=_tol(metric))


def test_identical_vectors_distance_zero(data):
    q, _ = data
    for metric in METRICS:
        d = np.asarray(pairwise(q, q, metric=metric, power=3.0))
        # Gram-expansion metrics cancel ||q||^2 terms of magnitude ~D, so the
        # absolute floor scales with D * eps_f32-level matmul error.
        atol = 0.02 if metric in ("l2", "sql2") else 5e-3
        np.testing.assert_allclose(np.diag(d), 0.0, atol=atol, err_msg=metric)


def test_zero_norm_cosine_defined():
    q = np.zeros((1, 8), np.float32)
    x = np.ones((1, 8), np.float32)
    d = np.asarray(pairwise(q, x, metric="cosine"))
    assert np.isfinite(d).all() and d[0, 0] == 1.0
