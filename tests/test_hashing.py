"""Hashing: sign codes vs naive dots, packing, multiprobe (SURVEY.md §4 (1))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zebra_tpu.ops import hashing as H

T, BITS, D, N = 4, 10, 24, 50


@pytest.fixture
def planes_and_data(rng):
    data = rng.standard_normal((N, D)).astype(np.float32)
    planes, consts = H.sample_planes_random(jax.random.PRNGKey(0), T, BITS, D)
    return np.asarray(planes), np.asarray(consts), data


def test_codes_match_naive_sign_bits(planes_and_data):
    planes, consts, data = planes_and_data
    codes = np.asarray(H.hash_codes(jnp.asarray(data), jnp.asarray(planes), jnp.asarray(consts)))
    for t in range(T):
        acts = data @ planes[t].T + consts[t]  # [N, BITS]
        # skip vectors with a small margin on any bit: hashing deliberately
        # uses the platform's fast (bf16-grade) matmul precision, so signs
        # within ~0.5% of the activation scale may differ from float64 numpy
        # (harmless for recall — multiprobe flips exactly those bits first)
        decided = (np.abs(acts) > 0.05).all(axis=1)
        want = ((acts >= 0).astype(np.int64) << np.arange(BITS)).sum(axis=1)
        np.testing.assert_array_equal(codes[decided, t], want[decided])


def test_codes_in_range(planes_and_data):
    planes, consts, data = planes_and_data
    codes = np.asarray(H.hash_codes(jnp.asarray(data), jnp.asarray(planes), jnp.asarray(consts)))
    assert codes.min() >= 0 and codes.max() < 2**BITS


def test_data_planes_bisect_pairs(rng):
    data = rng.standard_normal((N, D)).astype(np.float32)
    planes, consts = H.sample_planes_data(jax.random.PRNGKey(1), T, BITS, jnp.asarray(data))
    planes, consts = np.asarray(planes), np.asarray(consts)
    # Every plane must be unit-norm and actually split the data (not constant),
    # matching the intent of the reference's bisector scheme (lsh.rs:221-230).
    np.testing.assert_allclose(np.linalg.norm(planes, axis=-1), 1.0, rtol=1e-5)
    acts = np.einsum("nd,tbd->ntb", data, planes) + consts
    frac_above = (acts >= 0).mean(axis=0)  # [T, BITS]
    assert (frac_above > 0.02).all() and (frac_above < 0.98).all()


def test_multiprobe_first_is_base_and_all_distinct(planes_and_data):
    planes, consts, data = planes_and_data
    acts = H.hash_activations(jnp.asarray(data), jnp.asarray(planes), jnp.asarray(consts))
    probes = np.asarray(H.multiprobe(acts, 8))  # [N, T, 8]
    codes = np.asarray(H.pack_signs(acts))
    np.testing.assert_array_equal(probes[..., 0], codes)
    # per (vector, table), the 8 probes are distinct codes in range
    for n in range(0, N, 7):
        for t in range(T):
            p = probes[n, t]
            assert len(set(p.tolist())) == 8
            assert p.min() >= 0 and p.max() < 2**BITS


def test_multiprobe_flips_lowest_margin_bit_first(planes_and_data):
    planes, consts, data = planes_and_data
    acts = np.asarray(H.hash_activations(jnp.asarray(data), jnp.asarray(planes), jnp.asarray(consts)))
    probes = np.asarray(H.multiprobe(jnp.asarray(acts), 2))
    for n in range(0, N, 11):
        for t in range(T):
            flipped = probes[n, t, 0] ^ probes[n, t, 1]
            bit = int(flipped).bit_length() - 1
            assert flipped == (1 << bit)
            assert bit == int(np.argmin(np.abs(acts[n, t])))
