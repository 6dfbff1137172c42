"""Random-hyperplane hashing on the MXU.

The reference classifies one vector against one hyperplane at a time with a
SIMD dot product while walking a tree (``src/database/index/lsh.rs:39-43``,
``point_is_above``). Here the whole forest hashes in ONE batched matmul:

  acts[n, T, b]  = x @ planes^T + consts      (MXU)
  signs          = acts >= 0                  (VPU)
  codes[n, T]    = bit-pack of signs          (b <= 16 bits per table)

``multiprobe`` generates extra probe codes per (query, table) by flipping the
lowest-|margin| sign bits — the TPU-shaped analogue of the reference's
backtracking into the sibling subtree when a leaf underfills
(``lsh.rs:340-345``): small |activation| means the query sits close to that
hyperplane, so the opposite half-space is the most promising alternative
bucket.

Hyperplane sampling supports both Gaussian projections and the reference's
data-dependent scheme — each plane is the perpendicular bisector of two
sampled stored vectors (``lsh.rs:221-230``: coefficients = b - a, constant =
-dot(coefficients, midpoint(a, b))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_BITS = 16

# Static multiprobe perturbation schedule: subsets of the margin-sorted bit
# positions (0 = smallest |margin|), in a near-optimal order of expected
# success. Index 0 is the unperturbed code.
PROBE_SETS: tuple[tuple[int, ...], ...] = (
    (),
    (0,),
    (1,),
    (0, 1),
    (2,),
    (0, 2),
    (1, 2),
    (3,),
    (0, 1, 2),
    (0, 3),
    (1, 3),
    (4,),
    (0, 1, 3),
    (2, 3),
    (0, 4),
    (5,),
)
MAX_PROBES = len(PROBE_SETS)


def sample_planes_random(key: jax.Array, num_tables: int, bits: int, dim: int):
    """Gaussian hyperplanes through the origin.

    Returns:
      planes ``[T, b, D]`` float32, consts ``[T, b]`` float32 (zeros).
    """
    planes = jax.random.normal(key, (num_tables, bits, dim), dtype=jnp.float32)
    planes = planes / jnp.linalg.norm(planes, axis=-1, keepdims=True)
    return planes, jnp.zeros((num_tables, bits), dtype=jnp.float32)


def sample_planes_data(key: jax.Array, num_tables: int, bits: int, data: jnp.ndarray):
    """Data-dependent hyperplanes: perpendicular bisectors of random pairs.

    Reference scheme at ``lsh.rs:221-230``; ``data`` is ``[n, D]`` (n >= 2).
    Degenerate pairs (a == b) fall back to a Gaussian plane through the data
    midpoint so no bit is constant.
    """
    n, dim = data.shape
    k_pairs, k_fallback = jax.random.split(key)
    idx = jax.random.randint(k_pairs, (num_tables, bits, 2), 0, n)
    a = data[idx[..., 0]].astype(jnp.float32)  # [T, b, D]
    b = data[idx[..., 1]].astype(jnp.float32)
    coeff = b - a
    norm = jnp.linalg.norm(coeff, axis=-1, keepdims=True)
    fallback = jax.random.normal(k_fallback, coeff.shape, dtype=jnp.float32)
    fallback = fallback / jnp.linalg.norm(fallback, axis=-1, keepdims=True)
    coeff = jnp.where(norm > 1e-12, coeff / jnp.maximum(norm, 1e-30), fallback)
    mid = 0.5 * (a + b)
    consts = -jnp.sum(coeff * mid, axis=-1)  # [T, b]
    return coeff, consts


@jax.jit
def hash_activations(x: jnp.ndarray, planes: jnp.ndarray, consts: jnp.ndarray):
    """Signed distances of every vector to every hyperplane of every table.

    Args:
      x: ``[n, D]``; planes: ``[T, b, D]``; consts: ``[T, b]``.

    Returns:
      ``[n, T, b]`` float32 activations (sign = side of the hyperplane).
    """
    T, b, D = planes.shape
    flat = planes.reshape(T * b, D)
    acts = jnp.dot(x.astype(jnp.float32), flat.T, preferred_element_type=jnp.float32)
    return acts.reshape(x.shape[0], T, b) + consts[None]


@jax.jit
def pack_signs(acts: jnp.ndarray) -> jnp.ndarray:
    """Pack sign bits of ``[n, T, b]`` activations into ``[n, T]`` int32 codes."""
    b = acts.shape[-1]
    weights = (1 << jnp.arange(b, dtype=jnp.int32))[None, None, :]
    return jnp.sum((acts >= 0).astype(jnp.int32) * weights, axis=-1)


@jax.jit
def hash_codes(x: jnp.ndarray, planes: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """``[n, T]`` int32 bucket codes for vectors ``x``."""
    return pack_signs(hash_activations(x, planes, consts))


@functools.partial(jax.jit, static_argnames=("num_probes",))
def multiprobe(acts: jnp.ndarray, num_probes: int) -> jnp.ndarray:
    """Multi-probe codes per (query, table).

    Args:
      acts: ``[B, T, b]`` query activations.
      num_probes: probes per table (1..MAX_PROBES); probe 0 is the base code.

    Returns:
      ``[B, T, num_probes]`` int32 probe codes.
    """
    if not 1 <= num_probes <= MAX_PROBES:
        raise ValueError(f"num_probes must be in [1, {MAX_PROBES}]")
    codes = pack_signs(acts)  # [B, T]
    if num_probes == 1:
        return codes[..., None]
    b = acts.shape[-1]
    # bit indices sorted by |margin| ascending: order[..., j] = j-th closest bit
    order = jnp.argsort(jnp.abs(acts), axis=-1).astype(jnp.int32)  # [B, T, b]
    masks = []
    for s in PROBE_SETS[:num_probes]:
        m = jnp.zeros(codes.shape, dtype=jnp.int32)
        for j in s:
            if j < b:
                m = jnp.bitwise_or(m, jnp.left_shift(1, order[..., j]))
        masks.append(m)
    mask = jnp.stack(masks, axis=-1)  # [B, T, P]
    return jnp.bitwise_xor(codes[..., None], mask)
