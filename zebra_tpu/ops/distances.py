"""Batched distance metrics.

TPU-native rebuild of the reference's per-pair scalar metrics
(``src/distance.rs:15-190``): every metric here is *batched* — ``pairwise``
computes a full ``[Q, C]`` distance matrix (cosine / L2 / L2² ride the MXU via
the Gram-matrix expansion; the reference takes a simsimd SIMD fast path for
exactly those three, ``distance.rs:21-31,40-48,105-113``), and ``rowwise``
computes per-row candidate distances ``[B, C]`` for re-ranking.

The reference encodes distances as ``u64 = f32::to_bits`` purely to get a total
order for sorting (``distance.rs:13``); on TPU we sort f32 directly (NaNs are
masked out before top-k), so distances stay plain ``float32``.

Metric names (12, superset-compatible with the reference's structs):
cosine, l2, sql2, chebyshev, canberra, braycurtis, manhattan, l3, l4,
hamming, minkowski(power), p_norm(power).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

# Metrics whose pairwise form is a single MXU matmul (Gram expansion).
MXU_METRICS = ("cosine", "sql2", "l2")

_EPS = 1e-30


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Elementwise-difference reductions (VPU). `diff` has shape [..., C, D] from
# broadcasting; each returns [..., C].
# ---------------------------------------------------------------------------


def _chebyshev(a, b):
    return jnp.max(jnp.abs(a - b), axis=-1)


def _canberra(a, b):
    # sum |a-b| / (|a| + |b|), terms with zero denominator contribute 0
    # (reference: `distances::vectors::canberra`, distance.rs:67-73).
    num = jnp.abs(a - b)
    den = jnp.abs(a) + jnp.abs(b)
    return jnp.sum(jnp.where(den > 0, num / jnp.maximum(den, _EPS), 0.0), axis=-1)


def _braycurtis(a, b):
    # sum |a-b| / sum |a+b| (reference distance.rs:79-85).
    num = jnp.sum(jnp.abs(a - b), axis=-1)
    den = jnp.sum(jnp.abs(a + b), axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, _EPS), 0.0)


def _manhattan(a, b):
    return jnp.sum(jnp.abs(a - b), axis=-1)


def _l3(a, b):
    d = jnp.abs(a - b)
    return jnp.cbrt(jnp.sum(d * d * d, axis=-1))


def _l4(a, b):
    d = a - b
    d2 = d * d
    return jnp.sqrt(jnp.sqrt(jnp.sum(d2 * d2, axis=-1)))


def _minkowski(a, b, power: float):
    d = jnp.abs(a - b)
    return jnp.power(jnp.sum(jnp.power(d, power), axis=-1), 1.0 / power)


def _p_norm(a, b, power: float):
    # reference `minkowski_p`: sum |a-b|^p WITHOUT the 1/p root
    # (distance.rs:183-189).
    d = jnp.abs(a - b)
    return jnp.sum(jnp.power(d, power), axis=-1)


def _hamming(a, b):
    # Reference semantics (distance.rs:146-157): truncate each f32's bit
    # pattern to its LOW BYTE, then bitwise-popcount the XOR of the byte
    # strings. Faithfully reproduced: popcount((bits(a) ^ bits(b)) & 0xFF).
    ab = jax.lax.bitcast_convert_type(_f32(a), jnp.int32)
    bb = jax.lax.bitcast_convert_type(_f32(b), jnp.int32)
    x = jnp.bitwise_and(jnp.bitwise_xor(ab, bb), 0xFF)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)


def _elementwise_pairwise(fn, q, x, **kw):
    # q: [Q, D], x: [C, D] -> [Q, C]
    return fn(q[:, None, :], x[None, :, :], **kw)


def _elementwise_rowwise(fn, q, x, **kw):
    # q: [B, D], x: [B, C, D] -> [B, C]
    return fn(q[:, None, :], x, **kw)


# ---------------------------------------------------------------------------
# MXU (Gram-expansion) metrics.
# ---------------------------------------------------------------------------


# Exact re-rank needs true f32 dots: the platform's DEFAULT matmul precision
# may run bf16 passes (fine for hash sign bits, ~0.5% error is not fine for
# distances near ties). HIGHEST forces full-f32 accumulation on the MXU; the
# "default" tier trades ~0.5% distance error for ~6x matmul throughput (flat
# scans are compute-bound at scale).
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _resolve_precision(precision: str):
    try:
        return _PRECISIONS[precision]
    except KeyError:
        raise ValueError(
            f"unknown matmul precision {precision!r}; choose from {sorted(_PRECISIONS)}"
        ) from None


def _dot_pairwise(q, x, precision="highest"):
    return jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                   precision=_resolve_precision(precision))


def _dot_rowwise(q, x, precision="highest"):
    return jnp.einsum("bd,bcd->bc", q, x, preferred_element_type=jnp.float32,
                      precision=_resolve_precision(precision))


def _sq_norms(v, axis=-1):
    return jnp.sum(_f32(v) * _f32(v), axis=axis)


def _cosine_from_parts(dot, qn2, xn2):
    den = jnp.sqrt(jnp.maximum(qn2, 0.0)) * jnp.sqrt(jnp.maximum(xn2, 0.0))
    sim = jnp.where(den > 0, dot / jnp.maximum(den, _EPS), 0.0)
    # zero-norm operand => similarity 0 => distance 1 (reference's SIMD path
    # yields NaN->fallback; we define it totally).
    return 1.0 - sim


def _sql2_from_parts(dot, qn2, xn2):
    return jnp.maximum(qn2 + xn2 - 2.0 * dot, 0.0)


def _mxu_pairwise(name, q, x, precision="highest"):
    q32, x32 = _f32(q), _f32(x)
    dot = _dot_pairwise(q32, x32, precision)
    qn2 = _sq_norms(q32)[:, None]
    xn2 = _sq_norms(x32)[None, :]
    if name == "cosine":
        return _cosine_from_parts(dot, qn2, xn2)
    d2 = _sql2_from_parts(dot, qn2, xn2)
    return d2 if name == "sql2" else jnp.sqrt(d2)


def _mxu_rowwise(name, q, x, precision="highest"):
    q32, x32 = _f32(q), _f32(x)
    dot = _dot_rowwise(q32, x32, precision)
    qn2 = _sq_norms(q32)[:, None]
    xn2 = _sq_norms(x32)
    if name == "cosine":
        return _cosine_from_parts(dot, qn2, xn2)
    d2 = _sql2_from_parts(dot, qn2, xn2)
    return d2 if name == "sql2" else jnp.sqrt(d2)


_ELEMENTWISE: dict[str, Callable] = {
    "chebyshev": _chebyshev,
    "canberra": _canberra,
    "braycurtis": _braycurtis,
    "manhattan": _manhattan,
    "l3": _l3,
    "l4": _l4,
    "hamming": _hamming,
}

def mxu_from_parts(metric: str, dot, qn2, xn2):
    """Distance from precomputed parts: ``dot`` [..., C], squared query norms
    ``qn2`` (broadcastable) and squared candidate norms ``xn2``. Lets callers
    that store per-vector norms (the index slab) gather only dots."""
    if metric == "cosine":
        return _cosine_from_parts(dot, qn2, xn2)
    d2 = _sql2_from_parts(dot, qn2, xn2)
    return d2 if metric == "sql2" else jnp.sqrt(d2)


def mxu_invert_parts(metric: str, d, qn2, xn2):
    """Inverse of :func:`mxu_from_parts`: recover the dot from a distance.

    Every MXU metric is an invertible function of (dot, qn2, xn2):
    cosine ``d = 1 - dot/(|q||x|)``, sql2 ``d = qn2 + xn2 - 2 dot``,
    l2 the sqrt of sql2. This lets a *refinement* pass reuse the coarse
    scan's distances instead of re-gathering the coarse rows and re-issuing
    the hi dot: ``dot_full = invert(d_coarse) + correction`` (the int8
    residual path — see index/ivf._refine_topk). Round-trip noise is the
    rsqrt/sqrt rounding (~1e-6 relative), far below the ~1e-4 rank-gap
    scale the refinement targets.

    Zero-norm rows: the forward map pins ``d`` (cosine 1.0), and the
    inverse returns dot 0 — consistent."""
    if metric == "cosine":
        return (1.0 - d) * jnp.sqrt(jnp.maximum(qn2 * xn2, 0.0))
    d2 = d * d if metric == "l2" else d
    return 0.5 * (qn2 + xn2 - d2)


_POWERED = ("minkowski", "p_norm")

#: All supported metric names.
METRICS = tuple(MXU_METRICS) + tuple(_ELEMENTWISE) + _POWERED


def _check(name: str) -> None:
    if name not in METRICS:
        raise ValueError(f"unknown metric {name!r}; choose from {METRICS}")


@functools.partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise(q: jnp.ndarray, x: jnp.ndarray, metric: str = "cosine", power: float = 3.0,
             precision: str = "highest"):
    """Full distance matrix between query rows and candidate rows.

    Args:
      q: ``[Q, D]`` queries.
      x: ``[C, D]`` candidates.
      metric: one of :data:`METRICS`.
      power: exponent for ``minkowski`` / ``p_norm``.

    Returns:
      ``[Q, C]`` float32 distances.
    """
    _check(metric)
    if metric in MXU_METRICS:
        return _mxu_pairwise(metric, q, x, precision)
    if metric == "minkowski":
        return _elementwise_pairwise(_minkowski, _f32(q), _f32(x), power=power)
    if metric == "p_norm":
        return _elementwise_pairwise(_p_norm, _f32(q), _f32(x), power=power)
    return _elementwise_pairwise(_ELEMENTWISE[metric], _f32(q), _f32(x))


@functools.partial(jax.jit, static_argnames=("metric", "precision"))
def rowwise(q: jnp.ndarray, x: jnp.ndarray, metric: str = "cosine", power: float = 3.0,
            precision: str = "highest"):
    """Per-row candidate distances (re-rank workhorse).

    Args:
      q: ``[B, D]`` queries.
      x: ``[B, C, D]`` per-query candidate vectors.

    Returns:
      ``[B, C]`` float32 distances.
    """
    _check(metric)
    if metric in MXU_METRICS:
        return _mxu_rowwise(metric, q, x, precision)
    if metric == "minkowski":
        return _elementwise_rowwise(_minkowski, _f32(q), _f32(x), power=power)
    if metric == "p_norm":
        return _elementwise_rowwise(_p_norm, _f32(q), _f32(x), power=power)
    return _elementwise_rowwise(_ELEMENTWISE[metric], _f32(q), _f32(x))
