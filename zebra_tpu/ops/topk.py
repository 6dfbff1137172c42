"""Masked top-k and partial top-k merging.

The reference unions candidate sets in a DashSet and parallel-sorts the full
list per query (``src/database/index/lsh.rs:557-564``). The TPU analogue keeps
a fixed-size running top-k: invalid entries are masked to +inf, selection is
``lax.top_k`` on negated distances, and partial results (per candidate chunk
or per mesh shard) merge by concatenation + re-selection — which is exactly
the associative combiner an ICI all-gather merge needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: Sentinel distance for masked-out candidates.
INF = np.float32(np.inf)  # np scalar: jnp module constants live on the
#  device and every jit LOWERING fetches their value back over the (slow)
#  tunnel via ir_constant — measured minutes per compile on this box


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk(dists: jnp.ndarray, valid: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Smallest-k selection under a validity mask.

    Args:
      dists: ``[B, C]`` distances (may contain NaN/inf in masked slots).
      valid: ``[B, C]`` bool.
      ids:   ``[B, C]`` int32 payload ids (e.g. slab slots), -1 when invalid.
      k:     static selection width.

    Returns:
      ``(top_dists [B, k], top_ids [B, k], top_valid [B, k])``; invalid tail
      entries have distance +inf and id -1.
    """
    d = jnp.where(valid, dists, INF)
    d = jnp.where(jnp.isnan(d), INF, d)
    neg_top, idx = jax.lax.top_k(-d, k)
    top_d = -neg_top
    top_i = jnp.take_along_axis(ids, idx, axis=1)
    top_v = jnp.take_along_axis(valid, idx, axis=1)
    top_i = jnp.where(top_v, top_i, -1)
    return top_d, top_i, top_v


@functools.partial(jax.jit, static_argnames=("k",))
def merge_topk(d_a, i_a, v_a, d_b, i_b, v_b, k: int):
    """Merge two partial top-k results (associative, commutative up to ties)."""
    d = jnp.concatenate([d_a, d_b], axis=1)
    i = jnp.concatenate([i_a, i_b], axis=1)
    v = jnp.concatenate([v_a, v_b], axis=1)
    return masked_topk(d, v, i, k)
