"""Device hashing of slab rows (dedup support).

The reference deduplicates by hashing each vector's f32 bit patterns on the
host (``src/database/index/lsh.rs:270-288``). Reading a multi-GB slab back to
the host for that is the slow direction on a TPU box — instead the device
computes two independent 32-bit mixes per row (an effective 64-bit key,
~1e-7 collision odds at 10M rows) and ships only [S] x 8B. The host then
confirms *colliding groups only* by gathering those few rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mix32(x: jnp.ndarray, seed: int) -> jnp.ndarray:
    x = x ^ jnp.int32(seed)
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))
    x = x * jnp.int32(-2048144789)  # 0x85ebca6b
    x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 13))
    x = x * jnp.int32(-1028477387)  # 0xc2b2ae35
    return jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, 16))


@jax.jit
def row_hashes(vectors: jnp.ndarray) -> jnp.ndarray:
    """``[S, 2]`` int32: two independent bit-pattern hashes per slab row.

    Hashes the raw stored bits (bf16 slabs hash their bf16 patterns), with a
    column-position salt so permuted rows differ.
    """
    if vectors.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(vectors, jnp.int16).astype(jnp.int32)
    elif vectors.dtype == jnp.int8:
        # content hash of the raw codes; per-row scales are excluded, so
        # equal-code/different-scale rows collide — the caller confirms
        # colliding groups on DEQUANTISED values, which resolves them
        bits = vectors.astype(jnp.int32)
    else:
        bits = jax.lax.bitcast_convert_type(vectors.astype(jnp.float32), jnp.int32)
    col = jnp.arange(bits.shape[1], dtype=jnp.int32)[None, :]
    salted = bits + col * jnp.int32(-1640531527)  # 0x9e3779b9
    h1 = _mix32(salted, 0x243F6A88)
    h2 = _mix32(salted, 0x13198A2E)
    # XOR-fold along the feature axis (order-sensitive via the column salt)
    return jnp.stack(
        [
            jax.lax.reduce(h1, jnp.int32(0), jax.lax.bitwise_xor, (1,)),
            jax.lax.reduce(h2, jnp.int32(0), jax.lax.bitwise_xor, (1,)),
        ],
        axis=1,
    )
