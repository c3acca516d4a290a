"""Deterministic salted integer hashing for feature bucketing.

Replaces the reference's use of `tf.keras.layers.Hashing` with salts
(`tensorflow_recommenders/layers/feature_multiplexing/unified_embedding.py:
186-215`). The hash is a murmur3-style 32-bit avalanche mix with two salt
injections — stateless, vectorized, trivially jittable, and identical on
CPU and TPU.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def _mix32(h: Array) -> Array:
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hash_bucket(
    ids: Array,
    num_bins: int,
    salt: Union[int, Sequence[int]] = (0, 0),
) -> Array:
    """Hashes integer ids into `[0, num_bins)` with the given salt(s).

    Args:
      ids: Integer array of any shape.
      num_bins: Number of hash buckets.
      salt: One or two integers; different salts give independent hashes.

    Returns:
      int32 array of bucket ids, same shape as `ids`.
    """
    if isinstance(salt, int):
        salt = (salt, 0)
    s0, s1 = (int(s) for s in salt)
    h = ids.astype(jnp.uint32)
    h = _mix32(h ^ jnp.uint32((s0 * 0x9E3779B9 + 0x7F4A7C15) & 0xFFFFFFFF))
    h = _mix32(h ^ jnp.uint32((s1 * 0x85EBCA6B + 0x165667B1) & 0xFFFFFFFF))
    return (h % jnp.uint32(num_bins)).astype(jnp.int32)
