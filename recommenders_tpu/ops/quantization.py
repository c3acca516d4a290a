"""Per-row int8 corpus quantization with optional anisotropic scales.

The math behind the reference's ScaNN `score_ah(...,
anisotropic_quantization_threshold)` path
(`tensorflow_recommenders/layers/factorized_top_k.py:688-707`; Guo et
al. 2020): quantization error PARALLEL to a datapoint perturbs the
inner-product scores of its high-scoring queries η times more than
orthogonal error, and for per-row scalar scales the anisotropic
objective has a closed form (see `quantize_rows`). Shared by the
ScaNN-style index (`layers/approximate.py`) and the quantized Bucketed
full-scan (`layers/factorized_top_k.Bucketed(quantize=True)`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def quantize_block(
    embs: Array,
    anisotropic_threshold: Optional[float],
    iterations: int = 3,
) -> Tuple[Array, Array]:
    """Quantizes `[..., D]` rows to (f32 scales, int8 codes) on device."""
    v = embs.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(v).max(axis=-1), 1e-12) / 127.0
    if anisotropic_threshold is None:
        codes = jnp.clip(
            jnp.round(v / scales[..., None]), -127, 127
        ).astype(jnp.int8)
        return scales, codes

    t = float(anisotropic_threshold)
    d = v.shape[-1]
    eta = max((d - 1) * t * t / max(1.0 - t * t, 1e-6), 1.0)
    norm2 = jnp.sum(jnp.square(v), axis=-1)
    s = scales
    codes = None
    for _ in range(iterations):
        codes = jnp.clip(jnp.round(v / s[..., None]), -127, 127)
        a = jnp.sum(v * codes, axis=-1)
        b = jnp.sum(jnp.square(codes), axis=-1)
        denom = (eta - 1.0) * jnp.square(a) / jnp.maximum(
            norm2, 1e-12
        ) + b
        s = jnp.where(
            (b > 0) & (norm2 > 0),
            eta * a / jnp.maximum(denom, 1e-12),
            s,
        )
        s = jnp.maximum(s, 1e-12)
    return s.astype(jnp.float32), codes.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("anisotropic_threshold", "iterations", "chunk")
)
def quantize_rows_device(
    embs: Array,
    anisotropic_threshold: Optional[float],
    iterations: int = 3,
    chunk: int = 1 << 20,
) -> Tuple[Array, Array]:
    """Device row quantization, processed in row blocks.

    Per-row quantization is independent across rows, so the f32
    intermediates (`v/s`, pre-clip codes) exist only at `[chunk, D]` —
    at 10M×128 the unblocked form transiently allocates >15 GB.
    """
    n, d = embs.shape
    if n <= chunk:
        return quantize_block(embs, anisotropic_threshold, iterations)
    scales = jnp.zeros((n,), jnp.float32)
    codes = jnp.zeros((n, d), jnp.int8)
    nfull = n // chunk

    def body(i, carry):
        s, c = carry
        block = jax.lax.dynamic_slice(embs, (i * chunk, 0), (chunk, d))
        bs, bc = quantize_block(block, anisotropic_threshold, iterations)
        return (
            jax.lax.dynamic_update_slice(s, bs, (i * chunk,)),
            jax.lax.dynamic_update_slice(c, bc, (i * chunk, 0)),
        )

    scales, codes = jax.lax.fori_loop(0, nfull, body, (scales, codes))
    if n % chunk:
        bs, bc = quantize_block(
            embs[nfull * chunk:], anisotropic_threshold, iterations
        )
        scales = scales.at[nfull * chunk:].set(bs)
        codes = codes.at[nfull * chunk:].set(bc)
    return scales, codes


def quantize_rows(
    embs: np.ndarray,
    anisotropic_threshold: Optional[float],
    iterations: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy twin of `quantize_rows_device` (host build paths).

    Plain mode (threshold None): abs-max scaling.

    Anisotropic mode: with code q, a = v·q, b = ‖q‖², c² = ‖v‖²,

        L(s) = (η−1)·(‖v‖ − s·a/‖v‖)² + ‖v‖² − 2sa + s²b
        s*   = η·a / ((η−1)·a²/c² + b)

    (η = 1 recovers the least-squares scale a/b). Alternating the code
    `q = round(v/s)` with s* converges in 2-3 iterations. η follows the
    ScaNN paper's threshold parameterization η = (d−1)·T²/(1−T²).
    """
    v = embs.astype(np.float32)
    scales = np.maximum(np.abs(v).max(axis=-1), 1e-12) / 127.0
    if anisotropic_threshold is None:
        codes = np.clip(
            np.round(v / scales[..., None]), -127, 127
        ).astype(np.int8)
        return scales, codes

    t = float(anisotropic_threshold)
    d = v.shape[-1]
    eta = max((d - 1) * t * t / max(1.0 - t * t, 1e-6), 1.0)
    norm2 = np.sum(np.square(v), axis=-1)
    s = scales
    codes = None
    for _ in range(iterations):
        codes = np.clip(np.round(v / s[..., None]), -127, 127)
        a = np.sum(v * codes, axis=-1)
        b = np.sum(np.square(codes), axis=-1)
        denom = (eta - 1.0) * np.square(a) / np.maximum(
            norm2, 1e-12
        ) + b
        s = np.where(
            (b > 0) & (norm2 > 0), eta * a / np.maximum(denom, 1e-12), s
        )
        s = np.maximum(s, 1e-12)
    return s.astype(np.float32), codes.astype(np.int8)
