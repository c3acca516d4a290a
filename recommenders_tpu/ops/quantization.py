"""Per-row int8/int4 corpus quantization with optional anisotropic scales.

The math behind the reference's ScaNN `score_ah(...,
anisotropic_quantization_threshold)` path
(`tensorflow_recommenders/layers/factorized_top_k.py:688-707`; Guo et
al. 2020): quantization error PARALLEL to a datapoint perturbs the
inner-product scores of its high-scoring queries η times more than
orthogonal error, and for per-row scalar scales the anisotropic
objective has a closed form (see `quantize_rows`). Shared by the
ScaNN-style index (`layers/approximate.py`) and the quantized Bucketed
full-scan (`layers/factorized_top_k.Bucketed(quantize=True)`).

`bits=4` is the TPU-native counterpart of ScaNN's 4-bit asymmetric
hashing stage (`score_ah(2)`): where the CPU library scores LUT16
codebooks with PSHUFB shuffles, a TPU has no fast in-register gather —
but it has an MXU, so the profitable 4-bit design is scalar int4 codes
decoded with two bitwise ops and scored by matmul. Two codes pack per
byte along the ROW axis (row `c` in the low nibble, row `c + n/2` in
the high nibble — see `pack_nibbles`): the two decoded halves then
concatenate along the lane axis in natural slot order, so the kernels
never pay for a lane interleave. Like AH, scoring stays asymmetric
(queries remain f32); the recall loss vs int8 is recovered by the
exact reorder pass, which is ScaNN's production recipe.
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
    bits: int = 8,
) -> Tuple[Array, Array]:
    """Quantizes `[..., D]` rows to (f32 scales, int8-stored codes).

    `bits=8` clips codes to ±127; `bits=4` to ±7 (callers pack pairs of
    4-bit codes per byte with `pack_nibbles` for storage/scan).
    """
    qmax = {8: 127.0, 4: 7.0}[bits]
    v = embs.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(v).max(axis=-1), 1e-12) / qmax
    if anisotropic_threshold is None:
        codes = jnp.clip(
            jnp.round(v / scales[..., None]), -qmax, qmax
        ).astype(jnp.int8)
        return scales, codes

    t = float(anisotropic_threshold)
    d = v.shape[-1]
    eta = max((d - 1) * t * t / max(1.0 - t * t, 1e-6), 1.0)
    norm2 = jnp.sum(jnp.square(v), axis=-1)
    s = scales
    codes = None
    for _ in range(iterations):
        codes = jnp.clip(jnp.round(v / s[..., None]), -qmax, qmax)
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
    jax.jit,
    static_argnames=("anisotropic_threshold", "iterations", "chunk", "bits"),
)
def quantize_rows_device(
    embs: Array,
    anisotropic_threshold: Optional[float],
    iterations: int = 3,
    chunk: int = 1 << 20,
    bits: int = 8,
) -> Tuple[Array, Array]:
    """Device row quantization, processed in row blocks.

    Per-row quantization is independent across rows, so the f32
    intermediates (`v/s`, pre-clip codes) exist only at `[chunk, D]` —
    at 10M×128 the unblocked form transiently allocates >15 GB.
    """
    n, d = embs.shape
    if n <= chunk:
        return quantize_block(embs, anisotropic_threshold, iterations, bits)
    scales = jnp.zeros((n,), jnp.float32)
    codes = jnp.zeros((n, d), jnp.int8)
    nfull = n // chunk

    def body(i, carry):
        s, c = carry
        block = jax.lax.dynamic_slice(embs, (i * chunk, 0), (chunk, d))
        bs, bc = quantize_block(block, anisotropic_threshold, iterations, bits)
        return (
            jax.lax.dynamic_update_slice(s, bs, (i * chunk,)),
            jax.lax.dynamic_update_slice(c, bc, (i * chunk, 0)),
        )

    scales, codes = jax.lax.fori_loop(0, nfull, body, (scales, codes))
    if n % chunk:
        bs, bc = quantize_block(
            embs[nfull * chunk:], anisotropic_threshold, iterations, bits
        )
        scales = scales.at[nfull * chunk:].set(bs)
        codes = codes.at[nfull * chunk:].set(bc)
    return scales, codes


@jax.jit
def pack_nibbles(codes: Array) -> Array:
    """Packs 4-bit codes two-per-byte along the leading (row) axis.

    `codes`: `[..., n, d]` int8 with values in [-8, 7], `n` even. Byte
    `(c, d)` of the result holds row `c`'s code in its LOW nibble and
    row `c + n/2`'s in its HIGH nibble — pairing across the row axis at
    stride n/2 (not adjacent rows) so a decoded block's two halves are
    each CONTIGUOUS row ranges: kernels score lo/hi separately and
    concatenate along lanes in natural slot order, never paying for a
    sublane interleave.

    Built in int32: `(lo & 15) | (hi << 4)` stays in [-128, 127] (the
    OR of a negative sign-extended high nibble with a 4-bit low field
    is the exact two's-complement byte), so the int8 cast is exact.
    """
    n = codes.shape[-2]
    if n % 2:
        raise ValueError(f"pack_nibbles needs an even row count, got {n}")
    half = n // 2
    lo = codes[..., :half, :].astype(jnp.int32)
    hi = codes[..., half:, :].astype(jnp.int32)
    return ((lo & 15) | (hi << 4)).astype(jnp.int8)


@jax.jit
def unpack_nibbles(packed: Array) -> Array:
    """Inverse of `pack_nibbles`: `[..., n/2, d]` int8 → `[..., n, d]`.

    Low nibbles sign-extend via `(p << 28) >> 28` in int32, high via an
    arithmetic `>> 4` — the same two-op decode the Pallas kernels run
    in VMEM.
    """
    p = packed.astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_rows(
    embs: np.ndarray,
    anisotropic_threshold: Optional[float],
    iterations: int = 3,
    bits: int = 8,
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
    qmax = {8: 127.0, 4: 7.0}[bits]
    v = embs.astype(np.float32)
    scales = np.maximum(np.abs(v).max(axis=-1), 1e-12) / qmax
    if anisotropic_threshold is None:
        codes = np.clip(
            np.round(v / scales[..., None]), -qmax, qmax
        ).astype(np.int8)
        return scales, codes

    t = float(anisotropic_threshold)
    d = v.shape[-1]
    eta = max((d - 1) * t * t / max(1.0 - t * t, 1e-6), 1.0)
    norm2 = np.sum(np.square(v), axis=-1)
    s = scales
    codes = None
    for _ in range(iterations):
        codes = np.clip(np.round(v / s[..., None]), -qmax, qmax)
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
