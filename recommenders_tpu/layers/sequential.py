"""Sequence encoders for sequential retrieval towers.

The reference's sequential-retrieval tutorial encodes a length-10 watch
history with a Keras GRU (`/root/reference/docs/examples/
sequential_retrieval.ipynb`). These are the TPU-native building blocks for
that model family:

  - `GRUEncoder`: masked GRU over `[B, L, D]` inputs via `nn.scan` (an
    XLA `lax.scan`, compiled once — no Python unrolling), returning the
    final hidden state. Padded positions hold the carry, so ragged
    histories in fixed `[B, L]` buffers encode correctly.
  - `SelfAttentionEncoder`: a small pre-LN transformer block (MHA + FFN)
    with masked mean pooling — the attention alternative named in the
    benchmark config ("GRU/attention user tower", BASELINE.md config 4).
    All ops are batched matmuls on the MXU; no recurrence.

Both take a boolean validity mask (True = real position), matching the
`PAD_ID` convention of the embedding layers.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GRUEncoder(nn.Module):
    """Masked GRU encoder: `[B, L, D] → [B, units]` (final state).

    Attributes:
      units: Hidden width.
    """

    units: int

    @nn.compact
    def __call__(self, inputs: Array, mask: Optional[Array] = None) -> Array:
        if inputs.ndim != 3:
            raise ValueError(
                f"GRUEncoder expects [B, L, D] inputs, got {inputs.shape}."
            )
        batch = inputs.shape[0]
        if mask is None:
            mask = jnp.ones(inputs.shape[:2], bool)

        class _Step(nn.Module):
            units: int

            @nn.compact
            def __call__(self, carry, xs):
                x, valid = xs
                new_carry, _ = nn.GRUCell(features=self.units)(carry, x)
                # Padded steps pass the carry through unchanged.
                carry = jnp.where(valid[:, None], new_carry, carry)
                return carry, ()

        scan = nn.scan(
            _Step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        init_carry = jnp.zeros((batch, self.units), inputs.dtype)
        final_carry, _ = scan(units=self.units)(init_carry, (inputs, mask))
        return final_carry


class SelfAttentionEncoder(nn.Module):
    """One pre-LN transformer block + masked mean pooling:
    `[B, L, D] → [B, out_dim]`.

    Attributes:
      num_heads: Attention heads.
      mlp_dim: FFN inner width; defaults to `4 × D`.
      out_dim: Output width; defaults to `D`.
    """

    num_heads: int = 4
    mlp_dim: Optional[int] = None
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inputs: Array, mask: Optional[Array] = None) -> Array:
        if inputs.ndim != 3:
            raise ValueError(
                f"SelfAttentionEncoder expects [B, L, D] inputs, got "
                f"{inputs.shape}."
            )
        b, l, d = inputs.shape
        if mask is None:
            mask = jnp.ones((b, l), bool)
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]

        x = inputs
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d
        )(y, y, mask=attn_mask)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.mlp_dim or 4 * d)(y)
        y = nn.relu(y)
        y = nn.Dense(d)(y)
        x = x + y

        # Masked mean pool over valid positions.
        w = mask.astype(x.dtype)[..., None]
        pooled = jnp.sum(x * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1e-12
        )
        out_dim = self.out_dim or d
        if out_dim != d:
            pooled = nn.Dense(out_dim)(pooled)
        return pooled
