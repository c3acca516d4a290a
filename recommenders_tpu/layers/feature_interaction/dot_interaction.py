"""DLRM dot-product feature interaction.

Counterpart of `tfrs.layers.feature_interaction.DotInteraction`
(`tensorflow_recommenders/layers/feature_interaction/dot_interaction.py:22`).

TPU-first notes: the interaction is a single batched `[B, F, D] x [B, D, F]`
matmul on the MXU. The triangle extraction uses a *static* gather index
(computed at trace time from F) instead of the reference's `boolean_mask`,
which would imply dynamic shapes; `skip_gather=True` keeps the full `F×F`
matrix with the upper triangle zeroed, which is the layout-friendliest
option on TPU.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class DotInteraction(nn.Module):
    """All pairwise dot products between feature embeddings.

    Attributes:
      self_interaction: Include `dot(e_i, e_i)` diagonal terms.
      skip_gather: Skip the triangle gather; emit the full `F*F` matrix
        with the upper triangle zeroed (faster, larger output).
    """

    self_interaction: bool = False
    skip_gather: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Array:
        num_features = len(inputs)
        if any(x.shape != inputs[0].shape for x in inputs):
            raise ValueError(
                "Input tensors' dimensions must be equal, got shapes "
                f"{[x.shape for x in inputs]}."
            )
        batch_size = inputs[0].shape[0]
        # [B, F, D]
        features = jnp.stack(inputs, axis=1)
        # [B, F, F] pairwise dots — one batched MXU matmul.
        xactions = jnp.einsum(
            "bfd,bgd->bfg",
            features,
            features,
            preferred_element_type=jnp.float32,
        ).astype(inputs[0].dtype)

        if self.self_interaction:
            tri_rows, tri_cols = np.tril_indices(num_features, k=0)
            out_dim = num_features * (num_features + 1) // 2
        else:
            tri_rows, tri_cols = np.tril_indices(num_features, k=-1)
            out_dim = num_features * (num_features - 1) // 2

        if self.skip_gather:
            keep = np.zeros((num_features, num_features), dtype=bool)
            keep[tri_rows, tri_cols] = True
            activations = jnp.where(
                jnp.asarray(keep)[None, :, :], xactions, 0.0
            )
            return activations.reshape(batch_size, num_features * num_features)

        flat_idx = jnp.asarray(tri_rows * num_features + tri_cols)
        flat = xactions.reshape(batch_size, num_features * num_features)
        return jnp.take(flat, flat_idx, axis=1).reshape(batch_size, out_dim)
