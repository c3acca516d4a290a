"""DCN-v2 cross layer.

Counterpart of `tfrs.layers.feature_interaction.Cross`
(`tensorflow_recommenders/layers/feature_interaction/dcn.py:23`):
`x_{i+1} = x0 ⊙ (W·x + b + diag_scale·x) + x`, with optional low-rank
`W = U·V` factorization and preactivation. One fused elementwise epilogue
around a Dense matmul — XLA fuses the multiply/add chain into the matmul's
output, so this is a single MXU pass per layer.
"""

from typing import Optional

import flax.linen as nn
import jax

from recommenders_tpu.utils import activations as activations_lib

Array = jax.Array


class Cross(nn.Module):
    """Cross layer in Deep & Cross Network (DCN-v2).

    Attributes:
      projection_dim: If set, uses low-rank `W = U·V` with inner width
        `projection_dim` (U: `[d, p]`, V: `[p, d]`). Full-rank otherwise.
      diag_scale: Non-negative float added to W's diagonal
        (`W + diag_scale·I`) for training stability.
      use_bias: Whether the (V-side) dense layer has a bias.
      preactivation: Activation applied to `W·x + b` before the elementwise
        product with `x0`.
    """

    projection_dim: Optional[int] = None
    diag_scale: float = 0.0
    use_bias: bool = True
    preactivation: activations_lib.Activation = None
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.truncated_normal(stddev=0.05)
    )
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x0: Array, x: Optional[Array] = None) -> Array:
        if self.diag_scale < 0:
            raise ValueError(
                f"diag_scale must be >= 0; got {self.diag_scale}."
            )
        if x is None:
            x = x0
        if x0.shape[-1] != x.shape[-1]:
            raise ValueError(
                f"x0 and x must share their last dimension; got "
                f"{x0.shape[-1]} vs {x.shape[-1]}."
            )
        last_dim = x0.shape[-1]
        preact = activations_lib.get(self.preactivation)

        if self.projection_dim is None:
            prod_output = nn.Dense(
                last_dim,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                name="dense",
            )(x)
        else:
            u = nn.Dense(
                self.projection_dim,
                use_bias=False,
                kernel_init=self.kernel_init,
                name="dense_u",
            )(x)
            prod_output = nn.Dense(
                last_dim,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                name="dense_v",
            )(u)
        if preact is not None:
            prod_output = preact(prod_output)

        if self.diag_scale:
            prod_output = prod_output + self.diag_scale * x

        return x0 * prod_output + x


class MultiLayerDCN(nn.Module):
    """Stacked low-rank DCN block.

    Counterpart of `tfrs.layers.feature_interaction.MultiLayerDCN`
    (`feature_interaction/multi_layer_dcn.py:37`): `num_layers` low-rank
    cross layers applied with a shared input `x0`.

    Attributes:
      projection_dim: Low-rank inner width for every layer.
      num_layers: Number of stacked cross layers.
      use_bias: Whether V-side dense layers carry biases.
    """

    projection_dim: int = 1
    num_layers: int = 3
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.truncated_normal(stddev=0.05)
    )
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x0: Array) -> Array:
        xl = x0
        for i in range(self.num_layers):
            u = nn.Dense(
                self.projection_dim,
                use_bias=False,
                kernel_init=self.kernel_init,
                name=f"dense_u_{i}",
            )(xl)
            prod_output = nn.Dense(
                x0.shape[-1],
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                name=f"dense_v_{i}",
            )(u)
            xl = x0 * prod_output + xl
        return xl
