"""Convenience blocks for building towers.

Counterpart of `tfrs.layers.blocks.MLP`
(`tensorflow_recommenders/layers/blocks.py:24`), as a flax module.
"""

from typing import Sequence

import flax.linen as nn
import jax

from recommenders_tpu.utils import activations as activations_lib

Array = jax.Array


class MLP(nn.Module):
    """Sequential multi-layer perceptron block.

    Attributes:
      units: Layer sizes; the last entry is the output width.
      use_bias: Whether layers include bias terms.
      activation: Activation for all but the last layer (string or callable).
      final_activation: Activation for the last layer.
    """

    units: Sequence[int]
    use_bias: bool = True
    activation: activations_lib.Activation = "relu"
    final_activation: activations_lib.Activation = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = activations_lib.get(self.activation)
        final_act = activations_lib.get(self.final_activation)
        for num_units in self.units[:-1]:
            x = nn.Dense(num_units, use_bias=self.use_bias)(x)
            if act is not None:
                x = act(x)
        x = nn.Dense(self.units[-1], use_bias=self.use_bias)(x)
        if final_act is not None:
            x = final_act(x)
        return x
