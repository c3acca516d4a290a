"""Convenience blocks for building towers.

Counterpart of `tfrs.layers.blocks.MLP`
(`tensorflow_recommenders/layers/blocks.py:24`), as a flax module.
"""

from typing import Callable, Optional, Sequence

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
      kernel_init: Optional weight initializer for every layer (the
        reference's Keras `Dense` exposes `kernel_initializer`, default
        glorot_uniform; flax's default is lecun_normal — pass
        `nn.initializers.glorot_uniform()` for init-matched
        comparisons, as tools/reference_parity_ctr.py does).
    """

    units: Sequence[int]
    use_bias: bool = True
    activation: activations_lib.Activation = "relu"
    final_activation: activations_lib.Activation = None
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = activations_lib.get(self.activation)
        final_act = activations_lib.get(self.final_activation)
        kw = (
            {} if self.kernel_init is None
            else {"kernel_init": self.kernel_init}
        )
        for num_units in self.units[:-1]:
            x = nn.Dense(num_units, use_bias=self.use_bias, **kw)(x)
            if act is not None:
                x = act(x)
        x = nn.Dense(self.units[-1], use_bias=self.use_bias, **kw)(x)
        if final_act is not None:
            x = final_act(x)
        return x
