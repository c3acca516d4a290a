"""String → activation resolution (Keras-style ergonomics)."""

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Activation = Union[str, Callable[[Array], Array], None]

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "softmax": jax.nn.softmax,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "linear": lambda x: x,
}


def get(activation: Activation) -> Optional[Callable[[Array], Array]]:
    """Resolves an activation spec to a callable (or None for identity)."""
    if activation is None:
        return None
    if callable(activation):
        return activation
    try:
        return _ACTIVATIONS[activation]
    except KeyError:
        raise ValueError(
            f"Unknown activation {activation!r}. "
            f"Known: {sorted(_ACTIVATIONS)}"
        ) from None
