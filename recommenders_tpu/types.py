"""Common type aliases for recommenders_tpu.

TPU-native rebuild of the capability surface of tensorflow/recommenders
(reference: /root/reference/tensorflow_recommenders/types.py).
"""

from typing import Any, Callable, Dict, Mapping, Union

import jax

Array = jax.Array
PyTree = Any
Features = Mapping[str, Array]
MutableFeatures = Dict[str, Array]
Activation = Union[str, Callable[[Array], Array], None]
