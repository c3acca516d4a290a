"""Composite optimizer: different optimizers for disjoint parameter subsets.

Counterpart of the reference's `CompositeOptimizer`
(`tensorflow_recommenders/experimental/optimizers/composite_optimizer.py:25`),
built on `optax.multi_transform`. Partitions are expressed as predicates
over parameter tree paths (e.g. "everything under 'embedding'") instead of
variable-list callables; the same disjointness and full-coverage
validations are enforced (composite_optimizer.py:75-90) at init time.

Typical sparse/dense split for a ranking model:

```python
opt = composite_optimizer([
    (clippy_adagrad(0.05), path_contains("embedding")),
    (optax.adam(1e-3), lambda path: True),      # everything else
])
```

Predicates are checked in order; the first match wins, and it is an error
for a parameter to match none.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import optax

PathPredicate = Callable[[Tuple[str, ...]], bool]


def path_contains(*names: str) -> PathPredicate:
    """Predicate: any path component equals (or contains) one of `names`."""

    def pred(path: Tuple[str, ...]) -> bool:
        return any(
            any(n in part for n in names) for part in path
        )

    return pred


def _path_to_strs(path) -> Tuple[str, ...]:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return tuple(parts)


def composite_optimizer(
    optimizers_and_predicates: Sequence[
        Tuple[optax.GradientTransformation, PathPredicate]
    ],
    example_params=None,
) -> optax.GradientTransformation:
    """Combines optimizers, routing each parameter to the first matching one.

    Args:
      optimizers_and_predicates: Sequence of `(optimizer, predicate)` pairs.
        `predicate` takes the parameter's tree path (tuple of strings) and
        returns True if that optimizer should handle the parameter.
      example_params: Optional parameter pytree used to validate coverage
        eagerly (otherwise validation happens at `init`).

    Returns:
      An `optax.GradientTransformation`.

    Raises:
      ValueError: If `optimizers_and_predicates` is empty, or (at labeling
        time) some parameter matches no predicate.
    """
    if not optimizers_and_predicates:
        raise ValueError("`optimizers_and_predicates` can't be empty")

    transforms = {
        i: opt for i, (opt, _) in enumerate(optimizers_and_predicates)
    }
    predicates = [pred for _, pred in optimizers_and_predicates]

    def label_params(params):
        def label_one(path, _leaf):
            str_path = _path_to_strs(path)
            for i, pred in enumerate(predicates):
                if pred(str_path):
                    return i
            raise ValueError(
                f"Parameter at path {'/'.join(str_path)} is not handled by "
                "any optimizer. This would cause it to be not trained."
            )

        return jax.tree_util.tree_map_with_path(label_one, params)

    if example_params is not None:
        label_params(example_params)  # Eager coverage validation.

    return optax.multi_transform(transforms, label_params)
