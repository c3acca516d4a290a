"""Checkpoint / resume on orbax.

The reference delegates checkpointing to `tf.train.Checkpoint` and needs
bespoke machinery to make TPU-embedding state checkpointable — stale
placeholder variables synced at save/restore, slot-variable creation hooks
for CPU/TPU interchange, dummy-variable stripping
(`tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:
940-957,994-1011,969-991`). None of that exists here: the entire training
state (params incl. sharded embedding tables, optimizer slots, metric
states, step) is one explicit pytree of (possibly sharded) `jax.Array`s,
so orbax serializes and re-shards it directly. CPU-built and TPU-built
checkpoints interchange by construction — restore simply targets whatever
shardings the running program uses.

Usage:

```python
mgr = CheckpointManager(directory, max_to_keep=3)
mgr.save(step, state)                       # async-capable save
state = mgr.restore(template=state)         # latest, sharded like template
state = mgr.restore(step=100, template=state)
```
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save", "restore"]


def _abstract_like(template: Any) -> Any:
    """Abstract pytree (shape/dtype/sharding) matching `template`.

    Works with concrete arrays (their shardings are preserved) so a
    freshly-initialized `TrainState` doubles as the restore target spec.
    """

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree_util.tree_map(leaf, template)


def save(path: str, state: Any) -> None:
    """One-off synchronous save of a state pytree to `path`."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(path, state, force=True)


def restore(path: str, template: Any) -> Any:
    """One-off restore from `path`, sharded/typed like `template`."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(path, _abstract_like(template))


class CheckpointManager:
    """Rolling checkpoint directory with retention and resume.

    A thin wrapper over `orbax.checkpoint.CheckpointManager` covering the
    reference's `tf.train.CheckpointManager` usage: numbered step
    checkpoints, `max_to_keep` retention, latest-step lookup.

    Attributes:
      directory: Checkpoint root directory (created if missing).
      max_to_keep: Retained checkpoints; older ones are deleted.
      save_interval_steps: If set, `save` becomes a no-op except every
        N steps (orbax's `should_save` policy).
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        save_interval_steps: Optional[int] = None,
    ) -> None:
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps or 1,
            enable_async_checkpointing=False,
        )
        self._manager = ocp.CheckpointManager(
            self.directory, options=options
        )

    def save(self, step: int, state: Any) -> bool:
        """Saves `state` under `step`; returns whether a save happened."""
        saved = self._manager.save(
            step, args=ocp.args.StandardSave(state)
        )
        self._manager.wait_until_finished()
        return saved

    def restore(
        self, template: Any, step: Optional[int] = None
    ) -> Any:
        """Restores the given (or latest) step, sharded like `template`."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"No checkpoints found under {self.directory}."
            )
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(_abstract_like(template))
        )

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def all_steps(self):
        return sorted(self._manager.all_steps())

    def close(self) -> None:
        self._manager.close()

    def __enter__(self) -> "CheckpointManager":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
