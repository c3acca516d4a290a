"""Hybrid trainer: dense model via optax + embedding engine tables.

The production DLRM configuration in the reference: big embedding tables
on the TPU embedding engine (updated by its own sparse optimizer) while
the dense towers train through the normal optimizer
(`tensorflow_recommenders/experimental/models/ranking.py:238-257` exposes
the variable split; the engine applies embedding gradients inside the
custom-gradient trap, tpu_embedding_layer.py:837-845). Here the split is
explicit and functional: one jitted step computes gradients with respect
to BOTH the dense params and the embedding activations, applies optax to
the former and the engine's row-sparse update to the latter.

```python
class DenseModel(nn.Module):
    @nn.compact
    def __call__(self, batch, acts):
        x = jnp.concatenate([acts["user_id"], acts["item_id"]], -1)
        return ranking_task(batch["clicked"], MLP(x))

trainer = HybridTrainer(DenseModel(), engine, optax.adam(1e-3))
state = trainer.init(jax.random.PRNGKey(0), batch)
state, loss, aux = trainer.train_step(state, batch)
```

The dense model's `__call__(batch, activations)` returns a scalar loss or
`(loss, aux)`. Supports the engine's 1-step-stale pipelining via
`pipelined=True` (call `finalize` after the last step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import optax

from recommenders_tpu.embedding import engine as engine_lib
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridState:
    """Dense params/optimizer state + engine state (+ pending update)."""

    params: Any
    opt_state: Any
    engine_state: engine_lib.EngineState
    pending: Any  # None, or the 1-step-stale pending engine update.


class HybridTrainer:
    """One-step SPMD training over a dense module + an embedding engine.

    Attributes:
      model: Flax module with `__call__(batch, activations)`.
      engine: The `EmbeddingEngine` providing activations.
      optimizer: Optax transformation for the dense params.
      pipelined: Apply engine updates one step stale (overlapping the
        table scatter with the dense step, SparseCore-style).
    """

    def __init__(
        self,
        model: nn.Module,
        engine: engine_lib.EmbeddingEngine,
        optimizer: optax.GradientTransformation,
        pipelined: bool = False,
    ) -> None:
        self.model = model
        self.engine = engine
        self.optimizer = optimizer
        self.pipelined = pipelined
        self._step = None

    def _features(self, batch) -> Dict[str, Any]:
        return {
            fc.name: batch[fc.name]
            for fc in self.engine.feature_configs
        }

    def init(self, rng: Array, batch) -> HybridState:
        engine_rng, model_rng = jax.random.split(rng)
        engine_state = self.engine.init(engine_rng)
        acts = self.engine.lookup(engine_state, self._features(batch))
        params = self.model.init(model_rng, batch, acts)["params"]
        return HybridState(
            params=params,
            opt_state=self.optimizer.init(params),
            engine_state=engine_state,
            pending=None,
        )

    def _make_step(self, has_pending: bool):
        model, engine, optimizer = self.model, self.engine, self.optimizer
        pipelined = self.pipelined

        def step(state: HybridState, batch):
            features = {
                fc.name: batch[fc.name]
                for fc in engine.feature_configs
            }
            engine_state = state.engine_state
            # Gather from the pre-update tables so the pending scatter and
            # this step's forward pass are data-independent (XLA overlaps
            # them); lookups run one step stale, the
            # pipeline_execution_with_tensor_core trade.
            acts = engine.lookup(engine_state, features)
            if has_pending:
                engine_state = engine.update(
                    engine_state,
                    state.pending["features"],
                    state.pending["grads"],
                )

            def loss_fn(params, acts):
                out = model.apply({"params": params}, batch, acts)
                return out if isinstance(out, tuple) else (out, None)

            (loss, aux), (dgrads, agrads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, acts)

            updates, opt_state = optimizer.update(
                dgrads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)

            if pipelined:
                pending = {"features": features, "grads": agrads}
            else:
                engine_state = engine.update(
                    engine_state, features, agrads
                )
                pending = None
            return (
                HybridState(
                    params=params,
                    opt_state=opt_state,
                    engine_state=engine_state,
                    pending=pending,
                ),
                loss,
                aux,
            )

        return jax.jit(step, donate_argnums=(0,))

    def train_step(
        self, state: HybridState, batch
    ) -> Tuple[HybridState, Array, Any]:
        """Runs one step; returns `(state, loss, aux)`."""
        has_pending = state.pending is not None
        if self._step is None or self._has_pending != has_pending:
            self._step = self._make_step(has_pending)
            self._has_pending = has_pending
        return self._step(state, batch)

    def finalize(self, state: HybridState) -> HybridState:
        """Applies the last pending engine update (pipelined mode)."""
        if state.pending is None:
            return state
        engine_state = self.engine.update(
            state.engine_state,
            state.pending["features"],
            state.pending["grads"],
        )
        return dataclasses.replace(
            state, engine_state=engine_state, pending=None
        )

    def eval_loss(self, state: HybridState, batch) -> Tuple[Array, Any]:
        """Forward-only loss/aux on the current state."""
        acts = self.engine.lookup(
            state.engine_state, self._features(batch)
        )
        out = self.model.apply({"params": state.params}, batch, acts)
        return out if isinstance(out, tuple) else (out, None)
