"""Base model + training engine: the Keras-fit replacement.

The reference's `tfrs.Model` (`tensorflow_recommenders/models/base.py:21`)
asks users for one method — `compute_loss` — and derives `train_step` /
`test_step` from it, reporting loss / regularization_loss / total_loss.
This module is the TPU-native equivalent:

  - `Model`: a flax module whose subclasses implement
    `compute_loss(batch, training)` returning a scalar loss or
    `(loss, aux)`; optional `regularization_loss()` (inside module scope)
    and pure `metrics()` / `update_metrics(states, batch, aux)` hooks for
    streaming metrics.
  - `Trainer`: owns the optimizer and the jitted SPMD train/eval steps.
    The step is a pure function `(state, batch) -> (state, logs)` compiled
    once with `jax.jit` over a `Mesh`; data parallelism comes from batch
    shardings, model parallelism from `nn.Partitioned` metadata on params
    (the embedding engine annotates its tables; XLA inserts the
    collectives). There is no Keras-style callback machinery — `fit` is a
    thin Python loop around the compiled step.

Key departures from the reference, by design:
  - no GradientTape: `jax.value_and_grad` over the pure loss;
  - no strategy objects: the mesh + shardings are the strategy;
  - no metric variables: metric states are explicit pytree fields of
    `TrainState`, updated inside the jitted step.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Mapping, Optional, Tuple, Union

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from recommenders_tpu.metrics import base as metrics_base
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array
Batch = Any
Aux = Dict[str, Any]


class Model(nn.Module):
    """Base class for recommender models.

    Subclasses implement `compute_loss`. Minimal two-tower example:

    ```python
    class MovielensModel(rtpu.models.Model):
        num_users: int
        num_movies: int
        dim: int = 64

        def setup(self):
            self.user_emb = nn.Embed(self.num_users, self.dim)
            self.movie_emb = nn.Embed(self.num_movies, self.dim)
            self.task = rtpu.tasks.Retrieval()

        def compute_loss(self, batch, training=False):
            q = self.user_emb(batch["user_id"])
            c = self.movie_emb(batch["movie_id"])
            out = self.task(q, c)
            return out.loss, {"retrieval": out}
    ```
    """

    def compute_loss(
        self, batch: Batch, training: bool = False
    ) -> Union[Array, Tuple[Array, Aux]]:
        """Defines the loss. Runs inside module scope (self is bound)."""
        raise NotImplementedError()

    def regularization_loss(self) -> Array:
        """Optional additional loss (e.g. L2 on embeddings). Runs in scope."""
        return jnp.zeros(())

    # --- Metric hooks (pure; no parameter access) -------------------------

    def metrics(self) -> Dict[str, metrics_base.Metric]:
        """Declares streaming metrics updated each step."""
        return {}

    def update_metrics(
        self,
        states: Dict[str, Any],
        batch: Batch,
        aux: Aux,
    ) -> Dict[str, Any]:
        """Returns new metric states given the step's aux outputs."""
        return states


@flax.struct.dataclass
class TrainState:
    """All mutable training state, as one pytree."""

    step: Array
    params: Any
    opt_state: Any
    metric_states: Any
    loss_states: Any  # Streaming means of loss/regularization/total loss.
    # PRNG key split fresh every step and handed to the model as the
    # "dropout" and "sampling" rng streams (stochastic layers / negative
    # sampling inside compute_loss).
    rng: Optional[Array] = None


_LOSS_METRICS = ("loss", "regularization_loss", "total_loss")


@dataclasses.dataclass
class Trainer:
    """Compiles and drives SPMD train/eval steps for a `Model`.

    Attributes:
      model: The model.
      optimizer: An optax gradient transformation.
      mesh: Device mesh; defaults to all local devices on the data axis.
      data_axis: Mesh axis name for batch sharding.
    """

    model: Model
    optimizer: optax.GradientTransformation
    mesh: Optional[jax.sharding.Mesh] = None
    data_axis: str = mesh_lib.DATA_AXIS
    # Metric/loss-state accumulation inside the jitted step. Disabling it
    # shrinks the train-state pytree (every extra leaf adds per-dispatch
    # overhead) for throughput-critical loops; `fit` then reports loss
    # from the step's return value only.
    track_stats: bool = True

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = mesh_lib.local_data_parallel_mesh()
        self._mean = metrics_base.Mean()
        self._train_step = None
        self._eval_step = None
        self._param_shardings = None

    # --- Initialization ---------------------------------------------------

    def init(self, rng: Array, sample_batch: Batch) -> TrainState:
        """Initializes params (sharded per their partitioning metadata)."""
        rng, step_rng = jax.random.split(rng)
        abstract = jax.eval_shape(
            lambda: self.model.init(
                rng, sample_batch, training=True, method="compute_loss"
            )
        )
        pspecs = nn.get_partition_spec(abstract)
        param_shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec),
            pspecs["params"],
            is_leaf=lambda x: isinstance(x, P),
        )

        def init_fn():
            variables = self.model.init(
                rng, sample_batch, training=True, method="compute_loss"
            )
            return nn.meta.unbox(variables["params"])

        params = jax.jit(
            init_fn, out_shardings=param_shardings
        )()
        self._param_shardings = param_shardings

        metric_objs = self.model.metrics() if self.track_stats else {}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            metric_states=metrics_base.init_all(metric_objs),
            loss_states=(
                {name: self._mean.init() for name in _LOSS_METRICS}
                if self.track_stats
                else {}
            ),
            rng=step_rng,
        )

    # --- Steps --------------------------------------------------------

    def _loss_and_aux(self, params, batch, training: bool, rng=None):
        def run(model):
            out = model.compute_loss(batch, training=training)
            loss, aux = out if isinstance(out, tuple) else (out, {})
            reg = model.regularization_loss()
            return loss, reg, aux

        rngs = None
        if rng is not None:
            dropout_rng, sampling_rng = jax.random.split(rng)
            rngs = {"dropout": dropout_rng, "sampling": sampling_rng}
        (loss, reg, aux) = nn.apply(run, self.model)(
            {"params": params}, rngs=rngs
        )
        return loss, reg, aux

    def _make_train_step(self):
        model = self.model
        optimizer = self.optimizer
        mean = self._mean
        track_stats = self.track_stats

        def train_step(state: TrainState, batch: Batch):
            if state.rng is not None:
                next_rng, step_rng = jax.random.split(state.rng)
            else:
                next_rng = step_rng = None

            def loss_fn(params):
                loss, reg, aux = self._loss_and_aux(
                    params, batch, training=True, rng=step_rng
                )
                return loss + reg, (loss, reg, aux)

            (total_loss, (loss, reg, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)

            if track_stats:
                loss_states = {
                    "loss": mean.update(state.loss_states["loss"], loss),
                    "regularization_loss": mean.update(
                        state.loss_states["regularization_loss"], reg
                    ),
                    "total_loss": mean.update(
                        state.loss_states["total_loss"], total_loss
                    ),
                }
                metric_states = model.update_metrics(
                    state.metric_states, batch, aux
                )
            else:
                loss_states = state.loss_states
                metric_states = state.metric_states
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                metric_states=metric_states,
                loss_states=loss_states,
                rng=next_rng,
            )
            return new_state, total_loss

        return jax.jit(train_step, donate_argnums=(0,))

    def _make_eval_step(self):
        model = self.model
        mean = self._mean
        track_stats = self.track_stats

        def eval_step(state: TrainState, batch: Batch):
            loss, reg, aux = self._loss_and_aux(
                state.params, batch, training=False
            )
            total = loss + reg
            if not track_stats:
                # No loss/metric accumulators exist on the state (init()
                # created empty dicts); report the raw step loss and let
                # `evaluate` average on host.
                return state, total
            loss_states = {
                "loss": mean.update(state.loss_states["loss"], loss),
                "regularization_loss": mean.update(
                    state.loss_states["regularization_loss"], reg
                ),
                "total_loss": mean.update(
                    state.loss_states["total_loss"], total
                ),
            }
            metric_states = model.update_metrics(
                state.metric_states, batch, aux
            )
            return (
                dataclasses.replace(
                    state,
                    metric_states=metric_states,
                    loss_states=loss_states,
                ),
                total,
            )

        return jax.jit(eval_step)

    def train_step(self, state: TrainState, batch: Batch):
        """Runs one compiled training step; returns (state, total_loss)."""
        if self._train_step is None:
            self._train_step = self._make_train_step()
        batch = mesh_lib.shard_batch(batch, self.mesh, self.data_axis)
        return self._train_step(state, batch)

    def eval_step(self, state: TrainState, batch: Batch):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        batch = mesh_lib.shard_batch(batch, self.mesh, self.data_axis)
        return self._eval_step(state, batch)

    # --- Loops --------------------------------------------------------

    def reset_metrics(self, state: TrainState) -> TrainState:
        if not self.track_stats:
            return state
        metric_objs = self.model.metrics()
        return dataclasses.replace(
            state,
            metric_states=metrics_base.init_all(metric_objs),
            loss_states={name: self._mean.init() for name in _LOSS_METRICS},
        )

    def metric_results(self, state: TrainState) -> Dict[str, float]:
        if not self.track_stats:
            return {}
        metric_objs = self.model.metrics()
        results = {}
        for name, m in metric_objs.items():
            value = m.result(state.metric_states[name])
            if isinstance(value, Mapping):
                results.update(
                    {k: float(v) for k, v in value.items()}
                )
            else:
                results[name] = float(value)
        for name in _LOSS_METRICS:
            results[name] = float(self._mean.result(state.loss_states[name]))
        return results

    def _prefetched(self, dataset):
        """Yields device-resident batches, transferring one step ahead.

        Synchronous per-step host→device transfer serializes the training
        loop on dispatch latency (measured: it can dominate the step on
        remote-attached devices). Overlapping the next batch's transfer
        with the current step keeps the device queue full — the role of
        the reference's input prefetch in tf.data.
        """
        it = _iter_batches(dataset)
        try:
            pending = next(it)
        except StopIteration:
            return
        pending = mesh_lib.shard_batch(pending, self.mesh, self.data_axis)
        for nxt in it:
            nxt = mesh_lib.shard_batch(nxt, self.mesh, self.data_axis)
            yield pending
            pending = nxt
        yield pending

    def fit(
        self,
        state: TrainState,
        dataset: Callable[[], Any],
        epochs: int = 1,
        verbose: bool = True,
        max_in_flight: int = 10,
        validation_data: Optional[Callable[[], Any]] = None,
    ) -> Tuple[TrainState, Dict[str, Any]]:
        """Trains for `epochs` passes over `dataset` (a batch-iter factory).

        Batches are prefetched to device one step ahead, and at most
        `max_in_flight` steps are enqueued before synchronizing (bounding
        the live copies of donated state).

        If `validation_data` is given (another batch-iter factory), a full
        evaluation pass runs after every epoch and its metrics appear in
        the history with a `val_` prefix (the Keras `validation_data`
        contract).

        Returns the final state and a history dict with per-epoch metric
        results and throughput.
        """
        if self._train_step is None:
            self._train_step = self._make_train_step()
        history = {"epochs": []}
        for epoch in range(epochs):
            state = self.reset_metrics(state)
            start = time.perf_counter()
            num_examples = 0
            loss = None
            for i, batch in enumerate(self._prefetched(dataset)):
                state, loss = self._train_step(state, batch)
                num_examples += _batch_size(batch)
                if (i + 1) % max_in_flight == 0:
                    jax.block_until_ready(loss)
            jax.block_until_ready(state.params)
            elapsed = time.perf_counter() - start
            results = self.metric_results(state)
            if loss is not None:
                results.setdefault("loss", float(loss))
            results["examples_per_sec"] = num_examples / max(
                elapsed, 1e-9
            )
            if validation_data is not None:
                val_results = self.evaluate(state, validation_data)
                results.update(
                    {f"val_{k}": v for k, v in val_results.items()}
                )
            history["epochs"].append(results)
            if verbose:
                summary = ", ".join(
                    f"{k}={v:.4f}" for k, v in sorted(results.items())
                )
                print(f"epoch {epoch + 1}/{epochs}: {summary}")
        return state, history

    def evaluate(
        self, state: TrainState, dataset: Callable[[], Any]
    ) -> Dict[str, float]:
        """Evaluates over one pass of `dataset`; returns metric results.

        With `track_stats=False` there are no streaming accumulators, so
        the result is the mean over steps of the total loss (the same
        per-step mean the accumulators would report), as `total_loss`."""
        state = self.reset_metrics(state)
        if not self.track_stats:
            loss_sum = 0.0
            steps = 0
            for batch in _iter_batches(dataset):
                state, total = self.eval_step(state, batch)
                loss_sum += float(total)
                steps += 1
            return {"total_loss": loss_sum / max(steps, 1)}
        for batch in _iter_batches(dataset):
            state, _ = self.eval_step(state, batch)
        return self.metric_results(state)


def _iter_batches(dataset):
    return dataset() if callable(dataset) else iter(dataset)


def _batch_size(batch) -> int:
    leaves = jax.tree_util.tree_leaves(batch)
    return leaves[0].shape[0] if leaves else 0
