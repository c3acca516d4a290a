"""Data-parallel retrieval training with cross-shard negative pooling.

Under plain data parallelism each shard's in-batch softmax sees only its
local candidates: a global batch of B split over S shards gives each query
B/S negatives instead of B, weakening the sampled softmax exactly when
scaling out. The reference ships (but never wires up) an all-gather
utility for this (`tensorflow_recommenders/tasks/retrieval.py:238-321`,
`_cross_replica_concat`); here it is a first-class training step:

  - each shard embeds its local queries/candidates;
  - candidates are pooled across the data axis with
    `tasks.retrieval.cross_replica_concat` (all_gather over ICI + roll so
    the shard's own positives come first → identity labels still hold);
  - every query scores against the FULL global candidate set (its own
    positive plus B−1 negatives), restoring single-controller semantics;
  - gradients are psum'd — the all-gather's backward contributes each
    shard's gradient for other shards' candidate rows automatically.

With SUM-reduced softmax CE this is numerically identical to running the
whole global batch on one device (verified in tests), so scaling out does
not change the optimization problem.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from recommenders_tpu.models import base as models_base
from recommenders_tpu.parallel import mesh as mesh_lib
from recommenders_tpu.tasks import retrieval as retrieval_task

Array = jax.Array


def make_pooled_negatives_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = mesh_lib.DATA_AXIS,
) -> Callable:
    """Builds `(params, opt_state, batch) → (params, opt_state, loss)`.

    `model` must expose `query_embeddings` / `candidate_embeddings` and a
    `task` (the `TwoTowerRetrieval` contract). The returned step is
    jitted; the batch is consumed shard-local (`P(data_axis)`), params
    and optimizer state replicated.
    """

    def local_loss(params, batch):
        def run(m):
            q = m.query_embeddings(batch)
            c = m.candidate_embeddings(batch)
            c_global = retrieval_task.cross_replica_concat(c, data_axis)
            return m.task(q, c_global).loss

        return nn.apply(run, model)({"params": params})

    def shard_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(local_loss)(params, batch)
        # SUM-reduced CE: the global loss is the sum of shard losses, and
        # the total gradient the sum of shard gradients.
        grads = jax.lax.psum(grads, data_axis)
        loss = jax.lax.psum(loss, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


class PooledNegativesTrainer(models_base.Trainer):
    """Trainer whose train step pools in-batch negatives across shards.

    Drop-in for `Trainer` on retrieval models following the
    `TwoTowerRetrieval` contract. Metric/loss-state accumulation is
    disabled (the step returns the global loss each step).
    """

    def __post_init__(self):
        super().__post_init__()
        self.track_stats = False
        self._pooled_step = None

    def train_step(self, state, batch):
        if self._pooled_step is None:
            self._pooled_step = make_pooled_negatives_train_step(
                self.model, self.optimizer, self.mesh, self.data_axis
            )
        batch = mesh_lib.shard_batch(batch, self.mesh, self.data_axis)
        params, opt_state, loss = self._pooled_step(
            state.params, state.opt_state, batch
        )
        import dataclasses

        return (
            dataclasses.replace(
                state,
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
            ),
            loss,
        )
