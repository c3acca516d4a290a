"""Prebuilt two-tower retrieval models (incl. sequential towers).

The reference builds these by hand in its tutorials (README quickstart,
`docs/examples/{basic_retrieval,deep_recommenders,sequential_retrieval}
.ipynb`): a query tower and a candidate tower feeding
`tfrs.tasks.Retrieval`. This module packages that composition:

  - `EmbeddingTower`: id → embedding → optional MLP.
  - `SequenceTower`: `[B, L]` padded id history → embeddings → GRU or
    self-attention encoder → optional MLP (the sequential-retrieval user
    tower).
  - `TwoTowerRetrieval`: wires two towers into the retrieval task with the
    task's knobs (temperature, accidental-hit removal, log-q correction,
    hard negatives) surfaced as model fields, and batch top-k accuracy
    metrics. Corpus-level `FactorizedTopK` evaluation runs externally
    against an index built from `candidate_embeddings()` (the tutorials'
    pattern of passing `compute_metrics=not training`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.layers import blocks
from recommenders_tpu.layers import sequential as sequential_lib
from recommenders_tpu.metrics import base as metrics_base
from recommenders_tpu.models import base as models_base
from recommenders_tpu.tasks import retrieval as retrieval_task

Array = jax.Array
ModuleFactory = Callable[[], nn.Module]

PAD_ID = config_lib.PAD_ID


class EmbeddingTower(nn.Module):
    """Scalar-id tower: embedding lookup plus an optional MLP head.

    Attributes:
      vocab_size: Id vocabulary.
      embedding_dim: Embedding width.
      mlp_units: Optional dense stack on top (output width = last entry).
    """

    vocab_size: int
    embedding_dim: int
    mlp_units: Sequence[int] = ()
    # Defaults to 1/sqrt(dim) truncated normal — the TPU-embedding
    # default (config.default_initializer). Flax's stddev-1 default
    # starts logits ~dim× too hot and measurably slows early
    # convergence (head-to-head harness, tools/reference_parity.py).
    embedding_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        init = self.embedding_init or nn.initializers.truncated_normal(
            stddev=self.embedding_dim ** -0.5
        )
        x = nn.Embed(
            self.vocab_size, self.embedding_dim, embedding_init=init
        )(jnp.maximum(ids, 0))
        if self.mlp_units:
            x = blocks.MLP(units=tuple(self.mlp_units))(x)
        return x


class SequenceTower(nn.Module):
    """History tower: padded `[B, L]` ids → encoder → embedding.

    Attributes:
      vocab_size: Id vocabulary.
      embedding_dim: Item-embedding width (also the output width unless an
        MLP head is configured).
      encoder: `"gru"` or `"attention"`.
      encoder_units: GRU hidden width (defaults to `embedding_dim`).
      mlp_units: Optional dense stack on top.
    """

    vocab_size: int
    embedding_dim: int
    encoder: str = "gru"
    encoder_units: Optional[int] = None
    mlp_units: Sequence[int] = ()

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        mask = ids != PAD_ID
        x = nn.Embed(
            self.vocab_size,
            self.embedding_dim,
            embedding_init=nn.initializers.truncated_normal(
                stddev=self.embedding_dim ** -0.5
            ),
        )(jnp.maximum(ids, 0))
        x = x * mask[..., None].astype(x.dtype)
        if self.encoder == "gru":
            x = sequential_lib.GRUEncoder(
                units=self.encoder_units or self.embedding_dim
            )(x, mask)
        elif self.encoder == "attention":
            x = sequential_lib.SelfAttentionEncoder(
                out_dim=self.encoder_units or self.embedding_dim
            )(x, mask)
        else:
            raise ValueError(
                f"encoder must be 'gru' or 'attention', got {self.encoder!r}"
            )
        if self.mlp_units:
            x = blocks.MLP(units=tuple(self.mlp_units))(x)
        return x


class TwoTowerRetrieval(models_base.Model):
    """Two-tower retrieval model with in-batch sampled softmax.

    Input batches carry `query_key` and `candidate_key` entries (each the
    input to its tower), optional `sample_weight`, and optional
    `candidate_sampling_probability` for log-q correction.

    Attributes:
      query_tower: Factory for the query tower.
      candidate_tower: Factory for the candidate tower.
      query_key: Batch key feeding the query tower; a tuple of keys passes
        the tower a sub-dict (context-feature towers).
      candidate_key: Batch key feeding the candidate tower (also used as
        candidate ids for accidental-hit removal when ids are scalar). May
        also be a tuple of keys like `query_key`.
      temperature: Softmax temperature.
      remove_accidental_hits: Mask in-batch negatives that share the
        positive's id.
      num_hard_negatives: Keep only this many top negatives in the loss.
      batch_metric_ks: Cutoffs for in-batch top-k categorical accuracy.
      num_extra_negatives: If > 0, this many uniformly sampled candidate
        ids are embedded and appended as shared extra negatives each
        training step (the papers' sampled-softmax augmentation of
        in-batch negatives; the reference supports extra negatives only
        as extra candidate rows supplied by the caller). Uniform sampling
        adds a constant log-q term, so no correction is needed for the
        sampled rows; the in-batch rows can still carry
        `candidate_sampling_probability`. Requires scalar candidate ids
        and `candidate_vocab_size`.
      candidate_vocab_size: Id range for negative sampling.
      score_dtype: Optional dtype (e.g. `jnp.bfloat16`) for the scoring
        matmul inputs; accumulation stays f32.
      fused: Compute the loss with the flash-CE Pallas kernel
        (`ops/fused_retrieval.py`) — the `[B, C]` score matrix never
        materializes. Per-batch top-k metrics (`batch_metric_ks`) have
        no logits to read and stay frozen at their initial value.
    """

    query_tower: ModuleFactory = lambda: EmbeddingTower(1000, 32)
    candidate_tower: ModuleFactory = lambda: EmbeddingTower(1000, 32)
    query_key: Union[str, Tuple[str, ...]] = "user_id"
    candidate_key: Union[str, Tuple[str, ...]] = "movie_id"
    temperature: Optional[float] = None
    remove_accidental_hits: bool = False
    num_hard_negatives: Optional[int] = None
    batch_metric_ks: Tuple[int, ...] = (1, 10)
    num_extra_negatives: int = 0
    candidate_vocab_size: Optional[int] = None
    score_dtype: Optional[jnp.dtype] = None
    fused: bool = False

    def setup(self):
        self._query = self.query_tower()
        self._candidate = self.candidate_tower()
        self.task = retrieval_task.Retrieval(
            temperature=self.temperature,
            remove_accidental_hits=self.remove_accidental_hits,
            num_hard_negatives=self.num_hard_negatives,
            score_dtype=self.score_dtype,
            fused=self.fused,
        )

    @staticmethod
    def _tower_input(batch, key):
        if isinstance(key, tuple):
            return {k: batch[k] for k in key}
        return batch[key]

    def query_embeddings(self, batch) -> Array:
        return self._query(self._tower_input(batch, self.query_key))

    def candidate_embeddings(self, batch) -> Array:
        return self._candidate(
            self._tower_input(batch, self.candidate_key)
        )

    def compute_loss(self, batch, training: bool = False):
        q = self.query_embeddings(batch)
        c = self.candidate_embeddings(batch)
        candidate_ids = None
        if self.remove_accidental_hits:
            ids = batch[self.candidate_key]
            if ids.ndim != 1:
                raise ValueError(
                    "Accidental-hit removal needs scalar candidate ids; "
                    f"got shape {ids.shape} for {self.candidate_key!r}."
                )
            candidate_ids = ids

        sampling_probability = batch.get("candidate_sampling_probability")
        if training and self.num_extra_negatives:
            if self.candidate_vocab_size is None:
                raise ValueError(
                    "num_extra_negatives requires candidate_vocab_size."
                )
            neg_ids = jax.random.randint(
                self.make_rng("sampling"),
                (self.num_extra_negatives,),
                0,
                self.candidate_vocab_size,
            )
            extra = self._candidate(neg_ids)
            c = jnp.concatenate([c, extra], axis=0)
            if candidate_ids is not None:
                candidate_ids = jnp.concatenate(
                    [candidate_ids, neg_ids], axis=0
                )
            if sampling_probability is not None:
                # Uniform q for the sampled rows.
                uniform = jnp.full(
                    (self.num_extra_negatives,),
                    self.num_extra_negatives
                    / self.candidate_vocab_size,
                    sampling_probability.dtype,
                )
                sampling_probability = jnp.concatenate(
                    [sampling_probability, uniform], axis=0
                )
        out = self.task(
            q,
            c,
            sample_weight=batch.get("sample_weight"),
            candidate_sampling_probability=sampling_probability,
            candidate_ids=candidate_ids,
        )
        return out.loss, {"retrieval": out}

    def metrics(self) -> Dict[str, metrics_base.Metric]:
        return {
            f"batch_top_{k}_categorical_accuracy":
                metrics_base.TopKCategoricalAccuracy(k=k)
            for k in self.batch_metric_ks
        }

    def update_metrics(self, states, batch, aux):
        # Batch metrics see the FINAL (labels, logits) fed to the loss —
        # post log-q correction, accidental-hit removal, and hard-negative
        # mining — matching the reference's update_state inputs
        # (tasks/retrieval.py:230-234). `out.scores` (pre-correction) is
        # deliberately not used here.
        out: retrieval_task.RetrievalOutput = aux["retrieval"]
        if out.logits is None:
            # Fused task: logits never materialize, so per-batch top-k
            # metrics are unavailable (corpus metrics still work).
            return dict(states)
        weight = batch.get("sample_weight")
        new_states = {}
        for k in self.batch_metric_ks:
            name = f"batch_top_{k}_categorical_accuracy"
            metric = metrics_base.TopKCategoricalAccuracy(k=k)
            new_states[name] = metric.update(
                states[name], out.labels, out.logits, weight
            )
        return new_states


def make_corpus_eval_step(model, metric, candidate_key=None):
    """One fully jitted corpus-eval step: embed → index → metric update.

    The reference's eval stack crosses into host-bound tf.data per batch
    (`layers/factorized_top_k.py:496-507`); the round-1 rebuild still
    called the index from Python inside `FactorizedTopK.update`. For a
    DEVICE-RESIDENT index (BruteForce, Streaming over in-memory arrays,
    Bucketed) the whole per-batch pipeline — query tower, corpus scan,
    top-k, accuracy accumulation — is one pure function, so it compiles
    into a single dispatch here. Measured effect: per-batch Python/
    dispatch overhead drops to one call (see benchmarks/corpus_eval.py).

    Args:
      model: A `TwoTowerRetrieval`-contract model (has
        `query_embeddings` and a scalar id `candidate_key`).
      metric: A `FactorizedTopK` whose index is device-resident.
      candidate_key: Batch key of the true candidate id; defaults to
        `model.candidate_key`.

    Returns:
      `step(params, metric_state, batch, corpus_embeddings) ->
      metric_state`, jitted. `corpus_embeddings` is the `[num_candidates,
      dim]` array used to look up true-candidate embeddings by id (pass
      the same embeddings the index was built from).
    """
    import jax as _jax

    key = candidate_key or (
        model.candidate_key
        if isinstance(model.candidate_key, str)
        else model.candidate_key[0]
    )

    @_jax.jit
    def step(params, mstate, batch, corpus_embeddings):
        queries = model.apply(
            {"params": params}, batch, method="query_embeddings"
        )
        true_ids = batch[key]
        true_embs = jnp.take(corpus_embeddings, true_ids, axis=0)
        return metric.update(
            mstate, queries, true_embs, true_candidate_ids=true_ids
        )

    return step


def evaluate_with_corpus_metrics(
    trainer,
    state,
    eval_batches,
    candidate_batch,
    ks: Tuple[int, ...] = (1, 5, 10, 50, 100),
    index_factory=None,
    exclusions_key: Optional[str] = None,
):
    """Corpus-level FactorizedTopK evaluation of a trained two-tower model.

    The reference runs corpus metrics inside `Retrieval.call` during
    `model.evaluate` (`tasks/retrieval.py:212-235`, with tutorials passing
    `compute_metrics=not training`). Here the equivalent loop is explicit:
    embed the full candidate corpus once, build an index, then stream the
    evaluation batches through it.

    Args:
      trainer: The `Trainer` holding the model.
      state: Trained `TrainState`.
      eval_batches: Zero-arg factory (or iterable) of evaluation batches.
      candidate_batch: Batch covering the FULL candidate corpus in corpus
        order (row i ↔ candidate id i), fed to the candidate tower.
      ks: Accuracy cutoffs.
      index_factory: `() -> TopK`; defaults to BruteForce.
      exclusions_key: Optional batch key with `[B, E]` candidate ids to
        exclude per query (e.g. train-set watches).

    Returns:
      Dict of `factorized_top_k/top_K_categorical_accuracy` floats.
    """
    from recommenders_tpu.layers import factorized_top_k as ftk
    from recommenders_tpu.metrics import factorized_top_k as ftk_metric

    model = trainer.model
    params = {"params": state.params}
    candidates = model.apply(
        params, candidate_batch, method="candidate_embeddings"
    )
    index = (index_factory or (lambda: ftk.BruteForce()))()
    index.index(candidates)

    metric = ftk_metric.FactorizedTopK(candidates=index, ks=ks)
    mstate = metric.init()
    batches = eval_batches() if callable(eval_batches) else eval_batches
    for batch in batches:
        queries = model.apply(
            params, batch, method="query_embeddings"
        )
        true_ids = batch[
            model.candidate_key
            if isinstance(model.candidate_key, str)
            else model.candidate_key[0]
        ]
        true_embs = candidates[true_ids]
        if exclusions_key is not None:
            scores, ids = index.query_with_exclusions(
                queries, batch[exclusions_key], k=max(ks)
            )
            # Feed pre-queried results through id-based accounting
            # (MIN_FLOAT marks padded/excluded slots in this package).
            pad = scores <= ftk.MIN_FLOAT / 2
            match = (
                jnp.equal(true_ids[:, None], ids) & ~pad
            ).astype(jnp.float32)
            for k in ks:
                found = jnp.clip(jnp.sum(match[:, :k], axis=1), 0.0, 1.0)
                mstate[k] = metric._mean.update(mstate[k], found)
        else:
            mstate = metric.update(
                mstate, queries, true_embs, true_candidate_ids=true_ids
            )
    return {
        name: float(v) for name, v in metric.result(mstate).items()
    }
