"""Listwise ranking losses.

The reference integrates listwise learning-to-rank through the external
`tensorflow-ranking` package (setup.py extras, `docs/examples/listwise_
ranking.ipynb`: ListMLE / pairwise logistic / softmax CE losses over
lists sampled by `examples/movielens.py:sample_listwise`). These are the
TPU-native equivalents, shaped for `tasks.Ranking(loss_fn=...)`:

    task = tasks.Ranking(loss_fn=listwise.list_mle)
    out = task(labels_bl, scores_bl)

All losses take `[B, L]` labels/scores (optionally `[B]` or `[B, L]`
sample weights), support a validity mask via `mask` (True = real entry)
for ragged lists, and reduce to a scalar mean over examples. Everything
is sort/gather/softmax — static shapes, jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e12


def _prep(labels, scores, mask):
    labels = jnp.asarray(labels, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    if mask is None:
        mask = jnp.ones(labels.shape, bool)
    return labels, scores, mask


def _weighted_mean(per_example: Array, sample_weight: Optional[Array]):
    if sample_weight is not None:
        w = jnp.reshape(
            jnp.asarray(sample_weight, jnp.float32), per_example.shape
        )
        return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.mean(per_example)


def softmax_listwise(
    labels: Array,
    scores: Array,
    sample_weight: Optional[Array] = None,
    mask: Optional[Array] = None,
) -> Array:
    """ListNet-style softmax cross-entropy: CE(normalize(labels),
    softmax(scores)) per list (tensorflow-ranking's SoftmaxLoss)."""
    labels, scores, mask = _prep(labels, scores, mask)
    scores = jnp.where(mask, scores, _NEG)
    labels = jnp.where(mask, labels, 0.0)
    label_dist = labels / jnp.maximum(
        jnp.sum(labels, axis=1, keepdims=True), 1e-12
    )
    log_probs = jax.nn.log_softmax(scores, axis=1)
    per_example = -jnp.sum(label_dist * jnp.where(mask, log_probs, 0.0),
                           axis=1)
    return _weighted_mean(per_example, sample_weight)


def pairwise_logistic(
    labels: Array,
    scores: Array,
    sample_weight: Optional[Array] = None,
    mask: Optional[Array] = None,
    pair_weights: Optional[Array] = None,
) -> Array:
    """Pairwise logistic loss: `log(1 + exp(-(s_i - s_j)))` over pairs with
    `label_i > label_j` (tensorflow-ranking's PairwiseLogisticLoss).

    `pair_weights` optionally weights each `[B, L, L]` pair — see
    `ndcg_lambda_weights` for the LambdaRank weighting.
    """
    labels, scores, mask = _prep(labels, scores, mask)
    s_diff = scores[:, :, None] - scores[:, None, :]
    l_diff = labels[:, :, None] - labels[:, None, :]
    valid_pair = (
        (l_diff > 0) & mask[:, :, None] & mask[:, None, :]
    ).astype(jnp.float32)
    if pair_weights is not None:
        valid_pair = valid_pair * pair_weights
    # log1p(exp(-x)) computed stably.
    losses = jnp.maximum(-s_diff, 0.0) + jnp.log1p(
        jnp.exp(-jnp.abs(s_diff))
    )
    per_example = jnp.sum(losses * valid_pair, axis=(1, 2)) / jnp.maximum(
        jnp.sum(valid_pair, axis=(1, 2)), 1e-12
    )
    return _weighted_mean(per_example, sample_weight)


def ndcg_lambda_weights(
    labels: Array,
    scores: Array,
    mask: Optional[Array] = None,
) -> Array:
    """LambdaRank pair weights: `|ΔNDCG|` of swapping each pair.

    `|ΔNDCG_ij| = |gain_i − gain_j| · |1/log2(1+r_i) − 1/log2(1+r_j)| /
    maxDCG` with ranks `r` from the current scores — the weighting of
    tensorflow-ranking's `NDCGLambdaWeight`. Returned as a `[B, L, L]`
    array (stop-gradient; ranks are treated as constants).

    ```python
    loss = listwise.pairwise_logistic(
        labels, scores,
        pair_weights=listwise.ndcg_lambda_weights(labels, scores))
    ```
    """
    labels, scores, mask = _prep(labels, scores, mask)
    scores = jax.lax.stop_gradient(scores)
    length = labels.shape[1]

    sort_key = jnp.where(mask, scores, -jnp.inf)
    order = jnp.argsort(-sort_key, axis=1, stable=True)
    # rank[i] = position of item i in the score-descending ordering (1-based)
    ranks = jnp.zeros_like(order).at[
        jnp.arange(labels.shape[0])[:, None], order
    ].set(jnp.arange(1, length + 1)[None, :])

    gains = jnp.where(mask, jnp.power(2.0, labels) - 1.0, 0.0)
    discounts = 1.0 / jnp.log2(1.0 + ranks.astype(jnp.float32))

    ideal_gains = jnp.sort(gains, axis=1)[:, ::-1]
    positions = jnp.arange(1, length + 1, dtype=jnp.float32)
    max_dcg = jnp.sum(
        ideal_gains / jnp.log2(1.0 + positions)[None], axis=1
    )
    inv_max = jnp.where(max_dcg > 0, 1.0 / jnp.maximum(max_dcg, 1e-12), 0.0)

    gain_diff = jnp.abs(gains[:, :, None] - gains[:, None, :])
    disc_diff = jnp.abs(
        discounts[:, :, None] - discounts[:, None, :]
    )
    return gain_diff * disc_diff * inv_max[:, None, None]


def dcg_lambda_weights(
    labels: Array,
    scores: Array,
    mask: Optional[Array] = None,
) -> Array:
    """Unnormalized `|ΔDCG|` pair weights.

    tensorflow-ranking's `DCGLambdaWeight` (the `NDCGLambdaWeight`
    math without the 1/maxDCG normalization): pairs are weighted by
    the raw DCG change of swapping them, so lists with larger ideal
    DCG contribute proportionally more to the batch loss.
    """
    labels, scores, mask = _prep(labels, scores, mask)
    ndcg = ndcg_lambda_weights(labels, scores, mask)
    gains = jnp.where(mask, jnp.power(2.0, labels) - 1.0, 0.0)
    positions = jnp.arange(1, labels.shape[1] + 1, dtype=jnp.float32)
    max_dcg = jnp.sum(
        jnp.sort(gains, axis=1)[:, ::-1]
        / jnp.log2(1.0 + positions)[None],
        axis=1,
    )
    return ndcg * max_dcg[:, None, None]


def lambdarank(
    labels: Array,
    scores: Array,
    sample_weight: Optional[Array] = None,
    mask: Optional[Array] = None,
) -> Array:
    """Pairwise logistic loss with `|ΔNDCG|` lambda weights (LambdaRank)."""
    return pairwise_logistic(
        labels,
        scores,
        sample_weight=sample_weight,
        mask=mask,
        pair_weights=ndcg_lambda_weights(labels, scores, mask),
    )


def list_mle(
    labels: Array,
    scores: Array,
    sample_weight: Optional[Array] = None,
    mask: Optional[Array] = None,
) -> Array:
    """ListMLE: negative log-likelihood of the label-descending permutation
    under the Plackett-Luce model (tensorflow-ranking's ListMLELoss).

    `loss = -Σ_i [s_{π(i)} - logsumexp(s_{π(i)}, ..., s_{π(L)})]` where π
    sorts by label descending.
    """
    labels, scores, mask = _prep(labels, scores, mask)
    # Sort by label descending; invalid entries last.
    sort_key = jnp.where(mask, labels, -jnp.inf)
    order = jnp.argsort(-sort_key, axis=1, stable=True)
    s_sorted = jnp.take_along_axis(scores, order, axis=1)
    m_sorted = jnp.take_along_axis(mask, order, axis=1)
    s_masked = jnp.where(m_sorted, s_sorted, _NEG)
    # Suffix logsumexp: cumulative logaddexp over the reversed list.
    rev = s_masked[:, ::-1]
    cum = jax.lax.associative_scan(jnp.logaddexp, rev, axis=1)
    suffix_lse = cum[:, ::-1]
    per_pos = (suffix_lse - s_sorted) * m_sorted.astype(jnp.float32)
    per_example = jnp.sum(per_pos, axis=1) / jnp.maximum(
        jnp.sum(m_sorted, axis=1), 1e-12
    )
    return _weighted_mean(per_example, sample_weight)


def approx_ndcg(
    labels: Array,
    scores: Array,
    sample_weight: Optional[Array] = None,
    mask: Optional[Array] = None,
    temperature: float = 0.1,
) -> Array:
    """ApproxNDCG loss: `-NDCG` with ranks replaced by a sigmoid-smoothed
    approximation (Qin et al.; tensorflow-ranking's ApproxNDCGLoss)."""
    labels, scores, mask = _prep(labels, scores, mask)
    valid_f = mask.astype(jnp.float32)
    s_diff = (scores[:, None, :] - scores[:, :, None]) / temperature
    pair_valid = mask[:, :, None] & mask[:, None, :]
    # approx_rank_i = 1 + Σ_{j≠i} sigmoid((s_j - s_i)/T)
    sig = jnp.where(pair_valid, jax.nn.sigmoid(s_diff), 0.0)
    diag = jnp.eye(labels.shape[1], dtype=jnp.float32)[None]
    approx_rank = 1.0 + jnp.sum(sig * (1.0 - diag), axis=2)
    gains = (jnp.power(2.0, labels) - 1.0) * valid_f
    dcg = jnp.sum(gains / jnp.log2(1.0 + approx_rank), axis=1)

    # Ideal DCG from true label ordering.
    sorted_gains = jnp.sort(gains, axis=1)[:, ::-1]
    positions = jnp.arange(1, labels.shape[1] + 1, dtype=jnp.float32)
    ideal = jnp.sum(sorted_gains / jnp.log2(1.0 + positions)[None], axis=1)
    ndcg = dcg / jnp.maximum(ideal, 1e-12)
    return _weighted_mean(-ndcg, sample_weight)
