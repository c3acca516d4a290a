"""Fused flash-CE retrieval loss vs the materialized task: value + grads.

The fused kernel must be a drop-in for `tasks.Retrieval(...).loss` on
its supported knob set (reference semantics:
tensorflow_recommenders/tasks/retrieval.py:86-87,187-210). Every test
compares loss value AND input gradients against the unfused task, which
has its own golden-value tests (test_retrieval_task.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_tpu import tasks as tasks_lib
from recommenders_tpu.ops import fused_retrieval

B, C, D = 32, 48, 64


def _data(seed=0, b=B, c=C, d=D):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    cand = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 10, size=(c,)), jnp.int32)
    probs = jnp.asarray(rng.uniform(0.01, 1.0, size=(c,)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(b,)).astype(np.float32))
    return q, cand, ids, probs, w


KNOBS = [
    dict(),
    dict(temperature=0.2),
    dict(candidate_sampling_probability=True),
    dict(candidate_ids=True, remove_accidental_hits=True),
    dict(sample_weight=True),
    dict(
        temperature=0.7,
        candidate_sampling_probability=True,
        candidate_ids=True,
        remove_accidental_hits=True,
        sample_weight=True,
    ),
]


def _resolve(knobs, ids, probs, w):
    call_kw = {}
    task_kw = {}
    if "temperature" in knobs:
        task_kw["temperature"] = knobs["temperature"]
    if knobs.get("remove_accidental_hits"):
        task_kw["remove_accidental_hits"] = True
    if knobs.get("candidate_sampling_probability"):
        call_kw["candidate_sampling_probability"] = probs
    if knobs.get("candidate_ids"):
        call_kw["candidate_ids"] = ids
    if knobs.get("sample_weight"):
        call_kw["sample_weight"] = w
    return task_kw, call_kw


@pytest.mark.parametrize("knobs", KNOBS)
@pytest.mark.parametrize("fused_fn", ["kernel", "reference"])
def test_value_and_grads_match_task(knobs, fused_fn):
    q, cand, ids, probs, w = _data()
    task_kw, call_kw = _resolve(knobs, ids, probs, w)
    task = tasks_lib.Retrieval(**task_kw)

    def unfused(q, cand):
        return task(q, cand, **call_kw).loss

    def fused(q, cand):
        kw = dict(call_kw)
        kw.update(task_kw)
        if fused_fn == "kernel":
            return fused_retrieval.fused_retrieval_loss(
                q, cand, interpret=True, block_q=16, block_c=16, **kw
            )
        return fused_retrieval.fused_retrieval_loss_reference(
            q, cand, **kw
        )

    ref_loss, (ref_dq, ref_dc) = jax.value_and_grad(unfused, (0, 1))(
        q, cand
    )
    got_loss, (got_dq, got_dc) = jax.value_and_grad(fused, (0, 1))(
        q, cand
    )
    np.testing.assert_allclose(
        float(got_loss), float(ref_loss), rtol=1e-5
    )
    # Tile-wise accumulation reorders the f32 sums; tolerances cover
    # the resulting last-bits noise on near-cancelling elements.
    np.testing.assert_allclose(
        np.asarray(got_dq), np.asarray(ref_dq), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_dc), np.asarray(ref_dc), rtol=1e-3, atol=1e-4
    )


def test_square_batch_no_extra_negatives():
    q, cand, ids, probs, w = _data(b=32, c=32)
    task = tasks_lib.Retrieval()
    ref = task(q, cand).loss
    got = fused_retrieval.fused_retrieval_loss(
        q, cand, interpret=True, block_q=16, block_c=16
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_nondivisible_shapes_fall_back():
    q, cand, _, _, _ = _data(b=30, c=45)  # 30 % 8 != 0
    ref = tasks_lib.Retrieval()(q, cand).loss
    got = fused_retrieval.fused_retrieval_loss(q, cand, interpret=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_accidental_hits_require_ids():
    q, cand, _, _, _ = _data()
    with pytest.raises(ValueError, match="candidate ids"):
        fused_retrieval.fused_retrieval_loss(
            q, cand, remove_accidental_hits=True, interpret=True
        )


def test_maxsim_rejected():
    q = jnp.zeros((8, 2, 64))
    cand = jnp.zeros((8, 64))
    with pytest.raises(ValueError, match="2D"):
        fused_retrieval.fused_retrieval_loss(q, cand, interpret=True)


def test_bf16_score_dtype_close_to_f32():
    q, cand, ids, probs, w = _data()
    ref = fused_retrieval.fused_retrieval_loss_reference(q, cand)
    got = fused_retrieval.fused_retrieval_loss(
        q, cand, score_dtype=jnp.bfloat16, interpret=True,
        block_q=16, block_c=16,
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)


def test_task_fused_flag_matches_unfused_loss():
    # On CPU the fused task falls back to the identical-math jnp twin,
    # so loss values match the unfused task exactly.
    q, cand, ids, probs, w = _data()
    kw = dict(temperature=0.5, remove_accidental_hits=True)
    unfused = tasks_lib.Retrieval(**kw)(
        q, cand, candidate_ids=ids, sample_weight=w
    )
    fused = tasks_lib.Retrieval(fused=True, **kw)(
        q, cand, candidate_ids=ids, sample_weight=w
    )
    np.testing.assert_allclose(
        float(fused.loss), float(unfused.loss), rtol=1e-5
    )
    assert fused.logits is None
    assert fused.labels is None
    assert fused.scores is None


def test_task_fused_rejects_incompatible_knobs():
    q, cand, _, _, _ = _data()
    with pytest.raises(ValueError, match="fused=True"):
        tasks_lib.Retrieval(fused=True, num_hard_negatives=3)(q, cand)
    with pytest.raises(ValueError, match="fused=True"):
        tasks_lib.Retrieval(fused=True)(
            q, cand, score_mask=jnp.ones((B, C), bool)
        )
    with pytest.raises(ValueError, match="fused=True"):
        tasks_lib.Retrieval(fused=True)(jnp.zeros((8, 2, 64)), cand)


def test_gradient_zero_sum_property():
    # Σ_j p_ij = 1 and one positive per row ⇒ each dq row is
    # (p − y) @ C with coefficients summing to 0; translating every
    # candidate by a constant vector leaves dq unchanged.
    q, cand, _, _, _ = _data(b=16, c=16)
    g1 = jax.grad(
        lambda q: fused_retrieval.fused_retrieval_loss(
            q, cand, interpret=True, block_q=16, block_c=16
        )
    )(q)
    g2 = jax.grad(
        lambda q: fused_retrieval.fused_retrieval_loss(
            q, cand + 3.0, interpret=True, block_q=16, block_c=16
        )
    )(q)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4
    )
