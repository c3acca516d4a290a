"""Step-by-step numeric tests for ClippyAdagrad and the composite optimizer.

Mirrors the accumulator/clip math checks of the reference's
`experimental/optimizers/clippy_adagrad_test.py:164-343` and the
disjointness/coverage validation of `composite_optimizer_test.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import optimizers


def _np_clippy_step(
    w,
    g,
    accum,
    lr=1.0,
    var_rel=0.1,
    acc_rel=0.0,
    abs_thr=1e-7,
    eps=1e-7,
    clip_accumulator_update=False,
    use_standard_accumulator_update=False,
):
    """Numpy mirror of one Clippy step; returns (new_w, new_accum, scale)."""
    w, g, accum = (np.asarray(x, np.float64) for x in (w, g, accum))
    if use_standard_accumulator_update:
        accum = accum + g**2
    precond = 1.0 / np.sqrt(accum + eps)
    delta = lr * g * precond
    max_delta = np.abs(w) * var_rel + precond * acc_rel + abs_thr
    per_elem = np.where(
        delta == 0.0, 1.0, max_delta / np.maximum(np.abs(delta), 1e-300)
    )
    scale = min(1.0, per_elem.min())
    clipped = delta * scale
    if not use_standard_accumulator_update:
        upd = g * scale if clip_accumulator_update else g
        accum = accum + upd**2
    return w - clipped, accum, scale


@pytest.mark.parametrize(
    "clip_acc,std_acc",
    [(False, False), (True, False), (False, True)],
)
def test_clippy_single_step_matches_numpy(clip_acc, std_acc):
    rng = np.random.RandomState(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    g = rng.normal(size=(4, 3)).astype(np.float32) * 5.0

    opt = optimizers.clippy_adagrad(
        learning_rate=1.0,
        initial_accumulator_value=0.1,
        variable_relative_threshold=0.1,
        absolute_threshold=1e-7,
        clip_accumulator_update=clip_acc,
        use_standard_accumulator_update=std_acc,
    )
    params = {"w": jnp.asarray(w)}
    state = opt.init(params)
    updates, new_state = opt.update({"w": jnp.asarray(g)}, state, params)
    new_params = optax.apply_updates(params, updates)

    exp_w, exp_accum, exp_scale = _np_clippy_step(
        w,
        g,
        np.full_like(w, 0.1),
        clip_accumulator_update=clip_acc,
        use_standard_accumulator_update=std_acc,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["w"]), exp_w, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.accumulator["w"]), exp_accum, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(new_state.clipping_factors["w"]), exp_scale, rtol=1e-5
    )


def test_clippy_multi_step_trajectory():
    rng = np.random.RandomState(1)
    w = rng.normal(size=(5,)).astype(np.float32)
    opt = optimizers.clippy_adagrad(learning_rate=0.5)
    params = {"w": jnp.asarray(w)}
    state = opt.init(params)

    np_w = w.astype(np.float64)
    np_accum = np.full_like(np_w, 0.1)
    for step in range(5):
        g = rng.normal(size=(5,)).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        np_w, np_accum, _ = _np_clippy_step(np_w, g, np_accum, lr=0.5)
    np.testing.assert_allclose(np.asarray(params["w"]), np_w, rtol=1e-4)


def test_clippy_learning_rate_schedule():
    opt = optimizers.clippy_adagrad(
        learning_rate=lambda count: 1.0 / (1.0 + count.astype(jnp.float32))
    )
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    g = {"w": jnp.full((2,), 0.001)}  # Small grad: no clipping.
    _, state = opt.update(g, state, params)
    updates2, state = opt.update(g, state, params)
    # Second step uses lr = 1/2.
    precond = 1.0 / np.sqrt(0.1 + 0.001**2 + 1e-7)
    expected = -0.5 * 0.001 * precond
    np.testing.assert_allclose(
        np.asarray(updates2["w"]), expected, rtol=1e-4
    )


def test_clippy_zero_grad_no_change():
    opt = optimizers.clippy_adagrad()
    params = {"w": jnp.asarray([1.0, -2.0])}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.zeros((2,))}, state, params)
    np.testing.assert_array_equal(np.asarray(updates["w"]), [0.0, 0.0])


def test_shrink_by_references_validation():
    with pytest.raises(ValueError, match="non-negative"):
        optimizers.shrink_by_references(
            jnp.ones(2), [jnp.ones(2)], [-0.1], 0.0
        )
    with pytest.raises(ValueError, match="same length"):
        optimizers.shrink_by_references(
            jnp.ones(2), [jnp.ones(2)], [0.1, 0.2], 0.0
        )


def test_composite_routes_by_path():
    params = {
        "embedding": {"table": jnp.ones((4, 2))},
        "dense": {"kernel": jnp.ones((2, 2))},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    opt = optimizers.composite_optimizer(
        [
            (optax.sgd(1.0), optimizers.path_contains("embedding")),
            (optax.sgd(0.1), lambda path: True),
        ],
        example_params=params,
    )
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["embedding"]["table"]), -1.0
    )
    np.testing.assert_allclose(
        np.asarray(updates["dense"]["kernel"]), -0.1, rtol=1e-6
    )


def test_composite_uncovered_param_raises():
    params = {"a": jnp.ones(2), "b": jnp.ones(2)}
    with pytest.raises(ValueError, match="not handled"):
        optimizers.composite_optimizer(
            [(optax.sgd(1.0), optimizers.path_contains("a"))],
            example_params=params,
        )


def test_composite_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        optimizers.composite_optimizer([])


def test_composite_with_clippy_and_adam():
    params = {
        "embedding": {"table": jnp.ones((4, 2))},
        "mlp": {"kernel": jnp.ones((2, 2))},
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.5), params
    )
    opt = optimizers.composite_optimizer(
        [
            (
                optimizers.clippy_adagrad(0.1),
                optimizers.path_contains("embedding"),
            ),
            (optax.adam(1e-3), lambda path: True),
        ]
    )
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(new_params["embedding"]["table"])))
    assert np.all(np.isfinite(np.asarray(new_params["mlp"]["kernel"])))
