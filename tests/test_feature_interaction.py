"""Tests for Cross / MultiLayerDCN / DotInteraction / MLP.

Golden numerics mirror the reference's
`layers/feature_interaction/{dcn,dot_interaction,multi_layer_dcn}_test.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import blocks
from recommenders_tpu.layers import feature_interaction as fi


def test_cross_full_rank_formula():
    layer = fi.Cross(use_bias=True)
    x0 = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
    x = jnp.asarray([[0.4, 0.5, 0.6]], jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x0, x)

    kernel = np.asarray(params["params"]["dense"]["kernel"])
    bias = np.asarray(params["params"]["dense"]["bias"])
    expected = np.asarray(x0) * (np.asarray(x) @ kernel + bias) + np.asarray(
        x
    )
    out = layer.apply(params, x0, x)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_cross_low_rank_formula():
    layer = fi.Cross(projection_dim=2)
    x0 = jnp.asarray([[0.1, 0.2, 0.3, 0.4]], jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x0)

    u = np.asarray(params["params"]["dense_u"]["kernel"])
    v = np.asarray(params["params"]["dense_v"]["kernel"])
    b = np.asarray(params["params"]["dense_v"]["bias"])
    x0_np = np.asarray(x0)
    expected = x0_np * (x0_np @ u @ v + b) + x0_np
    out = layer.apply(params, x0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_cross_diag_scale():
    layer = fi.Cross(diag_scale=0.5)
    x0 = jnp.asarray([[0.5, 1.0]], jnp.float32)
    params = layer.init(jax.random.PRNGKey(2), x0)
    kernel = np.asarray(params["params"]["dense"]["kernel"])
    bias = np.asarray(params["params"]["dense"]["bias"])
    x0_np = np.asarray(x0)
    expected = x0_np * (x0_np @ kernel + bias + 0.5 * x0_np) + x0_np
    out = layer.apply(params, x0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_cross_negative_diag_scale_raises():
    layer = fi.Cross(diag_scale=-1.0)
    with pytest.raises(ValueError, match="diag_scale"):
        layer.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))


def test_cross_dim_mismatch_raises():
    layer = fi.Cross()
    with pytest.raises(ValueError, match="share their last dimension"):
        layer.init(
            jax.random.PRNGKey(0), jnp.ones((1, 2)), jnp.ones((1, 3))
        )


def test_multi_layer_dcn_matches_manual_stack():
    layer = fi.MultiLayerDCN(projection_dim=2, num_layers=3)
    x0 = jnp.asarray(
        np.random.RandomState(0).normal(size=(4, 6)).astype(np.float32)
    )
    params = layer.init(jax.random.PRNGKey(3), x0)

    x0_np = np.asarray(x0)
    xl = x0_np
    for i in range(3):
        u = np.asarray(params["params"][f"dense_u_{i}"]["kernel"])
        v = np.asarray(params["params"][f"dense_v_{i}"]["kernel"])
        b = np.asarray(params["params"][f"dense_v_{i}"]["bias"])
        xl = x0_np * (xl @ u @ v + b) + xl
    out = layer.apply(params, x0)
    np.testing.assert_allclose(np.asarray(out), xl, rtol=1e-4)


@pytest.mark.parametrize("self_interaction", [False, True])
@pytest.mark.parametrize("skip_gather", [False, True])
def test_dot_interaction_matches_numpy(self_interaction, skip_gather):
    rng = np.random.RandomState(0)
    num_features, dim, batch = 4, 8, 3
    inputs = [
        rng.normal(size=(batch, dim)).astype(np.float32)
        for _ in range(num_features)
    ]
    layer = fi.DotInteraction(
        self_interaction=self_interaction, skip_gather=skip_gather
    )
    out = np.asarray(
        layer.apply({}, [jnp.asarray(x) for x in inputs])
    )

    feats = np.stack(inputs, axis=1)  # [B, F, D]
    xact = np.einsum("bfd,bgd->bfg", feats, feats)
    k = 0 if self_interaction else -1
    rows, cols = np.tril_indices(num_features, k=k)
    if skip_gather:
        expected = np.zeros_like(xact)
        expected[:, rows, cols] = xact[:, rows, cols]
        expected = expected.reshape(batch, num_features * num_features)
    else:
        expected = xact[:, rows, cols]
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_dot_interaction_shape_mismatch_raises():
    layer = fi.DotInteraction()
    with pytest.raises(ValueError, match="equal"):
        layer.apply({}, [jnp.ones((2, 4)), jnp.ones((2, 5))])


def test_mlp_shapes_and_final_activation():
    mlp = blocks.MLP(units=[16, 8, 1], final_activation="sigmoid")
    x = jnp.ones((4, 32))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (4, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_mlp_no_hidden_activation_is_linear():
    mlp = blocks.MLP(units=[4], activation="relu")
    x = jnp.asarray(np.random.RandomState(1).normal(size=(2, 3)))
    params = mlp.init(jax.random.PRNGKey(0), x)
    kernel = np.asarray(params["params"]["Dense_0"]["kernel"])
    bias = np.asarray(params["params"]["Dense_0"]["bias"])
    np.testing.assert_allclose(
        np.asarray(mlp.apply(params, x)),
        np.asarray(x) @ kernel + bias,
        rtol=1e-5,
    )
