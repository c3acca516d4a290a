"""Leaf-scoring kernel (interpret mode) + anisotropic quantization tests.

The kernel's compiled (Mosaic) path runs in the TPU-marked hardware
suite (`tests/test_tpu_hardware.py`); here the interpreted kernel is
checked bit-for-bit against the gather-formulation oracle, and the
score-aware quantizer is checked to beat abs-max scaling on the metric
it optimizes (inner-product fidelity / recall).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import approximate
from recommenders_tpu.ops import leaf_scoring


def _leaves(num_leaves=8, cap=128, d=128, seed=0, quantized=False):
    rng = np.random.RandomState(seed)
    embs = rng.normal(size=(num_leaves, cap, d)).astype(np.float32)
    if not quantized:
        return jnp.asarray(embs), None
    scales, codes = approximate._quantize_rows(embs, None)
    return jnp.asarray(codes), jnp.asarray(scales)


@pytest.mark.parametrize("quantized", [False, True])
def test_kernel_matches_reference(quantized):
    embs, scales = _leaves(quantized=quantized)
    rng = np.random.RandomState(1)
    queries = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    probes = jnp.asarray(
        rng.randint(0, 8, size=(16, 3)).astype(np.int32)
    )
    got = leaf_scoring.probed_leaf_scores(
        queries, embs, scales, probes, interpret=True
    )
    want = leaf_scoring.probed_scores_reference(
        queries, embs, scales, probes
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_kernel_shape_guard():
    embs, _ = _leaves(cap=128, d=128)
    q = jnp.zeros((4, 64))  # dim not a multiple of 128
    probes = jnp.zeros((4, 2), jnp.int32)
    with pytest.raises(ValueError, match="multiples of 128"):
        leaf_scoring.probed_leaf_scores(q, embs[:, :, :64], None, probes)


def test_anisotropic_scales_improve_score_fidelity():
    """Score-aware scales must reduce inner-product error for
    high-scoring (near-parallel) queries vs abs-max scaling — the
    property the anisotropic loss optimizes."""
    rng = np.random.RandomState(2)
    v = rng.normal(size=(2000, 64)).astype(np.float32)
    s_plain, q_plain = approximate._quantize_rows(v, None)
    s_ani, q_ani = approximate._quantize_rows(v, 0.2)

    # Queries nearly parallel to the rows (the top-scoring regime).
    noise = 0.1 * rng.normal(size=v.shape).astype(np.float32)
    queries = v + noise
    true = np.sum(queries * v, axis=1)
    err_plain = np.abs(
        np.sum(queries * (s_plain[:, None] * q_plain), axis=1) - true
    )
    err_ani = np.abs(
        np.sum(queries * (s_ani[:, None] * q_ani), axis=1) - true
    )
    assert err_ani.mean() < err_plain.mean(), (
        err_ani.mean(), err_plain.mean()
    )


def test_anisotropic_recall_at_least_plain():
    """End-to-end: quantized search recall with anisotropic scales is at
    least as good as abs-max on a MIPS workload."""
    rng = np.random.RandomState(3)
    corpus = rng.normal(size=(4000, 128)).astype(np.float32)
    queries = rng.normal(size=(64, 128)).astype(np.float32)
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]

    def recall(threshold):
        index = approximate.ScaNN(
            k=10, num_leaves=16, num_leaves_to_search=16, quantize=True,
            anisotropic_quantization_threshold=threshold,
        )
        index.index(corpus)
        _, ids = index(jnp.asarray(queries))
        hits = 0
        for i in range(queries.shape[0]):
            hits += len(set(np.asarray(ids)[i]) & set(exact[i]))
        return hits / exact.size

    r_plain = recall(None)
    r_ani = recall(0.2)
    assert r_ani >= r_plain - 0.005, (r_ani, r_plain)
    assert r_ani > 0.9, r_ani


def test_zero_rows_quantize_safely():
    v = np.zeros((4, 16), np.float32)
    v[1] = np.linspace(-1, 1, 16)
    s, q = approximate._quantize_rows(v, 0.2)
    assert np.isfinite(s).all()
    np.testing.assert_array_equal(q[0], np.zeros(16))


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("query_tile", [1, 8])
def test_bucketed_kernel_matches_reference(quantized, query_tile):
    """Interpreted bucketed kernel == jnp fold oracle, incl. padding
    slots (rows == -1) and int8 dequantization."""
    embs, scales = _leaves(num_leaves=8, cap=256, quantized=quantized)
    rng = np.random.RandomState(2)
    rows = rng.permutation(8 * 256).astype(np.int32).reshape(8, 256)
    rows[:, -5:] = -1
    rows = jnp.asarray(rows)
    qn = 16
    queries = jnp.asarray(rng.normal(size=(qn, 128)).astype(np.float32))
    probes = jnp.asarray(
        rng.randint(0, 8, size=(qn // query_tile, 4)).astype(np.int32)
    )
    vk, rk = leaf_scoring.probed_bucketed_scores(
        queries, embs, scales, rows, probes, buckets=128,
        query_tile=query_tile, interpret=True,
    )
    vr, rr = leaf_scoring.probed_bucketed_reference(
        queries, embs, scales, rows, probes, buckets=128,
        query_tile=query_tile,
    )
    np.testing.assert_allclose(
        np.asarray(vk), np.asarray(vr), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(rr))


@pytest.mark.parametrize("cap,buckets", [(384, 256), (128, 256)])
def test_bucketed_kernel_partial_tail_group(cap, buckets):
    """cap need only be 128-aligned: a partial tail group folds into
    the leading buckets; buckets above cap clamp at the caller (here
    the kernel itself rejects buckets > cap)."""
    embs, _ = _leaves(num_leaves=8, cap=cap)
    rng = np.random.RandomState(3)
    rows = rng.permutation(8 * cap).astype(np.int32).reshape(8, cap)
    rows[:, -3:] = -1
    rows = jnp.asarray(rows)
    queries = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    probes = jnp.asarray(rng.randint(0, 8, size=(16, 4)), jnp.int32)
    if buckets > cap:
        with pytest.raises(ValueError, match="buckets <= cap"):
            leaf_scoring.probed_bucketed_scores(
                queries, embs, None, rows, probes, buckets=buckets,
                query_tile=1, interpret=True,
            )
        return
    vk, rk = leaf_scoring.probed_bucketed_scores(
        queries, embs, None, rows, probes, buckets=buckets,
        query_tile=1, interpret=True,
    )
    vr, rr = leaf_scoring.probed_bucketed_reference(
        queries, embs, None, rows, probes, buckets=buckets,
        query_tile=1,
    )
    np.testing.assert_allclose(
        np.asarray(vk), np.asarray(vr), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(rr))


def test_bucketed_kernel_shape_guards():
    embs, _ = _leaves(num_leaves=4, cap=256)
    rows = jnp.zeros((4, 256), jnp.int32)
    queries = jnp.zeros((8, 128))
    probes = jnp.zeros((8, 2), jnp.int32)
    with pytest.raises(ValueError, match="buckets <= cap"):
        leaf_scoring.probed_bucketed_scores(
            queries, embs, None, rows, probes, buckets=192,
            query_tile=1, interpret=True,
        )
    with pytest.raises(ValueError, match="queries rows"):
        leaf_scoring.probed_bucketed_scores(
            queries, embs, None, rows, probes, buckets=128,
            query_tile=3, interpret=True,
        )
