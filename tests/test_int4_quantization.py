"""Packed 4-bit (int4) quantization and scan-path tests.

The TPU-native counterpart of the reference's 4-bit asymmetric-hashing
scan (`scann_ops.builder(...).score_ah(2)` behind
`tensorflow_recommenders/layers/factorized_top_k.py:688-707`): scalar
int4 codes, two per byte along the row axis, decoded with two bitwise
ops in VMEM and scored on the MXU. Interpret-mode kernels are checked
bit-for-bit against jnp oracles; the compiled path runs in
`tests/test_tpu_hardware.py`.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import approximate
from recommenders_tpu.layers import factorized_top_k as ftk
from recommenders_tpu.ops import leaf_scoring, quantization, scoring


def _data(n, d, q, seed=0):
    rng = np.random.RandomState(seed)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(corpus)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    codes = rng.randint(-8, 8, size=(3, 64, 16)).astype(np.int8)
    packed = quantization.pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (3, 32, 16)
    assert packed.dtype == jnp.int8
    back = quantization.unpack_nibbles(packed)
    np.testing.assert_array_equal(np.asarray(back), codes)


def test_pack_nibbles_layout():
    """Byte (c, d) = low nibble row c, high nibble row c + n/2."""
    codes = np.zeros((4, 1), np.int8)
    codes[:, 0] = [3, -2, -8, 7]
    packed = np.asarray(quantization.pack_nibbles(jnp.asarray(codes)))
    # Row 0 pairs with row 2: (3 & 15) | (-8 << 4) = 3 - 128 = -125.
    assert packed[0, 0] == np.int8((3 & 15) | np.int32(-8 << 4))
    assert packed[1, 0] == np.int8((-2 & 15) | np.int32(7 << 4))


def test_pack_nibbles_odd_rows_rejected():
    with pytest.raises(ValueError, match="even row count"):
        quantization.pack_nibbles(jnp.zeros((3, 8), jnp.int8))


@pytest.mark.parametrize("threshold", [None, 0.2])
def test_quantize_bits4_host_device_agree(threshold):
    rng = np.random.RandomState(1)
    v = rng.normal(size=(256, 32)).astype(np.float32)
    hs, hq = quantization.quantize_rows(v, threshold, bits=4)
    ds, dq = quantization.quantize_rows_device(
        jnp.asarray(v), threshold, bits=4
    )
    assert np.abs(hq).max() <= 7 and np.abs(np.asarray(dq)).max() <= 7
    # Rounding ties may flip a code by one; compare dequantized values.
    np.testing.assert_allclose(
        hs[:, None] * hq,
        np.asarray(ds)[:, None] * np.asarray(dq),
        atol=np.abs(v).max() / 7 + 1e-6,
    )


def test_bucketed_kernel_packed4_matches_oracle():
    queries, corpus = _data(1024, 128, 16, seed=2)
    scales, codes = quantization.quantize_rows_device(corpus, 0.2, bits=4)
    packed = quantization.pack_nibbles(codes)
    k = 10
    vals, ids = scoring.bucketed_top_k(
        queries, packed, k, buckets=256, chunk=512, interpret=True,
        scales=scales, packed4=True, valid_rows=1024,
    )
    rvals, rids = scoring.bucketed_top_k_reference(
        queries, packed, k, buckets=256, scales=scales, packed4=True,
        valid_rows=1024,
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(rids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rvals), rtol=1e-4, atol=1e-4
    )
    # Dequantized scores approximate exact dot products (int4 is noisy).
    exact = np.asarray(queries) @ np.asarray(corpus).T
    got = np.take_along_axis(exact, np.asarray(ids), axis=1)
    np.testing.assert_allclose(np.asarray(vals), got, rtol=0.5, atol=3.0)


def test_bucketed_kernel_packed4_padded_corpus():
    """Padding baked in at pack time is masked via valid_rows."""
    queries, corpus = _data(700, 128, 8, seed=3)
    chunk = 512
    padded = scoring.pad_to_multiple(corpus, chunk)
    scales, codes = quantization.quantize_rows_device(padded, None, bits=4)
    packed = quantization.pack_nibbles(codes)
    vals, ids = scoring.bucketed_top_k(
        queries, packed, 700, buckets=256, chunk=chunk, interpret=True,
        scales=scales, packed4=True, valid_rows=700,
    )
    assert np.asarray(ids).max() < 700
    rvals, rids = scoring.bucketed_top_k_reference(
        queries, packed, 700, buckets=256, scales=scales, packed4=True,
        valid_rows=700,
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(rids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rvals), rtol=1e-4, atol=1e-4
    )


def test_bucketed_packed4_validation():
    queries, corpus = _data(512, 128, 8)
    scales, codes = quantization.quantize_rows_device(corpus, None, bits=4)
    packed = quantization.pack_nibbles(codes)
    with pytest.raises(ValueError, match="valid_rows"):
        scoring.bucketed_top_k(
            queries, packed, 10, buckets=256, chunk=512,
            scales=scales, packed4=True,
        )
    with pytest.raises(ValueError, match="per-row scales"):
        scoring.bucketed_scores(
            queries, packed, buckets=256, chunk=512, packed4=True,
            valid_rows=512,
        )
    with pytest.raises(ValueError, match="divide chunk/2"):
        scoring.bucketed_scores(
            queries, packed, buckets=512, chunk=512, scales=scales,
            packed4=True, valid_rows=512,
        )


def test_bucketed_layer_int4_recall():
    queries, corpus = _data(4000, 128, 32, seed=4)
    exact = np.asarray(queries) @ np.asarray(corpus).T
    exact_ids = np.argsort(-exact, axis=1)[:, :10]
    index = ftk.Bucketed(k=10, buckets=1024, quantize="int4").index(corpus)
    _, ids = index(queries)
    overlap = np.mean(
        [
            len(np.intersect1d(exact_ids[i], np.asarray(ids)[i])) / 10
            for i in range(32)
        ]
    )
    # int4 is quantization-limited; well above chance but below int8.
    assert overlap > 0.7, overlap
    with pytest.raises(ValueError, match="divide"):
        ftk.Bucketed(quantize="int4", buckets=2048, chunk=2048)
    with pytest.raises(ValueError, match="quantize must be"):
        ftk.Bucketed(quantize="int2")


def test_leaf_kernel_packed4_matches_reference():
    rng = np.random.RandomState(5)
    embs = rng.normal(size=(8, 256, 128)).astype(np.float32)
    scales, codes = quantization.quantize_rows(embs, 0.2, bits=4)
    packed = quantization.pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (8, 128, 128)
    queries = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    probes = jnp.asarray(rng.randint(0, 8, size=(16, 3)).astype(np.int32))
    got = leaf_scoring.probed_leaf_scores(
        queries, packed, jnp.asarray(scales), probes, interpret=True,
        packed4=True,
    )
    want = leaf_scoring.probed_scores_reference(
        queries, packed, jnp.asarray(scales), probes, packed4=True,
    )
    assert got.shape == (16, 3 * 256)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("query_tile", [1, 8])
def test_bucketed_leaf_kernel_packed4_matches_reference(query_tile):
    rng = np.random.RandomState(6)
    embs = rng.normal(size=(8, 256, 128)).astype(np.float32)
    scales, codes = quantization.quantize_rows(embs, None, bits=4)
    packed = quantization.pack_nibbles(jnp.asarray(codes))
    rows = rng.permutation(8 * 256).astype(np.int32).reshape(8, 256)
    rows[:, -5:] = -1
    rows = jnp.asarray(rows)
    qn = 16
    queries = jnp.asarray(rng.normal(size=(qn, 128)).astype(np.float32))
    probes = jnp.asarray(
        rng.randint(0, 8, size=(qn // query_tile, 4)).astype(np.int32)
    )
    vk, rk = leaf_scoring.probed_bucketed_scores(
        queries, packed, jnp.asarray(scales), rows, probes, buckets=128,
        query_tile=query_tile, interpret=True, packed4=True,
    )
    vr, rr = leaf_scoring.probed_bucketed_reference(
        queries, packed, jnp.asarray(scales), rows, probes, buckets=128,
        query_tile=query_tile, packed4=True,
    )
    np.testing.assert_allclose(
        np.asarray(vk), np.asarray(vr), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(rr))


@pytest.mark.parametrize("bucketed", [False, True])
def test_scann_int4_with_reorder_recall(bucketed):
    """int4 scan → exact reorder cascade: recall recovers to near the
    reorder dtype's level (ScaNN's production recipe)."""
    rng = np.random.RandomState(7)
    corpus = rng.normal(size=(4000, 128)).astype(np.float32)
    queries = rng.normal(size=(32, 128)).astype(np.float32)
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=16, quantize="int4",
        num_reordering_candidates=100,
        scoring_buckets=256 if bucketed else None,
    )
    index.index(corpus)
    _, ids = index(jnp.asarray(queries))
    hits = sum(
        len(set(np.asarray(ids)[i]) & set(exact[i]))
        for i in range(queries.shape[0])
    )
    assert hits / exact.size > 0.95, hits / exact.size


def test_scann_int4_leaf_capacity_grain():
    """int4 leaf capacity lands on the 256 grid (packed half on 128)."""
    rng = np.random.RandomState(8)
    corpus = rng.normal(size=(1000, 128)).astype(np.float32)
    index = approximate.ScaNN(
        k=10, num_leaves=4, num_leaves_to_search=4, quantize="int4"
    )
    index.index(corpus)
    assert index._leaf_embs.shape[1] % 128 == 0
    assert (index._leaf_embs.shape[1] * 2) % 256 == 0
    assert index._leaf_scales.shape[1] == index._leaf_embs.shape[1] * 2
    with pytest.raises(ValueError, match="quantize must be"):
        approximate.ScaNN(quantize="int2")
