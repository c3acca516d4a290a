"""Tests for data.preprocessing (Normalization / Discretization /
TextVectorization counterparts, ref featurization.ipynb)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.data import preprocessing as pp


class TestNormalizer:
    def test_adapt_standardizes(self):
        rng = np.random.RandomState(0)
        values = rng.normal(37.0, 5.0, size=10_000)
        norm = pp.Normalizer.adapt(values)
        out = norm(values)
        assert abs(float(out.mean())) < 1e-6
        assert abs(float(out.std()) - 1.0) < 1e-6

    def test_constant_feature_does_not_divide_by_zero(self):
        norm = pp.Normalizer.adapt(np.full(10, 3.0))
        np.testing.assert_allclose(norm(np.full(4, 3.0)), np.zeros(4))

    def test_jittable_and_matches_host(self):
        norm = pp.Normalizer.adapt(np.arange(100.0))
        x = np.linspace(-5.0, 120.0, 64).astype(np.float32)
        host = norm(x)
        dev = jax.jit(norm)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6)


class TestDiscretizer:
    def test_quantile_buckets_are_balanced(self):
        rng = np.random.RandomState(1)
        values = rng.exponential(size=100_000)
        disc = pp.Discretizer.adapt(values, num_bins=10)
        assert disc.num_bins == 10
        ids = disc(values)
        counts = np.bincount(ids, minlength=10)
        assert counts.min() > 0.08 * len(values)
        assert counts.max() < 0.12 * len(values)

    def test_out_of_range_values_clamp_to_edge_bins(self):
        disc = pp.Discretizer.adapt(np.arange(1000.0), num_bins=4)
        ids = disc(np.array([-1e9, 1e9]))
        assert ids[0] == 0 and ids[1] == disc.num_bins - 1

    def test_jit_matches_host_oracle(self):
        rng = np.random.RandomState(2)
        disc = pp.Discretizer.adapt(rng.normal(size=5000), num_bins=16)
        x = rng.normal(size=256).astype(np.float32)
        host = disc(x)
        dev = jax.jit(disc)(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(dev), host)
        oracle = np.searchsorted(
            np.asarray(disc.boundaries), x.astype(np.float64), side="right"
        )
        np.testing.assert_array_equal(host, oracle)

    def test_rejects_single_bin(self):
        with pytest.raises(ValueError):
            pp.Discretizer.adapt(np.arange(10.0), num_bins=1)


class TestTextVectorizer:
    CORPUS = [
        "The Shawshank Redemption",
        "The Godfather",
        "The Godfather: Part II",
        "Pulp Fiction!",
    ]

    def test_standardize_lowercases_and_strips_punctuation(self):
        assert pp.standardize("The Godfather: Part II!") == (
            "the godfather part ii"
        )

    def test_vocab_is_frequency_ordered_with_reserved_ids(self):
        vec = pp.TextVectorizer.adapt(self.CORPUS)
        assert vec.vocabulary[0] == "the"  # most frequent
        assert vec.vocabulary[1] == "godfather"
        assert vec.vocab_size == len(vec.vocabulary) + 2

    def test_encode_pads_truncates_and_maps_oov(self):
        vec = pp.TextVectorizer.adapt(self.CORPUS)
        ids = vec(["The Godfather", "totally unseen words"], 4)
        assert ids.shape == (2, 4) and ids.dtype == np.int32
        # "the godfather" -> two real tokens then padding.
        assert ids[0, 0] == 2 + vec.vocabulary.index("the")
        assert ids[0, 1] == 2 + vec.vocabulary.index("godfather")
        assert tuple(ids[0, 2:]) == (pp.PAD_ID, pp.PAD_ID)
        # unseen tokens -> OOV id, then padding.
        assert tuple(ids[1]) == (
            pp.TEXT_OOV_ID,
            pp.TEXT_OOV_ID,
            pp.TEXT_OOV_ID,
            pp.PAD_ID,
        )

    def test_max_tokens_counts_reserved_ids(self):
        vec = pp.TextVectorizer.adapt(self.CORPUS, max_tokens=4)
        assert len(vec.vocabulary) == 2  # 4 - pad - oov
        with pytest.raises(ValueError):
            pp.TextVectorizer.adapt(self.CORPUS, max_tokens=2)

    def test_bytes_inputs(self):
        vec = pp.TextVectorizer.adapt([b"Alpha Beta", "alpha"])
        assert vec.vocabulary[0] == "alpha"


class TestMaskedMean:
    def test_ignores_padding_and_is_jittable(self):
        token_ids = jnp.array([[2, 3, 0, 0], [0, 0, 0, 0]])
        emb = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
        out = jax.jit(pp.masked_mean)(emb, token_ids)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray((emb[0, 0] + emb[0, 1]) / 2.0)
        )
        np.testing.assert_allclose(np.asarray(out[1]), np.zeros(3))

    def test_matches_unmasked_mean_when_full(self):
        rng = np.random.RandomState(3)
        emb = jnp.asarray(rng.normal(size=(5, 7, 4)).astype(np.float32))
        ids = jnp.ones((5, 7), jnp.int32)
        np.testing.assert_allclose(
            np.asarray(pp.masked_mean(emb, ids)),
            np.asarray(emb.mean(axis=1)),
            rtol=1e-6,
        )
