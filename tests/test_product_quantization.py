"""Tests for ops/product_quantization (LUT16-style learned-codebook AH).

Covers: codebook training convergence, encode/pack round-trips, MXU
one-hot scoring vs explicit decode, full-scan top-k recall vs exact
search, per-row scale handling, and the head-to-head against the scalar
int4 quantizer at matched bits (the docs/PARITY.md measurement's
correctness twin).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_tpu.ops import product_quantization as pq
from recommenders_tpu.ops import quantization as qz


def _clustered(rng, n, d, num_clusters=40, spread=0.3):
    centers = rng.normal(size=(num_clusters, d)).astype(np.float32)
    x = centers[rng.randint(0, num_clusters, n)]
    return (x + spread * rng.normal(size=(n, d))).astype(np.float32)


def _recall(pred_ids, true_ids):
    k = true_ids.shape[1]
    hits = 0
    for i in range(true_ids.shape[0]):
        hits += len(set(np.asarray(pred_ids[i])) & set(np.asarray(true_ids[i])))
    return hits / (true_ids.shape[0] * k)


class TestCodebooks:
    def test_exact_on_separable_data(self):
        # Corpus rows drawn from exactly 16 distinct values per subspace
        # → k-means must reach zero reconstruction error.
        rng = np.random.RandomState(0)
        levels = rng.normal(size=(4, 16, 2)).astype(np.float32)  # S=4, ds=2
        picks = rng.randint(0, 16, size=(2000, 4))
        x = levels[np.arange(4)[None], picks].reshape(2000, 8)
        cb = pq.train_codebooks(x, num_subspaces=4, iterations=15, block=512)
        codes = pq.encode(x, cb)
        recon = np.asarray(pq.decode(codes, cb))
        np.testing.assert_allclose(recon, x, atol=1e-5)

    def test_error_decreases_with_iterations(self):
        rng = np.random.RandomState(1)
        x = _clustered(rng, 4096, 16)
        def err(iters):
            cb = pq.train_codebooks(
                x, 8, iterations=iters, rng=jax.random.PRNGKey(3),
                block=2048,
            )
            r = np.asarray(pq.decode(pq.encode(x, cb), cb))
            return float(np.mean(np.square(r - x)))
        assert err(12) <= err(1) * 1.0001

    def test_block_size_invariance(self):
        rng = np.random.RandomState(2)
        x = _clustered(rng, 3000, 8)
        key = jax.random.PRNGKey(7)
        cb_a = pq.train_codebooks(x, 4, iterations=4, rng=key, block=512)
        cb_b = pq.train_codebooks(x, 4, iterations=4, rng=key, block=3000)
        np.testing.assert_allclose(
            np.asarray(cb_a), np.asarray(cb_b), rtol=1e-4, atol=1e-5
        )

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="subspaces"):
            pq.train_codebooks(np.zeros((100, 10), np.float32), 4)


class TestCodes:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.RandomState(3)
        codes = rng.randint(0, 16, size=(257, 6)).astype(np.int8)
        packed = pq.pack_codes(jnp.asarray(codes))
        assert packed.shape == (257, 3)
        np.testing.assert_array_equal(
            np.asarray(pq.unpack_codes(packed)), codes
        )

    def test_pack_odd_subspaces_raises(self):
        with pytest.raises(ValueError, match="even"):
            pq.pack_codes(jnp.zeros((4, 3), jnp.int8))

    def test_encode_chunked_matches_unchunked(self):
        rng = np.random.RandomState(4)
        x = _clustered(rng, 1030, 8)
        cb = pq.train_codebooks(x, 4, iterations=3, block=512)
        a = pq.encode(x, cb, chunk=256)
        b = pq.encode(x, cb, chunk=4096)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestScoring:
    def test_score_block_matches_decode_matmul(self):
        rng = np.random.RandomState(5)
        x = _clustered(rng, 512, 16)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        cb = pq.train_codebooks(x, 8, iterations=4, block=512)
        codes = pq.encode(x, cb)
        lut = pq.query_lut(q, cb)
        got = np.asarray(pq.score_block(lut, pq.pack_codes(codes)))
        want = q @ np.asarray(pq.decode(codes, cb)).T
        # bf16 rounding on the LUT side: |err| ≤ S · 2⁻⁸ · max|lut|.
        tol = 8 * 2.0 ** -8 * float(np.abs(np.asarray(lut)).max())
        np.testing.assert_allclose(got, want, rtol=0, atol=tol)

    def test_top_k_exact_merge_matches_reconstructed_search(self):
        rng = np.random.RandomState(6)
        n, d, k = 2048, 16, 8
        x = _clustered(rng, n, d)
        q = _clustered(rng, 16, d)
        cb = pq.train_codebooks(x, 8, iterations=5, block=1024)
        codes = pq.encode(x, cb)
        recon = jnp.asarray(pq.decode(codes, cb))
        ev, ei = jax.lax.top_k(jnp.asarray(q) @ recon.T, k)
        pv, pi = pq.pq_top_k(
            jnp.asarray(q), pq.pack_codes(codes), cb, k,
            chunk=512, exact_merge=True,
        )
        # Same candidate set (ties may reorder within equal scores).
        assert _recall(np.asarray(pi), np.asarray(ei)) >= 0.99
        np.testing.assert_allclose(
            np.sort(np.asarray(pv)), np.sort(np.asarray(ev)),
            rtol=0, atol=6e-2,
        )

    def test_top_k_bucketed_padding_and_scales(self):
        rng = np.random.RandomState(7)
        n, d, k = 1500, 16, 10
        x = _clustered(rng, n, d)
        q = _clustered(rng, 12, d)
        scales, xn = pq.normalize_rows(x, "max")
        cb = pq.train_codebooks(np.asarray(xn), 8, iterations=5, block=1024)
        codes = pq.encode(xn, cb)
        packed = pq.pack_codes(codes)
        pad = (-n) % 512
        packed_p = jnp.pad(packed, ((0, pad), (0, 0)))
        scales_p = jnp.pad(scales, (0, pad))
        pv, pi = pq.pq_top_k(
            jnp.asarray(q), packed_p, cb, k, row_scales=scales_p,
            valid_rows=n, buckets=256, chunk=512,
        )
        assert int(np.asarray(pi).max()) < n
        recon = np.asarray(pq.decode(codes, cb)) * np.asarray(scales)[:, None]
        ev, ei = jax.lax.top_k(jnp.asarray(q) @ jnp.asarray(recon).T, k)
        # Bucketed selection only loses top-k items that collide in a
        # bucket; with k=10, B=256 the expected loss is tiny.
        assert _recall(np.asarray(pi), np.asarray(ei)) >= 0.9

    def test_normalize_rows_modes(self):
        rng = np.random.RandomState(8)
        x = rng.normal(size=(64, 8)).astype(np.float32) * 5
        for mode in ("max", "l2", None):
            s, xn = pq.normalize_rows(x, mode)
            np.testing.assert_allclose(
                np.asarray(xn) * np.asarray(s)[:, None], x, rtol=1e-5
            )
        with pytest.raises(ValueError, match="normalize"):
            pq.normalize_rows(x, "bogus")


class TestVsScalarInt4:
    def test_learned_grids_beat_uniform_at_matched_bits(self):
        """ds=1 PQ on max-normalized rows vs scalar int4: same storage
        (per-row scale + 4 bits/dim), learned cells — reconstruction
        must not be worse."""
        rng = np.random.RandomState(9)
        x = _clustered(rng, 8192, 16)
        i4_scales, i4_codes = qz.quantize_rows(x, None, bits=4)
        recon_i4 = i4_codes.astype(np.float32) * i4_scales[:, None]
        err_i4 = float(np.mean(np.square(recon_i4 - x)))

        scales, xn = pq.normalize_rows(x, "max")
        cb = pq.train_codebooks(
            np.asarray(xn), 16, iterations=20, block=4096
        )
        codes = pq.encode(xn, cb)
        recon = (
            np.asarray(pq.decode(codes, cb))
            * np.asarray(scales)[:, None]
        )
        err_pq = float(np.mean(np.square(recon - x)))
        assert err_pq <= err_i4 * 1.05, (err_pq, err_i4)

    def test_half_bit_config_recall_with_reorder_budget(self):
        """ds=2 (2 bits/dim) halves index bytes; its top-R candidates
        must still contain most of the exact top-k (the reorder pass
        then recovers exact ordering — ScaNN's production recipe)."""
        rng = np.random.RandomState(10)
        n, d, k, r = 4096, 32, 10, 100
        x = _clustered(rng, n, d)
        q = _clustered(rng, 32, d)
        ev, ei = jax.lax.top_k(jnp.asarray(q) @ jnp.asarray(x).T, k)
        scales, xn = pq.normalize_rows(x, "max")
        cb = pq.train_codebooks(np.asarray(xn), 16, iterations=10,
                                block=2048)
        packed = pq.pack_codes(pq.encode(xn, cb))
        pv, pi = pq.pq_top_k(
            jnp.asarray(q), packed, cb, r, row_scales=scales,
            buckets=512, chunk=1024,
        )
        assert _recall(np.asarray(pi), np.asarray(ei)) >= 0.85
