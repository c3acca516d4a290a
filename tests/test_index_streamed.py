"""Streaming Bucketed index build (`index_streamed`).

The streamed build writes each batch into the preallocated storage
buffer (quantizing on the fly), so the full-precision corpus never
exists on device — the path that lets a 100M×128 corpus build in the
int4 index's 6.4 GB. Per-row quantization is row-local, so a streamed
build must produce bit-identical query results to the monolithic
`index` on the same rows.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import factorized_top_k as ftk


def _corpus(n=700, d=128, seed=0):
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def _batches(corpus, size):
    return [corpus[i:i + size] for i in range(0, corpus.shape[0], size)]


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(corpus_dtype=jnp.bfloat16),
        dict(quantize="int8"),
        dict(quantize="int4", buckets=256, chunk=512),
        dict(quantize="int8", anisotropic_quantization_threshold=None),
    ],
    ids=["f32", "bf16", "int8", "int4", "int8-absmax"],
)
@pytest.mark.parametrize("batch", [128, 256, 700])
def test_streamed_matches_monolithic(kwargs, batch):
    corpus = _corpus()
    queries = jnp.asarray(_corpus(16, seed=1))
    mono = ftk.Bucketed(k=10, **kwargs).index(corpus)
    streamed = ftk.Bucketed(k=10, **kwargs).index_streamed(
        _batches(corpus, batch), num_rows=corpus.shape[0]
    )
    mv, mi = mono(queries)
    sv, si = streamed(queries)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(si))
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(sv))


def test_streamed_int4_batch_straddles_half_boundary():
    """The packed-nibble half boundary (padded_n/2) falls mid-batch."""
    corpus = _corpus(n=1000)
    # chunk=512 → stored 1024, half=512; batches of 384 straddle at 512.
    index = ftk.Bucketed(
        k=10, quantize="int4", buckets=256, chunk=512
    ).index_streamed(_batches(corpus, 384), num_rows=1000)
    mono = ftk.Bucketed(
        k=10, quantize="int4", buckets=256, chunk=512
    ).index(corpus)
    queries = jnp.asarray(_corpus(8, seed=2))
    np.testing.assert_array_equal(
        np.asarray(index(queries)[1]), np.asarray(mono(queries)[1])
    )
    # Packed codes agree exactly (scales of baked-in padding rows may
    # differ: the monolithic path quantizes the zero padding, the
    # streamed one never writes it — both are masked by valid_rows).
    np.testing.assert_array_equal(
        np.asarray(index._candidates), np.asarray(mono._candidates)
    )
    valid = 1000
    np.testing.assert_array_equal(
        np.asarray(index._scales)[:valid], np.asarray(mono._scales)[:valid]
    )


def test_streamed_identifiers_and_callable():
    corpus = _corpus(n=300)
    ids = np.arange(1000, 1300, dtype=np.int32)
    index = ftk.Bucketed(k=5, quantize="int8").index_streamed(
        lambda: iter(_batches(corpus, 100)), num_rows=300,
        identifiers=ids,
    )
    _, got = index(jnp.asarray(_corpus(4, seed=3)))
    assert np.asarray(got).min() >= 1000


def test_streamed_validation_errors():
    corpus = _corpus(n=256)
    with pytest.raises(ValueError, match="num_rows"):
        ftk.Bucketed().index_streamed(_batches(corpus, 128), num_rows=200)
    with pytest.raises(ValueError, match="expected num_rows"):
        ftk.Bucketed().index_streamed(_batches(corpus, 128), num_rows=300)
    with pytest.raises(ValueError, match="must not be empty"):
        ftk.Bucketed().index_streamed([], num_rows=0)
    with pytest.raises(ValueError, match="identifiers rows"):
        ftk.Bucketed().index_streamed(
            _batches(corpus, 128), num_rows=256,
            identifiers=np.arange(10),
        )
    with pytest.raises(ValueError, match="multiple of 128"):
        ftk.Bucketed().index_streamed(
            [np.zeros((4, 96), np.float32)], num_rows=4
        )
