"""Serving-export tests: StableHLO round-trips for model fns and indexes
(the reference's SavedModel save/load equality tests,
layers/factorized_top_k_test.py:71-83)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.utils import export as export_lib


def _data(n, d, q, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.normal(size=(q, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
    )


def test_fn_roundtrip(tmp_path):
    def score(q, c):
        return q @ c.T

    queries, corpus = _data(64, 16, 8)
    path = str(tmp_path / "fn")
    export_lib.export_fn(path, score, queries, corpus)
    served = export_lib.load_fn(path)
    np.testing.assert_allclose(
        np.asarray(served(queries, corpus)),
        np.asarray(score(queries, corpus)),
        rtol=1e-5,
    )


@pytest.mark.parametrize("n", [512, 500])  # Padded corpus too.
def test_brute_force_index_roundtrip(tmp_path, n):
    queries, corpus = _data(n, 32, 8)
    identifiers = jnp.asarray(np.arange(n, dtype=np.int64) * 7)
    index = factorized_top_k.BruteForce(k=10).index(corpus, identifiers)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "bf")
    export_lib.export_index(path, index, queries, k=10)
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-5
    )


def test_bucketed_index_roundtrip(tmp_path):
    queries, corpus = _data(1024, 128, 8, seed=1)
    index = factorized_top_k.Bucketed(
        k=10, buckets=512, chunk=512
    ).index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "bk")
    export_lib.export_index(path, index, queries, k=10)
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )


def test_bucketed_index_export_keeps_serving_config(tmp_path):
    """Regression: a Bucketed index configured with a non-default
    query_tile and a bf16 corpus (the documented B=4096 VMEM recipe) must
    export that config — previously the export silently reverted to
    query_tile=256 / f32 and could exceed VMEM at serve time."""
    queries, corpus = _data(1024, 128, 8, seed=5)
    index = factorized_top_k.Bucketed(
        k=10, buckets=512, chunk=512, query_tile=128,
        corpus_dtype=jnp.bfloat16,
    ).index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "bk16")
    export_lib.export_index(path, index, queries, k=10)
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    # bf16 scoring in the export must match the index's own bf16 path.
    np.testing.assert_allclose(
        np.asarray(scores, np.float32),
        np.asarray(expected_scores, np.float32),
        rtol=1e-2,
    )


def test_export_unbuilt_raises(tmp_path):
    index = factorized_top_k.BruteForce(k=5)
    with pytest.raises(ValueError, match="built"):
        export_lib.export_index(
            str(tmp_path / "x"), index, jnp.zeros((2, 8)), k=5
        )


def test_export_model_forward(tmp_path):
    """A trained model's query tower exports and serves standalone."""
    import optax

    from recommenders_tpu import data as data_lib
    from recommenders_tpu import models as models_lib

    ds = data_lib.synthetic_movielens(
        num_users=50, num_movies=80, num_interactions=2000, seed=2
    )
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(50, 16),
        candidate_tower=lambda: models_lib.EmbeddingTower(80, 16),
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    sample = next(data_lib.batched(ds.as_dict(), 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, _ = trainer.train_step(state, sample)

    params = jax.device_get(state.params)

    def query_tower(user_ids):
        return model.apply(
            {"params": params},
            {"user_id": user_ids},
            method="query_embeddings",
        )

    path = str(tmp_path / "tower")
    user_ids = jnp.asarray([1, 2, 3], jnp.int32)
    export_lib.export_fn(path, query_tower, user_ids)
    served = export_lib.load_fn(path)
    np.testing.assert_allclose(
        np.asarray(served(user_ids)),
        np.asarray(query_tower(user_ids)),
        rtol=1e-5,
    )


def test_scann_index_roundtrip(tmp_path):
    """ScaNN serializes alongside its partition arrays (the reference's
    ScaNN-in-SavedModel export)."""
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(2000, 64, 8, seed=3)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=4, quantize=True
    )
    index.index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "scann")
    export_lib.export_index(path, index, queries, k=10)
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_scann_unquantized_roundtrip(tmp_path):
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(800, 32, 4, seed=4)
    index = approximate.ScaNN(k=5, num_leaves=8, num_leaves_to_search=8)
    index.index(corpus)
    _, expected_ids = index(queries)
    path = str(tmp_path / "scann2")
    export_lib.export_index(path, index, queries, k=5)
    _, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )


def test_bucketed_quantized_index_roundtrip(tmp_path):
    queries, corpus = _data(1024, 128, 8, seed=9)
    index = factorized_top_k.Bucketed(
        k=10, buckets=512, chunk=512, quantize=True
    ).index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "bkq")
    export_lib.export_index(path, index, queries, k=10)
    data = np.load(str(tmp_path / "bkq" / "arrays.npz"))
    assert data["candidates"].dtype == np.int8
    assert "scales" in data.files
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-5
    )


def test_scann_reorder_roundtrip(tmp_path):
    """The exported ScaNN computation carries the exact-reorder pass
    (the reference serializes the full searcher incl. reordering,
    layers/factorized_top_k.py:728-730)."""
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(2000, 64, 8, seed=21)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=8, quantize=True,
        num_reordering_candidates=50,
    )
    index.index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "scann_r")
    export_lib.export_index(path, index, queries, k=10)
    scores, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_scann_bf16_leaves_roundtrip(tmp_path):
    """bf16 leaf/reorder arrays survive the npz round-trip (stored as
    uint16 views) and the served computation takes bf16 args directly —
    no serve-time f32 inflation."""
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(1500, 64, 8, seed=22)
    index = approximate.ScaNN(
        k=10, num_leaves=8, num_leaves_to_search=8,
        leaf_dtype=jnp.bfloat16, reorder_dtype=jnp.bfloat16,
        num_reordering_candidates=40,
    )
    index.index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "scann_bf16")
    export_lib.export_index(path, index, queries, k=10)
    raw = np.load(str(tmp_path / "scann_bf16" / "arrays.npz"))
    assert raw["leaf_embs"].dtype == np.uint16
    assert raw["corpus"].dtype == np.uint16
    scores, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_scann_soar_roundtrip(tmp_path):
    """SOAR indexes export with the duplicate-removal search path."""
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(2000, 64, 8, seed=23)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=4, soar_lambda=1.5,
        quantize=True, num_reordering_candidates=40,
    )
    index.index(jnp.asarray(corpus))
    expected_scores, expected_ids = index(jnp.asarray(queries))

    path = str(tmp_path / "scann_soar")
    export_lib.export_index(path, index, queries, k=10)
    scores, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_scann_bucketed_tile_roundtrip(tmp_path):
    """scoring_buckets + probe_tile indexes export with the bucketed
    search path (incl. query padding to the tile width)."""
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(3000, 128, 8, seed=24)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=8,
        scoring_buckets=512, probe_tile=4, quantize=True,
    )
    index.index(jnp.asarray(corpus))
    expected_scores, expected_ids = index(jnp.asarray(queries))

    path = str(tmp_path / "scann_bkt")
    export_lib.export_index(path, index, queries, k=10)
    scores, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_bucketed_int4_index_roundtrip(tmp_path):
    queries, corpus = _data(1000, 128, 8, seed=33)
    index = factorized_top_k.Bucketed(
        k=10, buckets=256, chunk=512, quantize="int4"
    ).index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "bk4")
    export_lib.export_index(path, index, queries, k=10)
    data = np.load(str(tmp_path / "bk4" / "arrays.npz"))
    # Packed: padded 1024 rows -> 512 stored bytes per dim column.
    assert data["candidates"].dtype == np.int8
    assert data["candidates"].shape[0] == 512
    assert data["scales"].shape[0] == 1024
    served = export_lib.load_index(path)
    scores, ids = served(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-5
    )


def test_scann_int4_reorder_roundtrip(tmp_path):
    from recommenders_tpu.layers import approximate

    queries, corpus = _data(2000, 128, 8, seed=34)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=8, quantize="int4",
        num_reordering_candidates=50,
    )
    index.index(corpus)
    expected_scores, expected_ids = index(queries)

    path = str(tmp_path / "scann4")
    export_lib.export_index(path, index, queries, k=10)
    data = np.load(str(tmp_path / "scann4" / "arrays.npz"))
    assert data["leaf_embs"].dtype == np.int8
    assert data["leaf_scales"].shape[1] == data["leaf_embs"].shape[1] * 2
    scores, ids = export_lib.load_index(path)(queries)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(expected_ids)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected_scores), rtol=1e-4
    )


def test_export_records_kept_args_for_raw_mlir_hosts(tmp_path):
    """jax.export drops unused arguments from the module signature (a
    no-reorder ScaNN never reads leaf_rows); raw-MLIR hosts must feed
    only the kept operands or they bind off by one and fault the
    device (round-4 native-serving bug). The export persists
    `module_kept_var_idx` as kept_args.json."""
    import json

    import jax.numpy as jnp

    from recommenders_tpu.utils import export as export_lib

    def fn(queries, used, unused):
        return queries @ used.T

    q = np.ones((4, 8), np.float32)
    used = np.ones((6, 8), np.float32)
    unused = np.ones((5,), np.int32)
    export_lib.export_fn(str(tmp_path), fn, jnp.asarray(q), used, unused)
    kept = set(json.load(open(tmp_path / "kept_args.json")))
    assert 0 in kept and 1 in kept and 2 not in kept, kept
    # The module signature really does carry only the kept args.
    text = open(tmp_path / "module.mlir").read()
    sig = next(
        line for line in text.splitlines() if "func public @main" in line
    )
    assert sig.count("%arg") == 2, sig
    assert "5xi32" not in sig, sig
    # The serve-side filter drops the unused operand.
    args = [used, unused]
    filtered = [a for i, a in enumerate(args, start=1) if i in kept]
    assert len(filtered) == 1 and filtered[0] is used


def test_bf16_export_arrays_restore_for_native_host(tmp_path):
    """A bf16-corpus Bucketed export must reach the native host as
    REAL bf16 tensors: `_save_arrays` persists bf16 as uint16 views,
    and `serve_exported_index` must restore them before writing the
    host tensor file (a raw np.load would bind a U16 operand against a
    bf16 module input)."""
    import ml_dtypes

    from recommenders_tpu.layers import factorized_top_k
    from recommenders_tpu.utils import export as export_lib
    from recommenders_tpu.utils import native_serving as ns

    rng = np.random.RandomState(0)
    corpus = jnp.asarray(rng.normal(size=(2048, 128)), jnp.float32)
    queries = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    index = factorized_top_k.Bucketed(
        k=5, buckets=512, chunk=512, corpus_dtype=jnp.bfloat16
    ).index(corpus)
    path = str(tmp_path / "bf16idx")
    export_lib.export_index(path, index, queries, k=5)

    data = export_lib._load_arrays(path)
    assert data["candidates"].dtype == ml_dtypes.bfloat16

    # The host tensor wire format round-trips bf16 (dtype code 3).
    tpath = str(tmp_path / "t.bin")
    ns.write_tensors(tpath, [data["candidates"][:4]])
    (back,) = ns.read_tensors(tpath)
    assert back.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        back.view(np.uint16), data["candidates"][:4].view(np.uint16)
    )

    # In-process load serves the exported bf16 computation.
    serve = export_lib.load_index(path)
    s, ids = serve(queries)
    want_s, want_i = index(queries)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_i))
