"""Tests for the sharded embedding engine.

Mirrors the reference's `tpu_embedding_layer_test.py` strategy: exercise
the same API on CPU (feature shapes, combiners, optimizers, train+eval),
plus mesh-sharded parity checks on the virtual 8-device mesh.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from recommenders_tpu import embedding as emb_lib
from recommenders_tpu import parallel
from recommenders_tpu.ops import hashing

PAD = emb_lib.PAD_ID


def _configs(combiner="mean"):
    user = emb_lib.TableConfig(100, 8, name="user", combiner=combiner)
    movie = emb_lib.TableConfig(200, 8, name="movie", combiner=combiner)
    return (
        emb_lib.FeatureConfig(user, name="user_id"),
        emb_lib.FeatureConfig(movie, name="movie_id"),
        emb_lib.FeatureConfig(movie, name="history"),  # shares movie table
    )


def test_scalar_and_multivalent_lookup_match_numpy():
    module = emb_lib.TpuEmbedding(
        feature_configs=_configs("sum"), shard_tables=False
    )
    feats = {
        "user_id": jnp.asarray([1, 2, 3]),
        "movie_id": jnp.asarray([5, 6, 7]),
        "history": jnp.asarray([[1, 2, PAD], [3, PAD, PAD], [4, 5, 6]]),
    }
    params = module.init(jax.random.PRNGKey(0), feats)
    out = module.apply(params, feats)

    user_t = np.asarray(params["params"]["user"])
    movie_t = np.asarray(params["params"]["movie"])
    np.testing.assert_allclose(
        np.asarray(out["user_id"]), user_t[[1, 2, 3]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["movie_id"]), movie_t[[5, 6, 7]], rtol=1e-6
    )
    expected_hist = np.stack(
        [
            movie_t[1] + movie_t[2],
            movie_t[3],
            movie_t[4] + movie_t[5] + movie_t[6],
        ]
    )
    np.testing.assert_allclose(
        np.asarray(out["history"]), expected_hist, rtol=1e-5
    )


@pytest.mark.parametrize("combiner", ["sum", "mean", "sqrtn"])
def test_combiners_with_weights(combiner):
    table = emb_lib.TableConfig(50, 4, name="t", combiner=combiner)
    module = emb_lib.TpuEmbedding(
        feature_configs=(emb_lib.FeatureConfig(table, name="f"),),
        shard_tables=False,
    )
    ids = jnp.asarray([[1, 2, PAD]])
    weights = jnp.asarray([[0.5, 2.0, 9.0]])  # PAD weight must be ignored
    params = module.init(jax.random.PRNGKey(1), {"f": (ids, weights)})
    out = np.asarray(module.apply(params, {"f": (ids, weights)})["f"])

    t = np.asarray(params["params"]["t"])
    weighted = 0.5 * t[1] + 2.0 * t[2]
    if combiner == "sum":
        expected = weighted
    elif combiner == "mean":
        expected = weighted / 2.5
    else:
        expected = weighted / np.sqrt(0.25 + 4.0)
    np.testing.assert_allclose(out[0], expected, rtol=1e-5)


def test_sequence_feature_keeps_sequence_axis():
    table = emb_lib.TableConfig(50, 4, name="t")
    module = emb_lib.TpuEmbedding(
        feature_configs=(
            emb_lib.FeatureConfig(table, name="f", max_sequence_length=3),
        ),
        shard_tables=False,
    )
    ids = jnp.asarray([[1, 2, PAD]])
    params = module.init(jax.random.PRNGKey(2), {"f": ids})
    out = np.asarray(module.apply(params, {"f": ids})["f"])
    assert out.shape == (1, 3, 4)
    t = np.asarray(params["params"]["t"])
    np.testing.assert_allclose(out[0, 0], t[1], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], t[2], rtol=1e-6)
    np.testing.assert_array_equal(out[0, 2], np.zeros(4))


def test_unknown_feature_raises():
    module = emb_lib.TpuEmbedding(
        feature_configs=_configs(), shard_tables=False
    )
    with pytest.raises(ValueError, match="no FeatureConfig"):
        module.init(jax.random.PRNGKey(0), {"bogus": jnp.asarray([1])})


def test_sharded_lookup_matches_replicated():
    mesh = parallel.create_mesh((1, 8), ("data", "model"))
    module = emb_lib.TpuEmbedding(feature_configs=_configs("mean"))
    feats = {
        "user_id": jnp.asarray([1, 2, 3, 4]),
        "movie_id": jnp.asarray([10, 20, 30, 40]),
        "history": jnp.asarray(
            [[1, 2, PAD], [3, 4, 5], [PAD, PAD, PAD], [7, 8, 9]]
        ),
    }
    variables = module.init(jax.random.PRNGKey(3), feats)
    pspecs = nn.get_partition_spec(variables)["params"]
    # Tables must be row-sharded over the model axis.
    assert pspecs["user"] == P("model", None)

    unboxed = nn.meta.unbox(variables["params"])
    sharded_params = jax.tree_util.tree_map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        unboxed,
        pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )

    @jax.jit
    def lookup(params, feats):
        return module.apply({"params": params}, feats)

    with jax.set_mesh(mesh):
        sharded_out = lookup(sharded_params, feats)
    plain_out = module.apply({"params": unboxed}, feats)
    for k in plain_out:
        np.testing.assert_allclose(
            np.asarray(sharded_out[k]), np.asarray(plain_out[k]), rtol=1e-5
        )


def test_sharded_lookup_gradients_flow():
    mesh = parallel.create_mesh((2, 4), ("data", "model"))
    module = emb_lib.TpuEmbedding(feature_configs=_configs())
    feats = {"user_id": jnp.asarray([1, 2, 3, 4])}
    variables = module.init(jax.random.PRNGKey(4), feats)
    params = nn.meta.unbox(variables["params"])

    def loss(params):
        out = module.apply({"params": params}, feats)
        return jnp.sum(jnp.square(out["user_id"]))

    g = jax.grad(loss)(params)
    assert np.any(np.asarray(g["user"]) != 0)
    # Untouched rows have zero grads (sparse structure).
    assert np.all(np.asarray(g["user"])[50:] == 0)


def test_partial_embedding_routes_by_vocab():
    big = emb_lib.TableConfig(50_000, 8, name="big")
    small = emb_lib.TableConfig(100, 8, name="small")
    module = emb_lib.PartialEmbedding(
        feature_configs=(
            emb_lib.FeatureConfig(big, name="big_f"),
            emb_lib.FeatureConfig(small, name="small_f"),
        ),
        size_threshold=10_000,
    )
    feats = {
        "big_f": jnp.asarray([1, 2]),
        "small_f": jnp.asarray([3, 4]),
    }
    params = module.init(jax.random.PRNGKey(0), feats)["params"]
    assert "big" in params["sharded_embedding"]
    assert "small" in params["dense_embedding"]
    out = module.apply({"params": params}, feats)
    assert out["big_f"].shape == (2, 8)
    assert out["small_f"].shape == (2, 8)


def test_partial_embedding_threshold_none_replicates_all():
    big = emb_lib.TableConfig(50_000, 8, name="big")
    module = emb_lib.PartialEmbedding(
        feature_configs=(emb_lib.FeatureConfig(big, name="f"),),
        size_threshold=None,
    )
    params = module.init(
        jax.random.PRNGKey(0), {"f": jnp.asarray([1])}
    )["params"]
    assert "dense_embedding" in params and "sharded_embedding" not in params


def test_unified_embedding_shapes_and_order():
    config = emb_lib.UnifiedEmbeddingConfig(
        buckets_per_table=1000, dim_per_table=4, num_tables=3, name="uet"
    )
    config.add_feature("a", num_chunks=2)
    config.add_feature("b", num_chunks=3)
    module = emb_lib.UnifiedEmbedding(config=config, shard_tables=False)

    feats = {
        "a": jnp.asarray([5, 6, 7]),
        "b": jnp.asarray([8, 9, 10]),
    }
    params = module.init(jax.random.PRNGKey(0), feats)
    out = module.apply(params, feats)
    assert len(out) == 2
    assert out[0].shape == (3, 8)  # 2 chunks * 4
    assert out[1].shape == (3, 12)  # 3 chunks * 4
    # Only 3 shared tables exist.
    tables = params["params"]["shared_tables"]
    assert sorted(tables.keys()) == ["uet_0", "uet_1", "uet_2"]


def test_hash_bucket_properties():
    ids = jnp.arange(10_000)
    h1 = np.asarray(hashing.hash_bucket(ids, 100, salt=(0, 0)))
    h2 = np.asarray(hashing.hash_bucket(ids, 100, salt=(0, 1)))
    h1b = np.asarray(hashing.hash_bucket(ids, 100, salt=(0, 0)))
    assert h1.min() >= 0 and h1.max() < 100
    np.testing.assert_array_equal(h1, h1b)  # deterministic
    assert (h1 != h2).mean() > 0.9  # different salts ~independent
    # Roughly uniform.
    counts = np.bincount(h1, minlength=100)
    assert counts.max() < 3 * counts.mean()


class TestSparseOptimizers:
    def test_dedupe_sum(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        ids = jnp.asarray([3, 1, 3, PAD, 1, 7])
        grads = jnp.asarray(
            [[1.0], [2.0], [10.0], [99.0], [20.0], [5.0]]
        )
        out_ids, out_grads = so.dedupe_sum(ids, grads)
        got = {
            int(i): float(g[0])
            for i, g in zip(np.asarray(out_ids), np.asarray(out_grads))
            if i != PAD
        }
        assert got == {1: 22.0, 3: 11.0, 7: 5.0}
        # PAD grads are zeroed.
        pad_rows = np.asarray(out_grads)[np.asarray(out_ids) == PAD]
        assert np.all(pad_rows == 0)

    def test_sparse_sgd(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        spec = emb_lib.OptimizerSpec(kind="sgd", learning_rate=0.5)
        table = jnp.ones((10, 2))
        ids = jnp.asarray([2, 2, 5])
        grads = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
        new_table, _ = so.apply_sparse(
            spec, table, {}, ids, grads, jnp.zeros((), jnp.int32)
        )
        expected = np.ones((10, 2))
        expected[2, 0] -= 0.5 * 2.0  # duplicates summed
        expected[5, 1] -= 0.5 * 2.0
        np.testing.assert_allclose(np.asarray(new_table), expected)

    def test_sparse_adagrad_matches_dense_loop(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        spec = emb_lib.OptimizerSpec(
            kind="adagrad",
            learning_rate=0.1,
            initial_accumulator_value=0.1,
        )
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        slots = so.init_slots(spec, table)

        np_table = np.asarray(table, np.float64)
        np_accum = np.full_like(np_table, 0.1)
        step = jnp.zeros((), jnp.int32)
        for it in range(3):
            ids_np = rng.randint(0, 8, size=4)
            # Ensure unique for exact numpy comparison.
            ids_np = np.asarray(
                rng.choice(8, size=4, replace=False), np.int32
            )
            grads_np = rng.normal(size=(4, 3)).astype(np.float32)
            table, slots = so.apply_sparse(
                spec, table, slots, jnp.asarray(ids_np),
                jnp.asarray(grads_np), step
            )
            np_accum[ids_np] += grads_np.astype(np.float64) ** 2
            np_table[ids_np] -= (
                0.1
                * grads_np
                / np.sqrt(np_accum[ids_np] + 1e-12)
            )
        np.testing.assert_allclose(np.asarray(table), np_table, rtol=1e-4)

    def test_sparse_adam_updates_only_touched_rows(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        spec = emb_lib.OptimizerSpec(kind="adam", learning_rate=0.01)
        table = jnp.ones((6, 2))
        slots = so.init_slots(spec, table)
        ids = jnp.asarray([1, 4])
        grads = jnp.asarray([[1.0, 1.0], [2.0, -1.0]])
        new_table, new_slots = so.apply_sparse(
            spec, table, slots, ids, grads, jnp.zeros((), jnp.int32)
        )
        t = np.asarray(new_table)
        assert np.all(t[[0, 2, 3, 5]] == 1.0)
        assert np.all(t[[1, 4]] != 1.0)
        assert np.all(np.asarray(new_slots["m"])[[0, 2, 3, 5]] == 0.0)

    def test_sparse_ftrl_sanity(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        spec = emb_lib.OptimizerSpec(
            kind="ftrl",
            learning_rate=0.1,
            initial_accumulator_value=0.1,
            l1_regularization_strength=0.0,
            l2_regularization_strength=0.0,
        )
        table = jnp.zeros((4, 2))
        slots = so.init_slots(spec, table)
        ids = jnp.asarray([0])
        grads = jnp.asarray([[1.0, -1.0]])
        new_table, _ = so.apply_sparse(
            spec, table, slots, ids, grads, jnp.zeros((), jnp.int32)
        )
        t = np.asarray(new_table)
        # Gradient descent direction.
        assert t[0, 0] < 0 and t[0, 1] > 0
        assert np.all(t[1:] == 0)

    def test_dedupe_sum_bounded_matches_unbounded(self):
        """With the bound >= true unique count, the compacted update is
        identical (same fold, shorter arrays)."""
        from recommenders_tpu.embedding import sparse_optimizer as so

        rng = np.random.RandomState(3)
        ids_np = rng.randint(0, 10, size=64).astype(np.int32)
        ids_np[rng.choice(64, 8, replace=False)] = PAD
        grads_np = rng.normal(size=(64, 4)).astype(np.float32)
        full_i, full_g = so.dedupe_sum(
            jnp.asarray(ids_np), jnp.asarray(grads_np)
        )
        bnd_i, bnd_g = so.dedupe_sum(
            jnp.asarray(ids_np), jnp.asarray(grads_np), max_unique=16
        )
        assert bnd_i.shape == (16,) and bnd_g.shape == (16, 4)

        def as_map(i, g):
            return {
                int(a): tuple(np.round(np.asarray(b), 5))
                for a, b in zip(np.asarray(i), np.asarray(g))
                if a != PAD
            }

        assert as_map(full_i, full_g) == as_map(bnd_i, bnd_g)

    def test_dedupe_sum_bounded_drops_excess(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        ids = jnp.asarray([1, 2, 3, 4, 5])
        grads = jnp.ones((5, 2))
        out_i, out_g = so.dedupe_sum(ids, grads, max_unique=3)
        assert out_i.shape == (3,)
        # Deterministic drop: the largest ids fall off.
        np.testing.assert_array_equal(np.asarray(out_i), [1, 2, 3])

    def test_apply_sparse_bounded_matches_unbounded(self):
        from recommenders_tpu.embedding import sparse_optimizer as so

        spec = emb_lib.OptimizerSpec(
            kind="adagrad", learning_rate=0.1,
            initial_accumulator_value=0.1,
        )
        rng = np.random.RandomState(7)
        table = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        slots = so.init_slots(spec, table)
        ids = jnp.asarray(rng.randint(0, 6, size=128), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        step = jnp.zeros((), jnp.int32)
        t_full, s_full = so.apply_sparse(
            spec, table, slots, ids, grads, step
        )
        t_bnd, s_bnd = so.apply_sparse(
            spec, table, slots, ids, grads, step, max_unique=8
        )
        np.testing.assert_allclose(
            np.asarray(t_bnd), np.asarray(t_full), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_bnd["accumulator"]),
            np.asarray(s_full["accumulator"]),
            rtol=1e-6,
        )

    def test_engine_max_unique_ids_bound(self):
        """Engine threads TableConfig.max_unique_ids through the update;
        training stays exact when the bound holds every step."""
        from recommenders_tpu.embedding import engine as engine_lib

        table = emb_lib.TableConfig(
            vocabulary_size=40, dim=4, name="t", combiner="sum",
            max_unique_ids=16,
        )
        fc = emb_lib.FeatureConfig(name="f", table=table)
        table_free = emb_lib.TableConfig(
            vocabulary_size=40, dim=4, name="t", combiner="sum"
        )
        fc_free = emb_lib.FeatureConfig(name="f", table=table_free)
        spec = emb_lib.OptimizerSpec(kind="adagrad", learning_rate=0.1)

        eng = engine_lib.EmbeddingEngine([fc], optimizer=spec)
        eng_free = engine_lib.EmbeddingEngine([fc_free], optimizer=spec)
        state = eng.init(jax.random.PRNGKey(0))
        state_free = eng_free.init(jax.random.PRNGKey(0))

        rng = np.random.RandomState(0)
        for _ in range(3):
            # <=8 unique ids per step, heavily duplicated batch of 64.
            feats = {
                "f": jnp.asarray(
                    rng.randint(0, 8, size=(64, 3)), jnp.int32
                )
            }

            def loss(acts):
                return jnp.sum(jnp.square(acts["f"]))

            state, _, _ = eng.grad_and_update(state, feats, loss)
            state_free, _, _ = eng_free.grad_and_update(
                state_free, feats, loss
            )
        np.testing.assert_allclose(
            np.asarray(state.tables["t"]),
            np.asarray(state_free.tables["t"]),
            rtol=1e-6,
        )
