"""Decoupled embedding engine tests.

Key oracle: for the same batch, the engine's decoupled sparse update must
match the dense-autodiff path (jax.grad through the table + the same
optimizer rule applied densely). This is the CPU/TPU-equivalence guarantee
the reference engineers by hand (tpu_embedding_layer.py:499-533).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import embedding as embedding_lib
from recommenders_tpu.embedding import engine as engine_lib
from recommenders_tpu.parallel import mesh as mesh_lib


def _configs(optimizer=None):
    user = config_lib.TableConfig(
        vocabulary_size=50, dim=8, name="user", optimizer=optimizer
    )
    item = config_lib.TableConfig(
        vocabulary_size=40, dim=8, name="item", combiner="mean",
        optimizer=optimizer,
    )
    return (
        config_lib.FeatureConfig(table=user, name="user_id"),
        config_lib.FeatureConfig(table=item, name="item_id"),
        # Shares the item table, multivalent with mean combiner.
        config_lib.FeatureConfig(table=item, name="history"),
    )


def _features(seed=0, batch=16):
    rng = np.random.RandomState(seed)
    history = rng.randint(0, 40, size=(batch, 5)).astype(np.int32)
    history[rng.uniform(size=history.shape) < 0.3] = config_lib.PAD_ID
    return {
        "user_id": rng.randint(0, 50, size=batch).astype(np.int32),
        "item_id": rng.randint(0, 40, size=batch).astype(np.int32),
        "history": history,
    }


def _loss_of_acts(acts):
    # A simple smooth loss over all activations.
    return sum(jnp.sum(jnp.square(a)) for a in acts.values())


def test_engine_matches_dense_autodiff_sgd():
    spec = config_lib.OptimizerSpec(kind="sgd", learning_rate=0.1)
    eng = engine_lib.EmbeddingEngine(_configs(), optimizer=spec)
    state = eng.init(jax.random.PRNGKey(0))
    features = _features()

    new_state, loss, _ = eng.grad_and_update(
        state, features, _loss_of_acts
    )
    assert float(loss) > 0

    # Dense oracle: same loss through jax.grad w.r.t. the raw tables.
    configs = {fc.name: fc for fc in _configs()}

    def dense_loss(tables):
        acts = {
            name: embedding_lib.lookup_feature(
                tables[configs[name].table.name], configs[name], feat
            )
            for name, feat in features.items()
        }
        return _loss_of_acts(acts)

    dense_grads = jax.grad(dense_loss)(state.tables)
    for name in state.tables:
        expected = state.tables[name] - 0.1 * dense_grads[name]
        np.testing.assert_allclose(
            np.asarray(new_state.tables[name]),
            np.asarray(expected),
            rtol=1e-5,
            atol=1e-6,
        )


def test_engine_matches_dense_adagrad():
    spec = config_lib.OptimizerSpec(
        kind="adagrad", learning_rate=0.1, initial_accumulator_value=0.1
    )
    eng = engine_lib.EmbeddingEngine(_configs(), optimizer=spec)
    state = eng.init(jax.random.PRNGKey(0))
    features = _features(seed=1)
    new_state, _, _ = eng.grad_and_update(state, features, _loss_of_acts)

    configs = {fc.name: fc for fc in _configs()}

    def dense_loss(tables):
        acts = {
            name: embedding_lib.lookup_feature(
                tables[configs[name].table.name], configs[name], feat
            )
            for name, feat in features.items()
        }
        return _loss_of_acts(acts)

    g = jax.grad(dense_loss)(state.tables)
    for name in state.tables:
        accum = 0.1 + np.square(np.asarray(g[name]))
        expected = np.asarray(state.tables[name]) - 0.1 * np.asarray(
            g[name]
        ) / np.sqrt(accum + 1e-12)
        # Untouched rows keep accum at init (no epsilon drift): mask them.
        touched = np.any(np.asarray(g[name]) != 0, axis=1)
        np.testing.assert_allclose(
            np.asarray(new_state.tables[name])[touched],
            expected[touched],
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(new_state.tables[name])[~touched],
            np.asarray(state.tables[name])[~touched],
        )
        np.testing.assert_allclose(
            np.asarray(new_state.slots[name]["accumulator"])[touched],
            accum[touched],
            rtol=1e-5,
        )


def test_untouched_rows_never_move():
    eng = engine_lib.EmbeddingEngine(_configs())
    state = eng.init(jax.random.PRNGKey(0))
    features = _features(seed=2, batch=4)
    new_state, _, _ = eng.grad_and_update(state, features, _loss_of_acts)
    used_users = set(features["user_id"].tolist())
    unused = [u for u in range(50) if u not in used_users]
    np.testing.assert_array_equal(
        np.asarray(new_state.tables["user"])[unused],
        np.asarray(state.tables["user"])[unused],
    )


def test_duplicate_ids_fold_exactly():
    """A batch with one id repeated r times must equal a batch with that id
    once and the gradient scaled r× (linear loss)."""
    table = config_lib.TableConfig(vocabulary_size=10, dim=4, name="t")
    fcs = (config_lib.FeatureConfig(table=table, name="x"),)
    spec = config_lib.OptimizerSpec(kind="adagrad", learning_rate=0.5)
    eng = engine_lib.EmbeddingEngine(fcs, optimizer=spec)
    state = eng.init(jax.random.PRNGKey(0))

    def linear_loss(acts):
        return jnp.sum(acts["x"])

    dup, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([3, 3, 3], jnp.int32)}, linear_loss
    )
    # Oracle: one occurrence, gradient 3× (ones * 3).
    ids = jnp.asarray([3], jnp.int32)
    grads = 3.0 * jnp.ones((1, 4), jnp.float32)
    from recommenders_tpu.embedding import sparse_optimizer

    t2, s2 = sparse_optimizer.apply_sparse(
        spec, state.tables["t"], state.slots["t"], ids, grads, state.step
    )
    np.testing.assert_allclose(
        np.asarray(dup.tables["t"]), np.asarray(t2), rtol=1e-6
    )


def test_sharded_engine_matches_unsharded():
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    features = _features(seed=3)
    eng_sharded = engine_lib.EmbeddingEngine(_configs(), mesh=mesh)
    eng_local = engine_lib.EmbeddingEngine(_configs())
    s_sharded = eng_sharded.init(jax.random.PRNGKey(0))
    s_local = eng_local.init(jax.random.PRNGKey(0))
    for name in s_local.tables:
        np.testing.assert_allclose(
            np.asarray(s_sharded.tables[name]),
            np.asarray(s_local.tables[name]),
            rtol=1e-6,
        )
        assert (
            s_sharded.tables[name].sharding.spec
            == jax.sharding.PartitionSpec("model", None)
        )

    step = jax.jit(
        lambda st, f: eng_sharded.grad_and_update(st, f, _loss_of_acts)[0]
    )
    n_sharded = step(s_sharded, features)
    n_local = eng_local.grad_and_update(s_local, features, _loss_of_acts)[0]
    for name in n_local.tables:
        np.testing.assert_allclose(
            np.asarray(n_sharded.tables[name]),
            np.asarray(n_local.tables[name]),
            rtol=1e-5,
            atol=1e-6,
        )


def test_per_table_optimizer_override():
    sgd = config_lib.OptimizerSpec(kind="sgd", learning_rate=1.0)
    adam = config_lib.OptimizerSpec(kind="adam", learning_rate=0.1)
    t_sgd = config_lib.TableConfig(20, 4, name="a", optimizer=sgd)
    t_adam = config_lib.TableConfig(20, 4, name="b", optimizer=adam)
    fcs = (
        config_lib.FeatureConfig(table=t_sgd, name="fa"),
        config_lib.FeatureConfig(table=t_adam, name="fb"),
    )
    eng = engine_lib.EmbeddingEngine(fcs)
    state = eng.init(jax.random.PRNGKey(0))
    assert state.slots["a"] == {}
    assert set(state.slots["b"]) == {"m", "v"}

    features = {
        "fa": jnp.asarray([1, 2], jnp.int32),
        "fb": jnp.asarray([3, 4], jnp.int32),
    }
    new_state, _, _ = eng.grad_and_update(state, features, _loss_of_acts)
    assert not np.allclose(
        np.asarray(new_state.tables["a"])[1],
        np.asarray(state.tables["a"])[1],
    )


def test_engine_state_checkpoints(tmp_path):
    from recommenders_tpu.utils import checkpoint as ckpt

    eng = engine_lib.EmbeddingEngine(_configs())
    state = eng.init(jax.random.PRNGKey(0))
    state, _, _ = eng.grad_and_update(state, _features(), _loss_of_acts)
    ckpt.save(str(tmp_path / "e"), state)
    restored = ckpt.restore(str(tmp_path / "e"), template=state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_tables_train_and_checkpoint(tmp_path):
    """bf16 table storage (half the HBM traffic) trains and round-trips."""
    import jax.numpy as jnp

    table = config_lib.TableConfig(
        vocabulary_size=100, dim=8, name="t",
        optimizer=config_lib.OptimizerSpec(kind="adagrad", learning_rate=0.5),
    )
    eng = engine_lib.EmbeddingEngine(
        (config_lib.FeatureConfig(table=table, name="x"),),
        dtype=jnp.bfloat16,
    )
    state = eng.init(jax.random.PRNGKey(0))
    assert state.tables["t"].dtype == jnp.bfloat16

    target = jnp.asarray(
        np.random.RandomState(0).normal(size=(16, 8)), jnp.float32
    )
    feats = {"x": jnp.asarray(np.arange(16), jnp.int32)}

    def loss(acts):
        return jnp.sum(jnp.square(acts["x"].astype(jnp.float32) - target))

    losses = []
    for _ in range(20):
        state, l, _ = eng.grad_and_update(state, feats, loss)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    from recommenders_tpu.utils import checkpoint as ckpt

    ckpt.save(str(tmp_path / "bf16"), state)
    restored = ckpt.restore(str(tmp_path / "bf16"), template=state)
    assert restored.tables["t"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored.tables["t"].astype(jnp.float32)),
        np.asarray(state.tables["t"].astype(jnp.float32)),
    )


def test_adam_closed_form_single_step():
    """Lazy Adam single-step against hand-computed values."""
    spec = config_lib.OptimizerSpec(
        kind="adam", learning_rate=0.1, beta1=0.9, beta2=0.999,
        epsilon=1e-7,
    )
    table = config_lib.TableConfig(10, 2, name="t", optimizer=spec)
    eng = engine_lib.EmbeddingEngine(
        (config_lib.FeatureConfig(table=table, name="x"),)
    )
    state = eng.init(jax.random.PRNGKey(0))
    w0 = np.asarray(state.tables["t"])[3]

    def linear(acts):
        return jnp.sum(acts["x"] * jnp.asarray([[2.0, -1.0]]))

    new_state, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([3], jnp.int32)}, linear
    )
    g = np.asarray([2.0, -1.0])
    m = 0.1 * g                     # (1-beta1) * g
    v = 0.001 * g * g               # (1-beta2) * g^2
    m_hat = m / (1 - 0.9)           # t = 1
    v_hat = v / (1 - 0.999)
    expected = w0 - 0.1 * m_hat / (np.sqrt(v_hat) + 1e-7)
    np.testing.assert_allclose(
        np.asarray(new_state.tables["t"])[3], expected, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.slots["t"]["m"])[3], m, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state.slots["t"]["v"])[3], v, rtol=1e-6
    )
    # Untouched row slots stay zero.
    np.testing.assert_array_equal(
        np.asarray(new_state.slots["t"]["m"])[0], [0.0, 0.0]
    )


def test_ftrl_closed_form_single_step():
    """FTRL-proximal single-step against the published update equations."""
    lr, l1, l2, acc0 = 0.5, 0.1, 0.01, 0.1
    spec = config_lib.OptimizerSpec(
        kind="ftrl", learning_rate=lr,
        initial_accumulator_value=acc0,
        l1_regularization_strength=l1,
        l2_regularization_strength=l2,
        learning_rate_power=-0.5,
    )
    table = config_lib.TableConfig(10, 1, name="t", optimizer=spec)
    eng = engine_lib.EmbeddingEngine(
        (config_lib.FeatureConfig(table=table, name="x"),)
    )
    state = eng.init(jax.random.PRNGKey(0))
    w0 = float(np.asarray(state.tables["t"])[5, 0])

    g = 3.0

    def linear(acts):
        return g * jnp.sum(acts["x"])

    new_state, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([5], jnp.int32)}, linear
    )
    n_new = acc0 + g * g
    sigma = (np.sqrt(n_new) - np.sqrt(acc0)) / lr
    z = g - sigma * w0  # linear slot starts at 0.
    denom = np.sqrt(n_new) / lr + 2 * l2
    expected_w = (
        (np.sign(z) * l1 - z) / denom if abs(z) > l1 else 0.0
    )
    np.testing.assert_allclose(
        float(np.asarray(new_state.tables["t"])[5, 0]),
        expected_w,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(np.asarray(new_state.slots["t"]["accumulator"])[5, 0]),
        n_new,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(np.asarray(new_state.slots["t"]["linear"])[5, 0]),
        z,
        rtol=1e-6,
    )


def test_clippy_closed_form_and_dense_oracle():
    """Sparse Clippy (reference clippy_adagrad.py:165-254) matches both a
    hand-computed step and the dense optax clippy_adagrad applied to a
    gradient that is zero on untouched rows (zero-delta rows contribute
    scale 1, so dense and gathered-rows clipping agree exactly)."""
    import importlib

    clippy_lib = importlib.import_module(
        "recommenders_tpu.optimizers.clippy_adagrad"
    )

    lr, acc0, eps = 0.5, 0.1, 1e-7
    rel_var, rel_acc, abs_t = 0.1, 0.05, 1e-7
    spec = config_lib.OptimizerSpec(
        kind="clippy", learning_rate=lr, initial_accumulator_value=acc0,
        epsilon=eps, variable_relative_threshold=rel_var,
        accumulator_relative_threshold=rel_acc, absolute_threshold=abs_t,
    )
    table = config_lib.TableConfig(10, 2, name="t", optimizer=spec)
    eng = engine_lib.EmbeddingEngine(
        (config_lib.FeatureConfig(table=table, name="x"),)
    )
    state = eng.init(jax.random.PRNGKey(0))
    w0 = np.asarray(state.tables["t"]).copy()

    g = np.asarray([4.0, -2.0])  # Large: the clip must engage.

    def linear(acts):
        return jnp.sum(acts["x"] * jnp.asarray(g)[None, :])

    new_state, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([7], jnp.int32)}, linear
    )

    # Closed form (delayed accumulator update, unclipped accumulator).
    precond = 1.0 / np.sqrt(acc0 + eps)
    delta = lr * g * precond
    max_delta = abs_t + np.abs(w0[7]) * rel_var + precond * rel_acc
    factor = min(1.0, float(np.min(max_delta / np.abs(delta))))
    expected_row = w0[7] - delta * factor
    np.testing.assert_allclose(
        np.asarray(new_state.tables["t"])[7], expected_row, rtol=1e-5
    )
    assert factor < 1.0  # The clip actually engaged.
    np.testing.assert_allclose(
        np.asarray(new_state.slots["t"]["accumulator"])[7],
        acc0 + g * g,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(np.asarray(new_state.slots["t"]["clipping_factor"])),
        factor,
        rtol=1e-5,
    )

    # Dense optax oracle over the whole table.
    import optax

    opt = clippy_lib.clippy_adagrad(
        learning_rate=lr, initial_accumulator_value=acc0,
        variable_relative_threshold=rel_var,
        accumulator_relative_threshold=rel_acc,
        absolute_threshold=abs_t, epsilon=eps,
    )
    dense_grad = np.zeros_like(w0)
    dense_grad[7] = g
    params = {"t": jnp.asarray(w0)}
    opt_state = opt.init(params)
    updates, _ = opt.update(
        {"t": jnp.asarray(dense_grad)}, opt_state, params
    )
    dense_next = optax.apply_updates(params, updates)["t"]
    np.testing.assert_allclose(
        np.asarray(new_state.tables["t"]), np.asarray(dense_next),
        rtol=1e-5, atol=1e-7,
    )


def test_clippy_trains_engine_tables():
    """End-to-end: clippy as the engine optimizer reduces the loss."""
    spec = config_lib.OptimizerSpec(kind="clippy", learning_rate=0.5)
    eng = engine_lib.EmbeddingEngine(_configs(), optimizer=spec)
    state = eng.init(jax.random.PRNGKey(1))
    features = _features(seed=3)
    losses = []
    for _ in range(30):
        state, loss, _ = eng.grad_and_update(
            state, features, _loss_of_acts
        )
        losses.append(float(loss))
    # The scalar per-table clip factor (min over touched elements, the
    # reference semantics) throttles early steps, so expect steady but
    # modest progress.
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    assert all(b <= a + 1e-6 for a, b in zip(losses, losses[1:])), losses


def test_learning_rate_schedule_applies_per_step():
    """A callable learning_rate is evaluated on the engine step counter
    (the reference's dynamic-LR translation,
    tpu_embedding_layer.py:1014-1082)."""
    def schedule(step):
        return 0.1 * jnp.where(step < 1, 1.0, 0.5)

    spec = config_lib.OptimizerSpec(kind="sgd", learning_rate=schedule)
    table = config_lib.TableConfig(10, 1, name="t", optimizer=spec)
    eng = engine_lib.EmbeddingEngine(
        (config_lib.FeatureConfig(table=table, name="x"),)
    )
    state = eng.init(jax.random.PRNGKey(0))
    w0 = float(np.asarray(state.tables["t"])[2, 0])

    def linear(acts):
        return jnp.sum(acts["x"])  # grad = 1 on touched rows.

    state, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([2], jnp.int32)}, linear
    )
    w1 = float(np.asarray(state.tables["t"])[2, 0])
    np.testing.assert_allclose(w0 - w1, 0.1, rtol=1e-6)  # step 0: lr .1
    state, _, _ = eng.grad_and_update(
        state, {"x": jnp.asarray([2], jnp.int32)}, linear
    )
    w2 = float(np.asarray(state.tables["t"])[2, 0])
    np.testing.assert_allclose(w1 - w2, 0.05, rtol=1e-6)  # step 1: lr .05


def test_mod_sharded_engine_matches_div():
    """Mod-sharding is a pure layout change: activations and (logically
    reordered) tables must match the div-sharded engine bit-for-bit on
    the 8-device mesh, and rows must actually land mod-S (the TF TPU
    embedding engine's placement)."""
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    features = _features(seed=5)
    eng_mod = engine_lib.EmbeddingEngine(
        _configs(), mesh=mesh, row_sharding="mod"
    )
    eng_div = engine_lib.EmbeddingEngine(_configs(), mesh=mesh)
    s_mod = eng_mod.init(jax.random.PRNGKey(0))
    s_div = eng_div.init(jax.random.PRNGKey(0))

    # Same logical rows, different physical layout.
    logical = eng_mod.logical_tables(s_mod)
    for name in s_div.tables:
        np.testing.assert_allclose(
            np.asarray(logical[name]),
            np.asarray(s_div.tables[name]),
            rtol=1e-6,
        )
        # Physical layout differs (it's actually permuted).
        assert not np.allclose(
            np.asarray(s_mod.tables[name]), np.asarray(s_div.tables[name])
        )
        # Logical row r lives in physical block r % S (S = 4 shards).
        padded = np.asarray(s_mod.tables[name]).shape[0]
        rps = padded // 4
        phys_of_r = lambda r: (r % 4) * rps + r // 4  # noqa: E731
        for r in (0, 1, 5, 10):
            np.testing.assert_allclose(
                np.asarray(s_mod.tables[name])[phys_of_r(r)],
                np.asarray(s_div.tables[name])[r],
                rtol=1e-6,
            )

    # Lookups agree.
    acts_mod = eng_mod.lookup(s_mod, features)
    acts_div = eng_div.lookup(s_div, features)
    for k in acts_div:
        np.testing.assert_allclose(
            np.asarray(acts_mod[k]), np.asarray(acts_div[k]), rtol=1e-6
        )

    # A training step agrees after undoing the layout.
    n_mod = eng_mod.grad_and_update(s_mod, features, _loss_of_acts)[0]
    n_div = eng_div.grad_and_update(s_div, features, _loss_of_acts)[0]
    logical_after = eng_mod.logical_tables(n_mod)
    for name in n_div.tables:
        np.testing.assert_allclose(
            np.asarray(logical_after[name]),
            np.asarray(n_div.tables[name]),
            rtol=1e-5,
            atol=1e-6,
        )
