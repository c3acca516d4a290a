"""Stochastic rounding for bf16 embedding state (ops/sparse_apply).

The production recipe for half-precision embedding training: bf16
round-to-nearest swallows updates smaller than the table value's ULP,
so long trainings stall; stochastic rounding keeps every write unbiased
(E[stored] = exact). Tests cover the primitive's statistics, the
kernel/reference write-back paths, the tiny-update accumulation that
motivates the feature, and the engine-level wiring (f32 slots by
default, per-step seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import engine as engine_lib
from recommenders_tpu.embedding import sparse_optimizer
from recommenders_tpu.ops import sparse_apply


class TestPrimitive:
    def test_unbiased_and_bracketing(self):
        # A value strictly between two bf16 neighbours must round to one
        # of them, with the mean over many draws approaching the value.
        lo = np.float32(1.0)
        hi = np.float32(np.asarray(
            jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0))
            .astype(jnp.float32)
        ))
        x = lo + 0.3 * (hi - lo)
        n = 4096
        xs = jnp.full((n, 128), x, jnp.float32)
        bits = sparse_apply.counter_random_u32(
            jnp.int32(123), jnp.int32(0), (n, 128)
        )
        out = np.asarray(
            sparse_apply.stochastic_round_bf16(xs, bits)
        ).astype(np.float32)
        assert set(np.unique(out)) <= {lo, hi}
        frac_up = float((out == hi).mean())
        np.testing.assert_allclose(frac_up, 0.3, atol=0.02)

    def test_exact_values_never_move(self):
        xs = jnp.asarray([1.0, -2.0, 0.0, 0.5, 384.0], jnp.float32)
        xs = jnp.tile(xs[None, :], (64, 1))
        bits = sparse_apply.counter_random_u32(
            jnp.int32(9), jnp.int32(1), xs.shape
        )
        out = sparse_apply.stochastic_round_bf16(xs, bits)
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), np.asarray(xs)
        )

    def test_counter_rng_deterministic_and_stream_dependent(self):
        a = sparse_apply.counter_random_u32(jnp.int32(5), jnp.int32(0),
                                            (16, 128))
        b = sparse_apply.counter_random_u32(jnp.int32(5), jnp.int32(0),
                                            (16, 128))
        c = sparse_apply.counter_random_u32(jnp.int32(5), jnp.int32(1),
                                            (16, 128))
        d = sparse_apply.counter_random_u32(jnp.int32(6), jnp.int32(0),
                                            (16, 128))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) != np.asarray(c)).mean() > 0.99
        assert (np.asarray(a) != np.asarray(d)).mean() > 0.99


def _sgd_rule(states, g, count, sc):
    (table,) = states
    return [table - sc[0] * g]


class TestKernelPath:
    def _apply(self, seed, lr=1.0):
        v, d, n = 32, 128, 8
        table = jnp.ones((v, d), jnp.bfloat16)
        ids = jnp.asarray(np.arange(n), jnp.int32)
        # An update far below bf16(1.0)'s ULP (2^-8): RTN drops it.
        grads = jnp.full((n, d), -(2.0 ** -14), jnp.float32)
        (out,) = sparse_apply.sorted_block_apply(
            (table,), ids, grads, _sgd_rule,
            scalars=jnp.asarray([lr], jnp.float32),
            block_rows=16, chunk=8,
            stochastic_round_seed=seed,
            interpret=True,
        )
        return np.asarray(out.astype(jnp.float32))

    def test_tiny_updates_survive_in_expectation(self):
        outs = np.stack([self._apply(jnp.int32(s)) for s in range(64)])
        touched = outs[:, :8, :]
        # Each draw is 1.0 or the next bf16 up; the mean over seeds must
        # approach 1.0 + 2^-14 (RTN would pin every draw at exactly 1.0).
        assert not np.all(touched == 1.0)
        mean = touched.mean()
        np.testing.assert_allclose(mean, 1.0 + 2.0 ** -14, rtol=3e-5)
        # Untouched rows never change.
        np.testing.assert_array_equal(outs[:, 8:, :], 1.0)

    def test_same_seed_is_deterministic(self):
        np.testing.assert_array_equal(
            self._apply(jnp.int32(42)), self._apply(jnp.int32(42))
        )

    def test_no_seed_rounds_to_nearest(self):
        v, d, n = 32, 128, 8
        table = jnp.ones((v, d), jnp.bfloat16)
        ids = jnp.asarray(np.arange(n), jnp.int32)
        grads = jnp.full((n, d), -(2.0 ** -14), jnp.float32)
        (out,) = sparse_apply.sorted_block_apply(
            (table,), ids, grads, _sgd_rule,
            scalars=jnp.asarray([1.0], jnp.float32),
            block_rows=16, chunk=8, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), 1.0
        )

    def test_mixed_dtype_states(self):
        # bf16 table + f32 slot in one call: only the table rounds.
        v, d, n = 32, 128, 8

        def rule(states, g, count, sc):
            t, s = states
            return [t + g, s + g]

        table = jnp.ones((v, d), jnp.bfloat16)
        slot = jnp.ones((v, d), jnp.float32)
        ids = jnp.asarray(np.arange(n), jnp.int32)
        grads = jnp.full((n, d), 2.0 ** -14, jnp.float32)
        t2, s2 = sparse_apply.sorted_block_apply(
            (table, slot), ids, grads, rule,
            scalars=jnp.zeros((1,), jnp.float32),
            block_rows=16, chunk=8,
            stochastic_round_seed=jnp.int32(3), interpret=True,
        )
        assert t2.dtype == jnp.bfloat16 and s2.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(s2[:8]), 1.0 + 2.0 ** -14, rtol=1e-6
        )

    def test_reference_twin_unbiased(self):
        v, d, n = 32, 128, 8
        table = jnp.ones((v, d), jnp.bfloat16)
        ids = jnp.asarray(np.arange(n), jnp.int32)
        grads = jnp.full((n, d), -(2.0 ** -14), jnp.float32)
        outs = []
        for s in range(64):
            (out,) = sparse_apply.sorted_block_apply_reference(
                (table,), ids, grads, _sgd_rule,
                scalars=jnp.asarray([1.0], jnp.float32),
                stochastic_round_seed=jnp.int32(s),
            )
            outs.append(np.asarray(out[:8].astype(jnp.float32)))
        mean = np.stack(outs).mean()
        np.testing.assert_allclose(mean, 1.0 + 2.0 ** -14, rtol=3e-5)


class TestEngineWiring:
    def _engine(self, **kw):
        table = config_lib.TableConfig(
            vocabulary_size=64, dim=16, name="t",
            optimizer=config_lib.OptimizerSpec(
                kind="adagrad", learning_rate=0.05
            ),
        )
        return engine_lib.EmbeddingEngine(
            (config_lib.FeatureConfig(table=table, name="x"),), **kw
        )

    def test_slots_default_f32_for_bf16_tables(self):
        eng = self._engine(dtype=jnp.bfloat16)
        state = eng.init(jax.random.PRNGKey(0))
        assert state.tables["t"].dtype == jnp.bfloat16
        assert state.slots["t"]["accumulator"].dtype == jnp.float32

    def test_slot_dtype_override(self):
        eng = self._engine(dtype=jnp.bfloat16, slot_dtype=jnp.bfloat16)
        state = eng.init(jax.random.PRNGKey(0))
        assert state.slots["t"]["accumulator"].dtype == jnp.bfloat16

    def test_bf16_sr_training_tracks_f32(self):
        """Long small-step training: SR bf16 tables track the f32 path;
        the engine kernel path (interpreted on CPU) carries the seeds."""
        target = jnp.asarray(
            np.random.RandomState(0).normal(size=(16, 16)), jnp.float32
        )
        feats = {"x": jnp.asarray(np.arange(16), jnp.int32)}

        def loss(acts):
            return jnp.mean(
                jnp.square(acts["x"].astype(jnp.float32) - target)
            )

        losses = {}
        for name, kw in (
            ("f32", dict()),
            ("bf16_sr", dict(dtype=jnp.bfloat16,
                             sparse_update_kernel=True)),
            # The round-5 headline numerics: bf16 slots + lane packing
            # + hi-only routing must ALSO track the f32 path.
            ("bf16_sr_slots_packed", dict(
                dtype=jnp.bfloat16, slot_dtype=jnp.bfloat16,
                sparse_update_kernel=True, lane_pack=True,
                exact_grad_routing=False)),
        ):
            eng = self._engine(**kw)
            state = eng.init(jax.random.PRNGKey(1))
            for _ in range(150):
                state, l, _ = eng.grad_and_update(state, feats, loss)
            losses[name] = float(l)
        assert losses["bf16_sr"] < losses["f32"] * 3 + 1e-3, losses
        assert (
            losses["bf16_sr_slots_packed"] < losses["f32"] * 3 + 1e-3
        ), losses