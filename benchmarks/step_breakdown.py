"""Component-wise timing of the headline training step (real chip).

Decomposes bench.py's step — embedding lookup, in-batch softmax loss
(fwd+bwd), sparse table update — to locate the time. Each variant runs
as a chained `lax.scan` (every iteration data-depends on the last, so
nothing collapses under CSE) and is timed by scan-length differencing
(T(LONG) − T(SHORT)) / (LONG − SHORT), which cancels dispatch and fence
overhead (CLAUDE.md: only a device→host fetch is an honest fence
through the tunnel).

Variants:
  full          engine.grad_and_update (bench.py's step)
  loss_only     value_and_grad of the task loss wrt gathered activations
  lookup_loss   gather + loss fwd/bwd, no table update
  update_only   apply_sparse with fixed gradients (sort+dedupe+kernel)
  gather_only   the two table gathers

Usage: python benchmarks/step_breakdown.py [--bf16-tables]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

BATCH = 4096
DIM = 64
NUM_USERS = 65_536
NUM_ITEMS = 131_072
SHORT, LONG = 10, 110


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16-tables", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))  # defeat result cache

    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)
    engine = engine_lib.EmbeddingEngine(
        (
            cfg.FeatureConfig(
                table=cfg.TableConfig(NUM_USERS, DIM, name="user"),
                name="user_id",
            ),
            cfg.FeatureConfig(
                table=cfg.TableConfig(NUM_ITEMS, DIM, name="item"),
                name="item_id",
            ),
        ),
        optimizer=spec,
        dtype=jnp.bfloat16 if args.bf16_tables else jnp.float32,
    )
    state = engine.init(jax.random.PRNGKey(0))
    task = tasks_lib.Retrieval(score_dtype=jnp.bfloat16)

    def loss_of(acts):
        return task(acts["user_id"], acts["item_id"]).loss

    def batches(n):
        return jax.device_put({
            "user_id": rng.randint(0, NUM_USERS, (n, BATCH)).astype(
                np.int32
            ),
            "item_id": rng.randint(0, NUM_ITEMS, (n, BATCH)).astype(
                np.int32
            ),
        })

    # --- variants, each (init_carry, body) -----------------------------

    def _state_copy():
        # Donated carries must not alias the shared `state` the other
        # variants close over (donation deletes the buffers).
        return jax.tree_util.tree_map(jnp.copy, state)

    def v_full():
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st, bs):
            def body(st, b):
                s, loss, _ = engine.grad_and_update(st, b, loss_of)
                return s, loss
            return jax.lax.scan(body, st, bs)

        return run, _state_copy()

    def v_lookup_loss():
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                # Chain: fold last loss into the ids so steps are
                # data-dependent (no CSE collapse).
                salt = carry.astype(jnp.int32)
                ids = {k: (v + salt) % t for (k, v), t in zip(
                    b.items(), (NUM_USERS, NUM_ITEMS))}
                acts = {
                    "user_id": state.tables["user"][ids["user_id"]],
                    "item_id": state.tables["item"][ids["item_id"]],
                }
                loss, _ = jax.value_and_grad(loss_of)(acts)
                return loss, loss
            return jax.lax.scan(body, carry, bs)

        return run, jnp.float32(0)

    def v_loss_only():
        q0 = jax.random.normal(
            jax.random.PRNGKey(1), (BATCH, DIM), jnp.float32
        )
        c0 = jax.random.normal(
            jax.random.PRNGKey(2), (BATCH, DIM), jnp.float32
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                q, c = carry
                acts = {"user_id": q, "item_id": c}
                loss, g = jax.value_and_grad(loss_of)(acts)
                # Chain via the gradients.
                return (q - 0.1 * g["user_id"],
                        c - 0.1 * g["item_id"]), loss
            return jax.lax.scan(body, carry, bs)

        return run, (q0, c0)

    def v_update_only():
        from recommenders_tpu.embedding import sparse_optimizer

        g0 = jax.random.normal(
            jax.random.PRNGKey(3), (BATCH, DIM), jnp.float32
        ) * 1e-3

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st, bs):
            def body(st, b):
                tables, slots = dict(st.tables), dict(st.slots)
                for tname, key in (("user", "user_id"),
                                   ("item", "item_id")):
                    tables[tname], slots[tname] = (
                        sparse_optimizer.apply_sparse(
                            spec, tables[tname], slots[tname],
                            b[key], g0, st.step, use_kernel=True,
                            sr_seed=st.step,
                        )
                    )
                return engine_lib.EngineState(
                    tables=tables, slots=slots, step=st.step + 1
                ), slots["user"]["accumulator"][0, 0]
            return jax.lax.scan(body, st, bs)

        return run, _state_copy()

    def v_gather_only():
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                salt = carry.astype(jnp.int32)
                u = state.tables["user"][
                    (b["user_id"] + salt) % NUM_USERS]
                i = state.tables["item"][
                    (b["item_id"] + salt) % NUM_ITEMS]
                s = jnp.sum(u.astype(jnp.float32)) + jnp.sum(
                    i.astype(jnp.float32))
                return s, s
            return jax.lax.scan(body, carry, bs)

        return run, jnp.float32(0)

    def v_sort_only():
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                # Chain: salt the ids with the previous permutation's
                # first element.
                ids = (b["user_id"] + carry) % NUM_USERS
                order = jnp.argsort(ids)
                return order[0], order[0]
            return jax.lax.scan(body, carry, bs)

        return run, jnp.int32(0)

    def v_kernel_presorted():
        from recommenders_tpu.embedding import sparse_optimizer

        g0 = jax.random.normal(
            jax.random.PRNGKey(3), (BATCH, DIM), jnp.float32
        ) * 1e-3
        pre = {
            "user_id": jnp.sort(
                jnp.arange(BATCH, dtype=jnp.int32) * 13 % NUM_USERS
            ),
            "item_id": jnp.sort(
                jnp.arange(BATCH, dtype=jnp.int32) * 29 % NUM_ITEMS
            ),
        }

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st, bs):
            def body(st, b):
                tables, slots = dict(st.tables), dict(st.slots)
                for tname, key in (("user", "user_id"),
                                   ("item", "item_id")):
                    rule_args = sparse_optimizer._kernel_rule(
                        spec, st.step
                    )
                    slot_names, scalars, rule = rule_args[:3]
                    states = (tables[tname],) + tuple(
                        slots[tname][nm] for nm in slot_names
                    )
                    new_states = (
                        sparse_optimizer.sparse_apply.sorted_block_apply(
                            states, pre[key], g0, rule,
                            scalars=scalars, block_rows=1024,
                        )
                    )
                    tables[tname] = new_states[0]
                    slots[tname] = dict(
                        zip(slot_names, new_states[1:])
                    )
                return engine_lib.EngineState(
                    tables=tables, slots=slots, step=st.step + 1
                ), slots["user"]["accumulator"][0, 0]
            return jax.lax.scan(body, st, bs)

        return run, _state_copy()

    variants = {
        "full": v_full,
        "lookup_loss": v_lookup_loss,
        "loss_only": v_loss_only,
        "update_only": v_update_only,
        "gather_only": v_gather_only,
        "sort_only": v_sort_only,
        "kernel_presorted": v_kernel_presorted,
    }

    fence_sum = None

    def timed(run, carry0, n):
        nonlocal fence_sum
        bs = batches(n)
        # Fence the async h2d transfer of the scanned inputs: through
        # the tunnel, device_put returns long before the bytes arrive
        # (~25 MB/s link), and the scan's wait-for-input would land in
        # the timed region (~470 us/step at LONG=110 — measured; this
        # artifact dominated every component before the fence).
        if fence_sum is None:
            fence_sum = jax.jit(
                lambda x: sum(jnp.sum(v) for v in x.values())
            )
        np.asarray(fence_sum(bs))
        t0 = time.perf_counter()
        carry, out = run(carry0, bs)
        # Honest fence: device→host fetch of the last output.
        np.asarray(jax.tree_util.tree_leaves(out)[-1][-1])
        return time.perf_counter() - t0, carry

    for name, make in variants.items():
        run, carry0 = make()
        # Warm up BOTH scan lengths (each is a distinct compiled
        # program; timing an unwarmed length measures compilation).
        for n in (SHORT, LONG, SHORT):
            _, carry0 = timed(run, carry0, n)
        ts, carry0 = timed(run, carry0, SHORT)
        tl, carry0 = timed(run, carry0, LONG)
        per_step = (tl - ts) / (LONG - SHORT)
        print(
            f"{name:12s} {per_step * 1e6:8.1f} us/step "
            f"({BATCH / per_step / 1e6:6.2f} Mex/s)"
        )


if __name__ == "__main__":
    main()
