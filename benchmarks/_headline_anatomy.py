"""Micro-anatomy of the HEADLINE bench step at its exact configuration.

bench.py defaults: bf16 tables + stochastic rounding, f32 Adagrad slots,
table stacking (user 65536 + item 131072 = one 196608-row group), bf16
scoring. Each piece below is timed at that exact shape with chained
lax.scan differencing (T(110)-T(10))/100 and a device->host fetch fence
(CLAUDE.md), so the components can be compared against the full step
and the unexplained residual located.

Pieces:
  sort        pack-sort of the stacked 8192-id key vector
  permute     sorted_grads = grads[order] ([8192, 64] f32 row gather)
  pairlist    searchsorted block boundaries + chunk flattening
  kernel      sorted_block_apply, presorted input, stacked states
  gathers     the two forward table row-gathers (bf16)
  loss        in-batch softmax fwd+bwd from resident activations
  full        engine.grad_and_update (the real step)

Usage: python benchmarks/_headline_anatomy.py
"""

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
V = NUM_USERS + NUM_ITEMS
SHORT, LONG = 10, 110


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib
    from recommenders_tpu.embedding import sparse_optimizer
    from recommenders_tpu.ops import sparse_apply

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))

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
        dtype=jnp.bfloat16,
        stack_tables=True,
    )
    state = engine.init(jax.random.PRNGKey(0))
    task = tasks_lib.Retrieval(score_dtype=jnp.bfloat16)

    def loss_of(acts):
        return task(acts["user_id"], acts["item_id"]).loss

    def id_batches(n, hi, m=2 * BATCH):
        return jnp.asarray(
            rng.randint(0, hi, (n, m)).astype(np.int32)
        )

    def feat_batches(n):
        return jax.device_put({
            "user_id": rng.randint(0, NUM_USERS, (n, BATCH)).astype(
                np.int32
            ),
            "item_id": rng.randint(0, NUM_ITEMS, (n, BATCH)).astype(
                np.int32
            ),
        })

    results = {}

    def timed(name, make):
        run, carry0, data = make
        # Warm both program shapes.
        c = jax.tree_util.tree_map(jnp.copy, carry0)
        c, _ = run(c, jax.tree_util.tree_map(lambda d: d[:SHORT], data))
        c, out = run(c, data)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[-1]
        ts = []
        for _ in range(3):
            c = jax.tree_util.tree_map(jnp.copy, carry0)
            t0 = time.perf_counter()
            c, out = run(
                c, jax.tree_util.tree_map(lambda d: d[:SHORT], data)
            )
            np.asarray(jax.tree_util.tree_leaves(out)[0])[-1]
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            c, out = run(c, data)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[-1]
            t_l = time.perf_counter() - t0
            ts.append((t_l - t_s) / (LONG - SHORT))
        us = sorted(ts)[1] * 1e6
        results[name] = us
        print(f"{name:10s} {us:8.1f} us/step", file=sys.stderr)

    n2 = 2 * BATCH
    nbits = (n2 - 1).bit_length()

    # --- sort: pack-sort 8192 stacked ids -------------------------------
    def mk_sort():
        data = id_batches(LONG, V)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, ids):
                ids = (ids + carry) % V
                key = (
                    ids.astype(jnp.uint32) << nbits
                ) | jnp.arange(n2, dtype=jnp.uint32)
                key = jax.lax.sort(key)
                return key[0].astype(jnp.int32), key[0]
            return jax.lax.scan(body, carry, bs)

        return run, jnp.int32(0), data

    # --- permute: grads[order] ------------------------------------------
    def mk_permute():
        data = id_batches(LONG, n2)
        grads = jax.random.normal(
            jax.random.PRNGKey(1), (n2, DIM), jnp.float32
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, order):
                order = (order + carry) % n2
                g = grads[order]
                s = g[0, 0]
                return s.astype(jnp.int32) % n2, s
            return jax.lax.scan(body, carry, bs)

        return run, jnp.int32(0), data

    # --- pairlist: searchsorted boundaries ------------------------------
    def mk_pairlist():
        data = id_batches(LONG, V)
        br = 2048
        nb = V // br

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, ids):
                ids = jnp.sort((ids + carry) % V)
                bounds = jnp.searchsorted(
                    ids, jnp.arange(nb + 1, dtype=jnp.int32) * br,
                    side="left",
                ).astype(jnp.int32)
                return bounds[-1] % V, bounds[0]
            return jax.lax.scan(body, carry, bs)

        return run, jnp.int32(0), data

    # --- kernel: presorted stacked update -------------------------------
    def mk_kernel():
        slot_names, scalars, rule, _ = sparse_optimizer._kernel_rule(
            spec, jnp.int32(0)
        )
        group = engine._stacks[0] if hasattr(engine, "_stacks") else None
        table = state.tables[list(state.tables)[0]]
        slots = state.slots[list(state.slots)[0]]
        if table.shape[0] != V:  # stacked group array expected
            print("warn: table not stacked as expected", file=sys.stderr)
        pre = jnp.sort(
            jnp.asarray(rng.randint(0, V, n2).astype(np.int32))
        )
        grads = jax.random.normal(
            jax.random.PRNGKey(1), (n2, DIM), jnp.float32
        ) * 1e-3
        states0 = (table,) + tuple(slots[nm] for nm in slot_names)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(sts, bs):
            def body(sts, salt):
                new = sparse_apply.sorted_block_apply(
                    sts, pre, grads * (1.0 + salt[0] * 1e-9), rule,
                    scalars=scalars, block_rows=3072,
                    stochastic_round_seed=salt[0],
                )
                return tuple(new), new[1][0, 0]
            return jax.lax.scan(body, sts, bs)

        data = id_batches(LONG, V)
        return run, jax.tree_util.tree_map(jnp.copy, states0), data

    # --- gathers ---------------------------------------------------------
    def mk_gathers():
        data = feat_batches(LONG)
        tbl = {k: v for k, v in state.tables.items()}
        names = list(tbl)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                salt = carry.astype(jnp.int32)
                u = tbl[names[0]][(b["user_id"] + salt) % NUM_USERS]
                i = tbl[names[0]][(b["item_id"] + salt) % NUM_ITEMS]
                s = u[0, 0].astype(jnp.float32) + i[0, 0].astype(
                    jnp.float32
                )
                return s, s
            return jax.lax.scan(body, carry, bs)

        return run, jnp.float32(0), data

    # --- loss -------------------------------------------------------------
    def mk_loss():
        data = feat_batches(LONG)
        u0 = jax.random.normal(
            jax.random.PRNGKey(2), (BATCH, DIM), jnp.float32
        )
        i0 = jax.random.normal(
            jax.random.PRNGKey(3), (BATCH, DIM), jnp.float32
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, bs):
            def body(carry, b):
                acts = {
                    "user_id": u0 + carry,
                    "item_id": i0 - carry,
                }
                loss, g = jax.value_and_grad(loss_of)(acts)
                return g["user_id"][0, 0] * 1e-9, loss
            return jax.lax.scan(body, carry, bs)

        return run, jnp.float32(0), data

    # --- full --------------------------------------------------------------
    def mk_full():
        data = feat_batches(LONG)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st, bs):
            def body(st, b):
                s, loss, _ = engine.grad_and_update(st, b, loss_of)
                return s, loss
            return jax.lax.scan(body, st, bs)

        return run, jax.tree_util.tree_map(jnp.copy, state), data

    for name, make in (
        ("sort", mk_sort),
        ("permute", mk_permute),
        ("pairlist", mk_pairlist),
        ("kernel", mk_kernel),
        ("gathers", mk_gathers),
        ("loss", mk_loss),
        ("full", mk_full),
    ):
        timed(name, make())

    import json

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
