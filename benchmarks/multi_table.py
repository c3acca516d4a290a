"""Many-small-tables training step: stacked vs per-table updates.

DLRM-style workloads carry dozens of categorical tables (the reference's
prebuilt Ranking model defaults to the Criteo layout: 26 sparse
features, `/root/reference/tensorflow_recommenders/experimental/models/
ranking.py:27`). Per-table sparse-update fixed costs (sort, pair-list
construction, kernel launch, pipeline ramp) then dominate the step.
`EmbeddingEngine(stack_tables=True)` amortizes them: every
same-(dim, optimizer) table lives in one physical array and the whole
group updates in ONE sorted blocked-kernel sweep.

This benchmark times one engine step (lookup → in-batch loss fwd/bwd →
sparse update) over 26 tables, stacked vs unstacked, using the same
chained-scan differencing + h2d staging fence as
benchmarks/step_breakdown.py.

Usage: python benchmarks/multi_table.py [--tables 26] [--dim 32]
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
SHORT, LONG = 10, 110


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tables", type=int, default=26)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument(
        "--production-numerics", action="store_true",
        help="bench.py's round-5 defaults: bf16 slots (SR) and "
        "hi-only grad routing (default: f32 slots, exact routing)",
    )
    p.add_argument(
        "--pipelined", action="store_true",
        help="1-step-stale embedding pipelining "
        "(engine.pipelined_grad_and_update): the pending sparse sweep "
        "overlaps the next step's forward/loss — the reference's "
        "pipeline_execution_with_tensor_core, the standard DLRM "
        "production recipe.",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))

    # Criteo-flavoured vocab spread: a few large tables, many small.
    vocabs = [
        int(v)
        for v in np.geomspace(2_000, 1_000_000, args.tables).round()
    ]
    fcs = tuple(
        cfg.FeatureConfig(
            table=cfg.TableConfig(v, args.dim, name=f"t{i:02d}"),
            name=f"f{i:02d}",
        )
        for i, v in enumerate(vocabs)
    )
    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.05)

    def batches(n):
        return jax.device_put({
            f"f{i:02d}": rng.randint(
                0, vocabs[i], (n, BATCH)
            ).astype(np.int32)
            for i in range(args.tables)
        })

    def loss_of(acts):
        # Two-tower-ish: dot the summed halves (keeps every activation
        # on the gradient path without a [B, B] blowup per table).
        names = sorted(acts)
        h = len(names) // 2
        q = sum(acts[n] for n in names[:h])
        c = sum(acts[n] for n in names[h:])
        return jnp.sum(
            jax.nn.log_softmax(
                q.astype(jnp.bfloat16) @ c.astype(jnp.bfloat16).T
            ).diagonal()
        ) * -1.0

    fence = None

    def timed(run, carry0, n):
        nonlocal fence
        bs = batches(n)
        if fence is None:
            fence = jax.jit(
                lambda x: sum(jnp.sum(v) for v in x.values())
            )
        np.asarray(fence(bs))
        t0 = time.perf_counter()
        carry, out = run(carry0, bs)
        np.asarray(jax.tree_util.tree_leaves(out)[-1][-1])
        return time.perf_counter() - t0, carry

    # HBM roofline for the whole step. The update is a blocked sweep:
    # with 4096 uniform ids per 26 tables every block of every table is
    # touched, so the floor is the full table+slot state read+written
    # once (the same model as bench.py's), plus forward gathers and the
    # grad rows' round-trip. v5e: ~819 GB/s.
    total_rows = sum(
        (v + 127) // 128 * 128 for v in vocabs
    )
    slot_bytes = 2 if args.production_numerics else 4
    sweep = 2 * total_rows * args.dim * (2 + slot_bytes)
    gathers = args.tables * BATCH * args.dim * 2
    grads = 2 * args.tables * BATCH * args.dim * 4
    floor_us = (sweep + gathers + grads) / 819e9 * 1e6
    print(
        f"state: {total_rows} stacked rows, HBM step floor "
        f"{floor_us:.0f} us ({(sweep + gathers + grads) / 1e6:.0f} MB)",
        file=sys.stderr,
    )

    for stacked in (False, True):
        engine = engine_lib.EmbeddingEngine(
            fcs,
            optimizer=spec,
            dtype=jnp.bfloat16,
            slot_dtype=(
                jnp.bfloat16 if args.production_numerics else None
            ),
            exact_grad_routing=not args.production_numerics,
            stack_tables=stacked,
        )
        state = engine.init(jax.random.PRNGKey(0))

        if args.pipelined:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, bs, engine=engine):
                def body(carry, b):
                    st, pending = carry
                    st, pending, loss, _ = (
                        engine.pipelined_grad_and_update(
                            st, pending, b, loss_of
                        )
                    )
                    return (st, pending), loss
                return jax.lax.scan(body, carry, bs)

            prime = {k: v[0] for k, v in batches(1).items()}
            st0, pending0, _, _ = jax.jit(
                lambda st, b: engine.pipelined_grad_and_update(
                    st, None, b, loss_of
                )
            )(state, prime)
            carry = (st0, pending0)
        else:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(st, bs, engine=engine):
                def body(st, b):
                    s, loss, _ = engine.grad_and_update(st, b, loss_of)
                    return s, loss
                return jax.lax.scan(body, st, bs)

            carry = state
        for n in (SHORT, LONG, SHORT):
            _, carry = timed(run, carry, n)
        ts, carry = timed(run, carry, SHORT)
        tl, carry = timed(run, carry, LONG)
        per = (tl - ts) / (LONG - SHORT)
        label = "stacked" if stacked else "per-table"
        print(
            f"{label:10s} {per * 1e6:8.1f} us/step "
            f"({BATCH / per / 1e6:6.2f} Mex/s, {args.tables} tables, "
            f"{per * 1e6 / floor_us:.1f}x HBM floor)"
        )


if __name__ == "__main__":
    main()
