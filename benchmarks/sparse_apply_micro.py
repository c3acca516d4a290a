"""Micro-benchmark: scatter vs blocked-kernel sparse adagrad update.

Times `apply_sparse` alone (the embedding engine's update phase) on the
headline bench shape: V=131072, D=64, n=4096 random ids. Uses the
scan-differencing method from bench.py (chained data dependence, two
scan lengths, device->host fetch as the fence) to cancel dispatch
overhead — see CLAUDE.md "Environment gotchas".

Usage: python benchmarks/sparse_apply_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import sparse_optimizer

V, D, N = 131_072, 64, 4096
SHORT, LONG = 10, 110

SPEC = config_lib.OptimizerSpec(kind="adagrad", learning_rate=0.1)


def timed(use_kernel, block_rows=512, chunk=32):
    seed = int(time.time() * 1000) % (2**31)  # chip memoizes fixed seeds
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    slots = sparse_optimizer.init_slots(SPEC, table)
    ids = jnp.asarray(
        rng.randint(0, V, size=(LONG, N)).astype(np.int32)
    )
    grads = jnp.asarray(
        rng.normal(size=(LONG, N, D)).astype(np.float32) * 1e-3
    )

    def chain(n_steps):
        @jax.jit
        def run(table, accum):
            def body(carry, x):
                t, a = carry
                i, g = x
                # Chain data dependence: ids offset by a value read from
                # the evolving table so steps can't collapse.
                if use_kernel:
                    t2, s2 = sparse_optimizer._apply_sparse_kernel(
                        SPEC, t, {"accumulator": a}, i, g,
                        jnp.zeros((), jnp.int32), None,
                        block_rows=block_rows, chunk=chunk,
                    )
                else:
                    t2, s2 = sparse_optimizer.apply_sparse(
                        SPEC, t, {"accumulator": a}, i, g,
                        jnp.zeros((), jnp.int32),
                    )
                return (t2, s2["accumulator"]), ()

            (t, a), _ = jax.lax.scan(
                body, (table, accum),
                (ids[:n_steps], grads[:n_steps]),
            )
            return t[0, 0] + a[0, 0]

        return run

    short_fn, long_fn = chain(SHORT), chain(LONG)
    # Warm up compiles.
    np.asarray(short_fn(table, slots["accumulator"]))
    np.asarray(long_fn(table, slots["accumulator"]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(short_fn(table, slots["accumulator"]))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(long_fn(table, slots["accumulator"]))
        t_long = time.perf_counter() - t0
        times.append((t_long - t_short) / (LONG - SHORT))
    return min(times)


def main():
    print(f"adagrad update V={V} D={D} n={N}:", flush=True)
    mode = os.environ.get("MODE", "scatter")
    if mode == "scatter":
        t = timed(False)
        print(f"  scatter: {t*1e6:.0f} us/step", flush=True)
    else:
        br = int(os.environ.get("BR", "512"))
        ch = int(os.environ.get("CH", "32"))
        t = timed(True, block_rows=br, chunk=ch)
        print(
            f"  kernel block_rows={br} chunk={ch}: "
            f"{t*1e6:.0f} us/step",
            flush=True,
        )


if __name__ == "__main__":
    main()
