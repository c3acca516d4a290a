"""Throwaway probe: sorted_block_apply (block_rows, chunk) sweep on chip.

One adagrad update on the item-table shape of bench.py's workload
(V=131072, D=64, n=4096 presorted ids), timed by chained-scan
differencing with the h2d staging fence.
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

V = 131_072
D = 64
N = 4096
SHORT, LONG = 10, 110


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import sparse_optimizer as so

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))
    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)

    dtype_arg = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    table = jnp.asarray(
        rng.normal(size=(V, D)).astype(np.float32), dtype=dtype_arg
    )
    slots = {"accumulator": jnp.zeros((V, D), jnp.float32)}
    g0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 1e-3)
    ids = jnp.sort(
        jnp.asarray(rng.randint(0, V, N).astype(np.int32))
    )

    def variant(br, chunk):
        slot_names, scalars, rule, _ = so._kernel_rule(
            spec, jnp.int32(0)
        )

        @jax.jit
        def run(carry, xs):
            def body(carry, x):
                t, s = carry
                states = (t,) + tuple(s[nm] for nm in slot_names)
                new = so.sparse_apply.sorted_block_apply(
                    states, ids, g0 * x, rule,
                    scalars=scalars, block_rows=br, chunk=chunk,
                )
                return (new[0], dict(zip(slot_names, new[1:]))), x
            return jax.lax.scan(body, carry, xs)

        return run

    def timed(run, carry, n):
        xs = jax.device_put(
            jnp.asarray(1.0 + rng.rand(n).astype(np.float32) * 1e-3)
        )
        np.asarray(jnp.sum(xs))
        t0 = time.perf_counter()
        carry, out = run(carry, xs)
        np.asarray(jax.tree_util.tree_leaves(carry)[0][0, 0])
        return time.perf_counter() - t0, carry

    brs = tuple(
        int(x) for x in os.environ.get("BRS", "512,1024,2048,4096").split(",")
    )
    chunks = tuple(
        int(x) for x in os.environ.get("CHS", "128,256,512").split(",")
    )
    for br in brs:
        for chunk in chunks:
            try:
                run = variant(br, chunk)
                carry = (table, dict(slots))
                for n in (SHORT, LONG, SHORT):
                    _, carry = timed(run, carry, n)
                pers = []
                for _ in range(3):
                    ts, carry = timed(run, carry, SHORT)
                    tl, carry = timed(run, carry, LONG)
                    pers.append((tl - ts) / (LONG - SHORT))
                per = min(pers)
                print(
                    f"br={br:5d} chunk={chunk:4d} {per * 1e6:8.1f} us"
                    f"   (3 trials: "
                    f"{', '.join(f'{p*1e6:.0f}' for p in pers)})"
                )
            except Exception as e:  # noqa: BLE001
                print(f"br={br:5d} chunk={chunk:4d} FAIL {e}")


if __name__ == "__main__":
    main()
