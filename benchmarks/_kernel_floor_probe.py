"""Throwaway probe: close the headline update kernel's gap to its floor.

Measures `sorted_block_apply` at bench.py's EXACT headline shape
(stacked V=196608, D=64, n=8192 presorted, bf16 table with stochastic
rounding) across:
  - (block_rows, chunk) grid — pair-count vs routing-work trade
  - slot layouts: f32 full (headline today), bf16 full + SR, rowwise
    [V, 1] f32 (quality-equivalent ladders with smaller HBM floors)

Prints the modeled HBM floor for each state layout next to the
measurement so the floor ratio is explicit.

Usage: python benchmarks/_kernel_floor_probe.py [--grid]
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

V = 196_608
D = 64
N = 8_192
SHORT, LONG = 10, 110
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import sparse_optimizer as so

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))

    table = jnp.asarray(
        rng.normal(size=(V, D)).astype(np.float32), dtype=jnp.bfloat16
    )
    g0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 1e-3)
    ids = jnp.sort(jnp.asarray(rng.randint(0, V, N).astype(np.int32)))

    def floor_us(slot_kind):
        slot_bytes = {"f32": 4 * D, "bf16": 2 * D, "rowwise": 4}[slot_kind]
        per_row = D * 2 + slot_bytes
        mb = V * per_row * 2 / 1e6
        return mb, mb * 1e3 / HBM_GBPS

    def variant(slot_kind, br, chunk):
        kind = "rowwise_adagrad" if slot_kind == "rowwise" else "adagrad"
        spec = cfg.OptimizerSpec(kind=kind, learning_rate=0.1)
        slot_names, scalars, rule, _ = so._kernel_rule(spec, jnp.int32(0))
        if slot_kind == "rowwise":
            slots = {"accumulator": jnp.zeros((V, 1), jnp.float32)}
        elif slot_kind == "bf16":
            slots = {"accumulator": jnp.zeros((V, D), jnp.bfloat16)}
        else:
            slots = {"accumulator": jnp.zeros((V, D), jnp.float32)}

        @jax.jit
        def run(carry, xs):
            def body(carry, x):
                t, s = carry
                states = (t,) + tuple(s[nm] for nm in slot_names)
                new = so.sparse_apply.sorted_block_apply(
                    states, ids, g0 * x, rule,
                    scalars=scalars, block_rows=br, chunk=chunk,
                    stochastic_round_seed=x.astype(jnp.int32),
                    need_count=False,
                )
                return (new[0], dict(zip(slot_names, new[1:]))), x
            return jax.lax.scan(body, carry, xs)

        return run, (table, slots)

    def timed(run, carry, n):
        xs = jax.device_put(
            jnp.asarray(1.0 + rng.rand(n).astype(np.float32) * 1e-3)
        )
        np.asarray(jnp.sum(xs))
        t0 = time.perf_counter()
        carry, out = run(carry, xs)
        np.asarray(jax.tree_util.tree_leaves(carry)[0][0, 0])
        return time.perf_counter() - t0, carry

    grid = "--grid" in sys.argv
    cases = []
    for slot_kind in ("f32", "bf16", "rowwise"):
        if grid:
            brs = (1024, 2048, 4096)
            chunks = (128, 256, 512)
        else:
            brs = (2048, 4096) if slot_kind != "f32" else (2048,)
            chunks = (256, 512)
        for br in brs:
            for chunk in chunks:
                cases.append((slot_kind, br, chunk))

    for slot_kind, br, chunk in cases:
        mb, fl = floor_us(slot_kind)
        try:
            run, carry0 = variant(slot_kind, br, chunk)
            carry = jax.tree_util.tree_map(jnp.copy, carry0)
            for n in (SHORT, LONG, SHORT):
                _, carry = timed(run, carry, n)
            pers = []
            for _ in range(3):
                ts, carry = timed(run, carry, SHORT)
                tl, carry = timed(run, carry, LONG)
                pers.append((tl - ts) / (LONG - SHORT))
            per = min(pers) * 1e6
            print(
                f"slot={slot_kind:7s} br={br:5d} chunk={chunk:4d} "
                f"{per:7.1f} us  floor={fl:5.1f} us ({mb:.0f} MB) "
                f"ratio={per / fl:4.2f}   (trials: "
                f"{', '.join(f'{p * 1e6:.0f}' for p in pers)})"
            )
        except Exception as e:  # noqa: BLE001
            print(f"slot={slot_kind} br={br} chunk={chunk} FAIL {e!r}"[:200])


if __name__ == "__main__":
    main()
