"""Probe the stacked headline kernel's 2.8x-over-floor residual.

Variants of the presorted sorted_block_apply call at the exact headline
shape (V=196608 stacked, n=8192, d=64, bf16 table + f32 adagrad slot):
SR on/off, block_rows, chunk — scan-differenced on the real chip.

Usage: python benchmarks/_kernel_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

V = 196_608
N = 8_192
DIM = 64
SHORT, LONG = 10, 110


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import sparse_optimizer
    from recommenders_tpu.ops import sparse_apply

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))
    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)
    slot_names, scalars, rule = sparse_optimizer._kernel_rule(
        spec, jnp.int32(0)
    )

    table = jnp.asarray(
        rng.normal(size=(V, DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)
    slot = jnp.asarray(
        np.abs(rng.normal(size=(V, DIM))).astype(np.float32)
    )
    pre = jnp.sort(jnp.asarray(rng.randint(0, V, N).astype(np.int32)))
    grads = jnp.asarray(
        rng.normal(size=(N, DIM)).astype(np.float32)
    ) * 1e-3

    def timed(name, br, chunk, use_sr):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(sts, salts):
            def body(sts, salt):
                new = sparse_apply.sorted_block_apply(
                    sts, pre, grads * (1.0 + salt * 1e-9), rule,
                    scalars=scalars, block_rows=br, chunk=chunk,
                    stochastic_round_seed=salt if use_sr else None,
                )
                return tuple(new), new[1][0, 0]
            return jax.lax.scan(body, sts, salts)

        salts = jnp.arange(LONG, dtype=jnp.int32)
        sts = (jnp.copy(table), jnp.copy(slot))
        sts, _ = run(sts, salts[:SHORT])
        sts, out = run(sts, salts)
        np.asarray(out)[-1]
        ts = []
        for _ in range(3):
            sts = (jnp.copy(table), jnp.copy(slot))
            t0 = time.perf_counter()
            sts, out = run(sts, salts[:SHORT])
            np.asarray(out)[-1]
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            sts, out = run(sts, salts)
            np.asarray(out)[-1]
            t_l = time.perf_counter() - t0
            ts.append((t_l - t_s) / (LONG - SHORT) * 1e6)
        print(f"{name:28s} {sorted(ts)[1]:8.1f} us/step",
              file=sys.stderr)

    for name, br, chunk, sr in (
        ("br2048 c128 SR", 2048, 128, True),
        ("br2048 c128 noSR", 2048, 128, False),
        ("br2048 c256 SR", 2048, 256, True),
        ("br1024 c128 SR", 1024, 128, True),
        ("br4096 c128 SR", 4096, 128, True),
        ("br2048 c512 SR", 2048, 512, True),
        ("br2048 c512 noSR", 2048, 512, False),
    ):
        try:
            timed(name, br, chunk, sr)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", file=sys.stderr)


if __name__ == "__main__":
    main()
