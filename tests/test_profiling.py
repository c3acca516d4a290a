"""Profiling utility tests."""

import time

import numpy as np

from recommenders_tpu.utils import profiling


def test_step_timer_skips_warmup():
    timer = profiling.StepTimer(warmup=2)
    for i in range(5):
        with timer.step(batch_size=100):
            time.sleep(0.01)
    summary = timer.summary()
    assert summary["steps_timed"] == 3
    assert 5 <= summary["mean_step_ms"] < 100
    assert summary["examples_per_sec"] > 0


def test_annotate_context_runs():
    with profiling.annotate("region"):
        x = np.ones(4).sum()
    assert x == 4.0


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "prof")
    with profiling.trace(logdir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import glob
    import os

    assert glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
