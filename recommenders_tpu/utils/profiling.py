"""Profiling hooks: jax.profiler tracing + throughput accounting.

The reference has no in-repo profiling (SURVEY.md §5) and leans on the
external TF Profiler; here tracing is first-class: wrap any code in
`trace(logdir)` to capture a TensorBoard-viewable profile, annotate
regions with `annotate`, and measure steady-state step time with
`StepTimer` (which skips compilation steps).

```python
with profiling.trace("/tmp/profile"):
    for batch in batches:
        with profiling.annotate("train_step"):
            state, loss = trainer.train_step(state, batch)
```
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Captures a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(
        logdir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state step timing that excludes warmup/compile steps.

    ```python
    timer = StepTimer(warmup=3)
    for batch in batches:
        with timer.step(batch_size):
            state, loss = trainer.train_step(state, batch)
    print(timer.summary())
    ```
    """

    def __init__(self, warmup: int = 3) -> None:
        self.warmup = warmup
        self._steps = 0
        self._timed_steps = 0
        self._total_time = 0.0
        self._total_examples = 0

    @contextlib.contextmanager
    def step(self, batch_size: Optional[int] = None):
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self._steps += 1
        if self._steps > self.warmup:
            self._timed_steps += 1
            self._total_time += elapsed
            if batch_size:
                self._total_examples += batch_size

    @property
    def mean_step_seconds(self) -> float:
        return self._total_time / max(self._timed_steps, 1)

    @property
    def examples_per_sec(self) -> float:
        return self._total_examples / max(self._total_time, 1e-12)

    def summary(self) -> dict:
        return {
            "steps_timed": self._timed_steps,
            "mean_step_ms": self.mean_step_seconds * 1e3,
            "examples_per_sec": self.examples_per_sec,
        }
