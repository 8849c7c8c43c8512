"""Profiling hooks: jax.profiler traces and simple step timing.

The reference has no profiler (a commented-out timer at
`trainer/model_trainer.py:35`). Here profiling is first-class: wrap any region
in ``profile_trace`` to emit a TensorBoard-viewable XLA trace, and use
``StepTimer`` for cheap steady-state throughput numbers.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that skips warmup/compile steps."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.count >= self.skip_first:
            self.total += dt
        self.count += 1
        return False

    @property
    def steps_timed(self):
        return max(self.count - self.skip_first, 0)

    @property
    def mean_step_s(self):
        return self.total / self.steps_timed if self.steps_timed else float("nan")
