"""
Profiling / tracing hooks (no reference counterpart — SURVEY.md §5 notes the
reference has none; this is the TPU-native addition).

- `trace(dir)` context manager around jax.profiler for TensorBoard traces
- `StepTimer` host-side step-time breakdown (data / step / total)
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """jax.profiler trace context (view in TensorBoard or xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates data-wait vs device-step wall time per epoch."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.steps = 0
        self._mark = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_time += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time += now - self._mark
        self._mark = now
        self.steps += 1

    def summary(self):
        n = max(self.steps, 1)
        return {
            'data_ms_per_step': 1000.0 * self.data_time / n,
            'step_ms_per_step': 1000.0 * self.step_time / n,
            'data_fraction': self.data_time /
            max(self.data_time + self.step_time, 1e-9),
        }
