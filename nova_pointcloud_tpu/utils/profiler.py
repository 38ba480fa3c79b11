"""Profiling hooks: jax.profiler traces + the wall-clock timers.

The reference instruments with host timers only (`diffnext/utils/profiler/`);
the TPU-native equivalent adds XLA device traces viewable in
TensorBoard/Perfetto (SURVEY.md §5 "tracing / profiling").
"""

import contextlib
import os
from typing import Optional

import jax

from nova_pointcloud_tpu.utils.logging import SmoothedValue, Timer  # noqa: F401


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nova_trace", enabled: bool = True):
    """Capture a device trace around a block: with trace("..."): step()."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Optional periodic trace capture inside a training loop."""

    def __init__(self, log_dir: Optional[str] = None, trace_at_step: int = 10,
                 num_steps: int = 3):
        self.log_dir = log_dir
        self.trace_at, self.num_steps = trace_at_step, num_steps
        self._active = False

    def maybe_start(self, step: int):
        if self.log_dir and step == self.trace_at and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.trace_at + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
