"""Logging, smoothed metrics and wall-clock timers.

Parity targets: the reference's profiler (`diffnext/utils/profiler/timer.py:23-62`,
`profiler/stats.py:22-42`) and the multi-process logger
(`diffnext/utils/accelerate_utils.py:71-94`). Host-side only; never traced.
"""

import collections
import contextlib
import datetime
import logging
import os
import sys
import time
from typing import Optional


class SmoothedValue:
    """Track a series of values with a sliding window and global mean."""

    def __init__(self, window_size: int = 20):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(float(value))
        self.count += 1
        self.total += float(value)

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def average(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_average(self) -> float:
        return self.total / max(self.count, 1)


class Timer:
    """Accumulating tic/toc timer with a context-manager helper."""

    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.monotonic()
        return self

    def toc(self, average: bool = True):
        self.diff = time.monotonic() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    @contextlib.contextmanager
    def tic_and_toc(self):
        try:
            yield self.tic()
        finally:
            self.toc()


def get_progress(timer: Timer, step: int, max_steps: int) -> str:
    """Return a PROGRESS/SPEED/ETA status string."""
    eta_seconds = timer.average_time * (max_steps - step)
    eta = str(datetime.timedelta(seconds=int(eta_seconds)))
    progress = (step + 1.0) / max_steps
    return "< PROGRESS: {:.2%} | SPEED: {:.3f}s / iter | ETA: {} >".format(
        progress, timer.average_time, eta
    )


_logger_cache = {}


def get_logger(name: str = "nova_tpu", output_dir: Optional[str] = None,
               process_index: int = 0) -> logging.Logger:
    """Return a process-aware logger; non-zero processes log at WARNING only."""
    key = (name, output_dir, process_index)
    if key in _logger_cache:
        return _logger_cache[key]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if process_index == 0 else logging.WARNING)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s] %(message)s", "%H:%M:%S")
    if not logger.handlers:
        stream = logging.StreamHandler(sys.stdout)
        stream.setFormatter(fmt)
        logger.addHandler(stream)
        if output_dir and process_index == 0:
            os.makedirs(os.path.join(output_dir, "logs"), exist_ok=True)
            stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            fh = logging.FileHandler(os.path.join(output_dir, "logs", f"{stamp}.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    _logger_cache[key] = logger
    return logger
