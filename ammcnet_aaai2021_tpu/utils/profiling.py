"""Profiling hooks.

The reference's only tracing is ad-hoc ``time.time()`` deltas
(train_helper.py:286-293,362-368 — which even logs sec/frame under the name
"fps", :423-426).  Here: a ``jax.profiler`` trace context for device
timelines plus a simple host-side step timer that reports honest
frames/sec/chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step/data timing with frames/sec accounting."""

    def __init__(self, window: int = 100):
        self.window = window
        self.step_times: list = []
        self.data_times: list = []
        self._t0: Optional[float] = None

    def data_tick(self, dt: float) -> None:
        self.data_times.append(dt)
        del self.data_times[: -self.window]

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.step_times.append(time.perf_counter() - t0)
        del self.step_times[: -self.window]

    def fps(self, frames_per_step: int) -> float:
        if not self.step_times:
            return 0.0
        return frames_per_step / float(np.mean(self.step_times))

    def summary(self, frames_per_step: int) -> str:
        return (f"step={np.mean(self.step_times or [0]):.4f}s "
                f"data={np.mean(self.data_times or [0]):.4f}s "
                f"fps/chip={self.fps(frames_per_step):.1f}")
