"""Tracing / profiling / throughput metering.

The reference's only instrumentation is a wall-clock per epoch
(``graph_kernel.py:584,623-628``). Here (SURVEY.md section 5, tracing):

- ``trace(logdir)``: context manager around ``jax.profiler`` trace capture
  (viewable in TensorBoard / Perfetto).
- ``StepTimer``: streaming steps/sec + examples/sec meter with warmup
  discard — the north-star throughput number as a first-class object.
- ``annotate``: named trace region (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the duration of the block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Streaming throughput meter.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in loader:
    ...     step(...)
    ...     timer.tick(examples=batch_size)
    >>> timer.steps_per_sec, timer.examples_per_sec
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._count = 0
        self._examples = 0
        self._t0: Optional[float] = None
        self._last = None

    def tick(self, examples: int = 0) -> None:
        now = time.perf_counter()
        self._count += 1
        self._last = now
        if self._count == self.warmup:
            self._t0 = now
            self._examples = 0
        elif self._count > self.warmup:
            self._examples += examples

    def stop(self) -> None:
        """Mark the true end of the measured region. Call AFTER forcing
        device completion (a value read) — ticks fire at dispatch time,
        so without this the meter reports async dispatch rate, not
        throughput (the axon backend dispatches an entire epoch in
        milliseconds)."""
        self._last = time.perf_counter()

    @property
    def measured_steps(self) -> int:
        return max(0, self._count - self.warmup)

    @property
    def elapsed(self) -> float:
        if self._t0 is None or self._last is None:
            return 0.0
        return self._last - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.measured_steps / self.elapsed if self.elapsed > 0 else 0.0

    @property
    def examples_per_sec(self) -> float:
        return self._examples / self.elapsed if self.elapsed > 0 else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.measured_steps,
            "seconds": self.elapsed,
            "steps_per_sec": self.steps_per_sec,
            "examples_per_sec": self.examples_per_sec,
        }
