"""Profiling and tracing hooks.

The reference has no profiler (SURVEY §5). Here: a context manager
around ``jax.profiler`` traces, named annotations for factor-level
attribution inside jitted objectives, and a step timer for quick
throughput numbers.
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax profiler trace (viewable in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace scope; use inside compute() to attribute factors."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock steps/sec with device synchronization.

    >>> timer = StepTimer()
    >>> for _ in range(n): out = step(...)
    >>> print(timer.rate(n, out))
    """

    def __init__(self):
        self.t0 = time.perf_counter()

    def reset(self):
        self.t0 = time.perf_counter()

    def rate(self, n_steps, sync_value=None):
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        return n_steps / (time.perf_counter() - self.t0)
