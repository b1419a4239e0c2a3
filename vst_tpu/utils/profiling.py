"""Profiling / tracing hooks.

The reference's only instrumentation is tqdm postfixes
(ReCoNet/train_single/train_candy.py:155-167).  Here:

- ``trace_context`` wraps a code region in a ``jax.profiler`` trace (view
  with TensorBoard / xprof).
- ``StepTimer`` collects wall-clock step times with warm-up skipping and
  percentile summaries; on tunneled TPU platforms pass a ``fetch`` function
  (e.g. ``lambda out: float(out)``) since dispatch is fully asynchronous.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace_context(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    @property
    def times(self):
        return list(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
