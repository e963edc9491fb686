"""Profiling helpers.

The reference has zero in-code instrumentation (no cudaEvent/clock();
profiling was external gprof + time(1), SURVEY.md §5).  Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace of the wrapped region;
* :func:`timed` — wall-clock a thunk with ``block_until_ready`` fencing
  (the only honest way to time async dispatch).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace('/tmp/pqp_trace'): run()`` then inspect with
    TensorBoard or ui.perfetto.dev."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(thunk, repeats: int = 3, warmup: int = 1):
    """Return ``(best_seconds, last_result)`` with device fencing."""
    import jax

    result = None
    for _ in range(warmup):
        result = thunk()
        jax.block_until_ready(result)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = thunk()
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
