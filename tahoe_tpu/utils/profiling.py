"""Timing & profiling utilities.

The reference's tracing is gettimeofday around warmup+timed epochs with device
sync fences (BaseTahoeTest.h:567-577) plus cudaProfiler markers in dead code.
Here: the slope-timing harness every benchmark in this repo uses (the remote
TPU runtime acks dispatches before execution, so a host read is the only
fence), and an optional XLA profiler trace wrapper.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable


def fence(result) -> float:
    """Force device completion by pulling one scalar to the host."""
    import numpy as np

    return float(np.asarray(result).ravel()[0])


def slope_time(run_k: Callable[[int], object], k1: int = 3, k2: int = 27,
               n: int = 3) -> float:
    """Seconds per iteration via the chained-iteration slope.

    ``run_k(k)`` must execute k serialized device iterations (e.g. an
    engine's ``predict_k``). The slope cancels dispatch, fence round-trip,
    and any per-call executable re-shipping.
    """
    import numpy as np

    def timed(k):
        fence(run_k(k))  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fence(run_k(k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = timed(k1), timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def us_per_sample(engine, data, rows: int, *, k1: int = 3, k2: int = 27) -> float:
    """Slope-timed per-sample latency of an engine with predict_k."""
    return slope_time(lambda k: engine.predict_k(data, k), k1, k2) * 1e6 / rows


@contextlib.contextmanager
def xla_trace(logdir: str):
    """jax.profiler trace context (viewable in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
