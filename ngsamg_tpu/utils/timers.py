"""Tracing / profiling utilities.

The reference instruments every significant function with NGSolve Timers +
RegionTimers (SURVEY.md section 5; e.g. base_factory.cpp:223,
amg_matrix.cpp:168-178 per-level cycle timers). Here: lightweight named
wall-clock accumulators for the host setup phase, plus `jax.profiler`
trace annotations for the device solve phase (visible in TensorBoard /
Perfetto traces captured with `start_trace`).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_ACC: dict[str, list] = defaultdict(lambda: [0.0, 0])


@contextlib.contextmanager
def timer(name: str):
    """Accumulating host timer (the reference's static Timer/RegionTimer)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        acc = _ACC[name]
        acc[0] += time.perf_counter() - t0
        acc[1] += 1


@contextlib.contextmanager
def device_region(name: str):
    """Named region in the device profile (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def report(reset: bool = False) -> str:
    lines = ["timer                              total_s   calls"]
    for name in sorted(_ACC, key=lambda n: -_ACC[n][0]):
        tot, calls = _ACC[name]
        lines.append(f"{name:32s} {tot:9.3f} {calls:7d}")
    if reset:
        _ACC.clear()
    return "\n".join(lines)


def trace(logdir: str = "/tmp/ngsamg_trace"):
    """Capture a device trace around a block:

    with trace():
        pc.solve(b)
    then inspect with TensorBoard / xprof.
    """
    import jax

    return jax.profiler.trace(logdir)
