"""Profiling helpers.

The reference's only timing instrument is per-dependency stopwatches in the
health probes (SURVEY.md §5). Here: (a) every HTTP response carries an
``X-Response-Time-Ms`` header and a structured access log (server/http.py),
(b) ``device_trace`` captures a jax.profiler trace of the device scan for
offline analysis in TensorBoard/Perfetto, (c) ``Stopwatch`` is a tiny
monotonic timer used by the eval harness and benchmarks.
"""

from __future__ import annotations

import contextlib
import time


class Stopwatch:
    def __init__(self) -> None:
        self._start = time.monotonic()

    def elapsed_ms(self) -> float:
        return (time.monotonic() - self._start) * 1000.0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) for the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
