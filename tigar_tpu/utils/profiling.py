"""Lightweight phase timing + jax.profiler hooks.

The reference has no built-in tracing; its historical profiling (cProfile
on the preprocessing, BSplines.py:45-47) motivated its one native kernel.
Here phases are timed explicitly (blocking on device work) and full XLA
traces can be captured with the jax profiler for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time

import jax


class PhaseTimer:
    """Accumulating named phase timer; blocks on device completion so the
    numbers are honest under async dispatch."""

    def __init__(self):
        self.times = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=None):
        for name in sorted(self.times, key=self.times.get, reverse=True):
            n = self.counts[name]
            t = self.times[name]
            print(f"{name:32s} {t:10.4f} s  ({n} calls, "
                  f"{t / n * 1e3:.2f} ms/call)", file=file)


@contextlib.contextmanager
def xla_trace(logdir):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
