"""Profiling / tracing hooks (SURVEY §5: the reference has none built in;
this framework makes prefill/decode/compile/score phases observable).

``trace(...)`` wraps ``jax.profiler`` so a TensorBoard-compatible device
trace lands on disk; ``Timer`` aggregates host-side phase timings (the
generator's ``stats`` dict uses the same convention).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device profile: ``with trace('/tmp/profile'): ...``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Accumulating phase timer: ``with timer('prefill'): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}
