"""Lightweight observability: counters + timers.

The reference has only log-macro call sites (SURVEY.md §5: 112 sites, no
metrics registry). We provide a real registry: process-wide counters and
histogram-ish timers, cheap enough for the query path, dumpable as a dict
for tests/dashboards; plus a context helper for scoped timing. JAX profiler
traces can be layered on via jax.profiler when deeper device-side
attribution is needed.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self.counters: dict[str, int] = defaultdict(int)
        self.timer_totals: dict[str, float] = defaultdict(float)
        self.timer_counts: dict[str, int] = defaultdict(int)
        self.timer_max: dict[str, float] = defaultdict(float)

    def incr(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counters[name] += n

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            self.timer_totals[name] += seconds
            self.timer_counts[name] += 1
            if seconds > self.timer_max[name]:
                self.timer_max[name] = seconds

    @contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "timers": {
                    k: {
                        "total_s": self.timer_totals[k],
                        "count": self.timer_counts[k],
                        "mean_ms": 1000.0 * self.timer_totals[k] / max(1, self.timer_counts[k]),
                        "max_ms": 1000.0 * self.timer_max[k],
                    }
                    for k in self.timer_totals
                },
            }

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timer_totals.clear()
            self.timer_counts.clear()
            self.timer_max.clear()


METRICS = Metrics()  # process-wide default registry


@contextmanager
def trace(name: str, registry: Metrics | None = None):
    """Scoped timing that ALSO annotates the JAX/xprof device trace, so a
    profiler capture shows engine phases (e.g. 'search.batch') aligned with
    the device timeline (SURVEY §5 rebuild note: 'JAX profiler/xprof hooks
    + structured per-query timing')."""
    import jax

    reg = registry or METRICS
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        try:
            yield
        finally:
            reg.observe(name, time.perf_counter() - t0)


def start_profiler(log_dir: str) -> None:
    """Begin an xprof capture (view in TensorBoard / xprof). Wraps
    jax.profiler.start_trace so callers never import jax for ops."""
    import jax

    jax.profiler.start_trace(log_dir)


def stop_profiler() -> None:
    import jax

    jax.profiler.stop_trace()
