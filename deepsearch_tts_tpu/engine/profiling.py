"""Engine-side profiling & observability.

The reference's observability is counters + print (SURVEY.md §5: "No timing,
no spans"). TPU serving needs real traces: this module wraps jax.profiler
for on-demand device traces and provides a lightweight span timer the
engine/scheduler use for step breakdowns (prefill vs decode vs host work),
exported through ``Engine.telemetry()`` and the statistics JSON.
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class SpanTimer:
    """Accumulating named wall-time spans (thread-safe)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def add(self, name: str, dt: float) -> None:
        """Record an externally-timed span (no context-manager overhead)."""
        with self._lock:
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self) -> None:
        with self._lock:
            self.totals.clear()
            self.counts.clear()

    def summary(self) -> dict:
        with self._lock:
            return {
                name: {
                    "total_s": round(self.totals[name], 4),
                    "count": self.counts[name],
                    "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
                }
                for name in sorted(self.totals)
            }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side scheduler phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
