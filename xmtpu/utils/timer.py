"""Lightweight phase timers (the reference's std::chrono spans,
trustregion.h:451,712-714; SURVEY.md section 5.1) plus jax.profiler hooks."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock spans per named phase."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{k}: {v * 1e3:.2f} ms ({self.counts[k]}x)"
                 for k, v in sorted(self.totals.items())]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — the TPU replacement for nvprof/-lineinfo."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
