"""Tracing / profiling utilities (SURVEY.md §5: the reference only has
perf_counter spans and per-phase timing dicts; here those are structured
and optionally backed by jax.profiler traces)."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

__all__ = ["Phases", "trace"]


class Phases:
    """Accumulates named wall-clock spans (the reference's per-block
    server/client timing dicts, scripts/bootstrap_generation.py:761-897)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in sorted(self.totals.items())}

    def __str__(self):
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fhe_spear_trace"):
    """jax.profiler trace around a region (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
