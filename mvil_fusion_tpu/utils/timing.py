"""Timing / tracing instrumentation.

Replaces the reference's ad-hoc TicToc wall-clock timers scattered through
every node (reference: vils_estimator/src/utility/tic_toc.h and the copies
in each package; printStatistics in visualization.cpp — SURVEY.md §5) with
one structured registry, and adds first-class XLA profiling via
jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total_s / max(self.count, 1)


class Profiler:
    """Hierarchical wall-clock stage timing with a summary table."""

    def __init__(self):
        self.stats: dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # ensure queued device work is included
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.count += 1
            s.total_s += dt
            s.max_s = max(s.max_s, dt)

    def summary(self) -> str:
        rows = [f"{'stage':<28}{'count':>8}{'mean ms':>10}{'max ms':>10}"]
        for name in sorted(self.stats):
            s = self.stats[name]
            rows.append(f"{name:<28}{s.count:>8}{s.mean_ms:>10.2f}"
                        f"{1000 * s.max_s:>10.2f}")
        return "\n".join(rows)

    def reset(self):
        self.stats.clear()


PROFILER = Profiler()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
