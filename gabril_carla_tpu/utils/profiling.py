"""Profiling hooks: per-stage wall timers + JAX device profiler capture.

The reference has no profiler integration (SURVEY §5.1: tqdm + a sim/wall
ratio printout). Here tracing is first-class: `StageTimer` aggregates named
stage timings (data/step/host-sync), `profile_trace` wraps
jax.profiler.trace for TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(1000 * v / max(1, self.counts[k]), 3)}
            for k, v in sorted(self.totals.items())
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {s['mean_ms']:.1f}ms x{s['count']}" for k, s in self.summary().items()
        )


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sim_wall_ratio(sim_seconds: float, wall_seconds: float) -> float:
    """The reference's agent-side speed metric (autonomous_agent.py:143-151)."""
    return 0.0 if wall_seconds <= 0 else sim_seconds / wall_seconds
