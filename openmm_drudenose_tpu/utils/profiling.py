"""Tracing / profiling helpers.

The reference has no profiling at all (only commented-out clock_gettime
scaffolding, CudaDrudeTGNHKernels.cpp:449-455; SURVEY.md section 5).  Here:

  * `trace(dir)` — context manager around jax.profiler for XLA-level traces
    viewable in TensorBoard/Perfetto
  * `Timer` — wall-clock phase timers with jax.block_until_ready, for
    steps/s style measurements
  * `step_breakdown(ctx, n)` — per-phase timings of a Context's step
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30s} {total * 1e3:9.2f} ms total "
                         f"({total / n * 1e3:8.2f} ms x {n})")
        return "\n".join(lines)


def measure_steps_per_second(context, integrator, steps: int = 64,
                             repeats: int = 3, warmup: int = 8) -> float:
    """Best-of-N steps/s on the current device."""
    integrator.step(warmup)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        integrator.step(steps)
        jax.block_until_ready(context._state.positions)
        best = max(best, steps / (time.perf_counter() - t0))
    return best
