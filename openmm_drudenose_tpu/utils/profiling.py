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


def step_breakdown(ctx, n: int = 16) -> Dict[str, float]:
    """Per-phase timings (ms) of a Context's step on the current device.

    Phases: ``step`` (production n-step scan, per step), ``forces``
    (energy+forces pass), ``forces_only`` (gradient-only pass, when the
    context has one), ``kinematics`` (step with the force pass replaced by
    cached forces), ``rebuild`` (neighbor rebuild, when the strategy has
    one).  All phases are scan-chained so the ~30 ms per-host-dispatch
    floor does not pollute the numbers (CLAUDE.md perf rules).
    """
    import jax.numpy as jnp  # noqa: F401  (kept local: profiling is cheap to import)
    from ..integrators import tgnh

    ctx._ensure_neighbors()
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state

    def _timeit(fn, *args, reps=3, warmup=1):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    out: Dict[str, float] = {}

    prod = ctx._get_step_fn(n)
    out["step"] = _timeit(lambda: prod(spec, st)) / n

    def _scan_pass(fn):
        def scan(positions):
            def body(p, _):
                r = fn(p)
                leaf = r[1] if isinstance(r, tuple) else r
                return p + 0.0 * jnp.sum(leaf) * jnp.ones(()), None
            p, _ = jax.lax.scan(body, positions, None, length=8)
            return p
        return _timeit(jax.jit(scan), st.positions) / 8

    out["forces"] = _scan_pass(
        lambda p: ctx._energy_and_forces(p, st.box, st.neighbors, st.pos_err))
    if ctx._forces_only is not None:
        out["forces_only"] = _scan_pass(
            lambda p: ctx._forces_only(p, st.box, st.neighbors, st.pos_err))

    fake = lambda pos, box, nbl, err=None: (st.potential_energy, st.forces)
    kin = jax.jit(tgnh.make_multi_step(static, fake, n))
    out["kinematics"] = _timeit(lambda: kin(spec, st)) / n

    if ctx._neighbor_fn is not None:
        nbl_fn = jax.jit(ctx._neighbor_fn)
        out["rebuild"] = _timeit(
            lambda: nbl_fn(st.positions, st.box, st.rep_scale))
    return out


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
