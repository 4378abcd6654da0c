#!/usr/bin/env python
"""Headline benchmark: ns/day on a 100k-atom Drude-polarizable water system
(SWM4-NDP, PME, TGNH thermostat, hard wall, 1 fs steps) on the default JAX
device — the BASELINE.md configuration.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ns/day", "vs_baseline": N}

vs_baseline compares against a measured C++ serial double-precision cost
model of the OpenMM Reference platform's hot path (direct-space pass +
per-step neighbor rebuild, native/reference_cost.cpp; --measure-baseline-cpp
caches it in bench_baseline.json).  The model omits the PME reciprocal sum,
bonded terms, and integrator kinematics the real Reference platform also
pays, so the reported ratio is an underestimate.  (The earlier JAX-on-CPU
f64 stand-in measured ~14x slower than this C++ loop and was retired — it
inflated the ratio.)  BASELINE.md's target is >= 10x on one v5e chip.
"""

import argparse
import json
import os
import sys
import time

# persistent compilation cache: repeat bench runs skip the (minutes-long)
# remote TPU compile.  Must be set before jax initializes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def build_context(n_atoms: int, precision: str, platform: str | None,
                  nb_kwargs: dict | None = None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if precision == "double":
        jax.config.update("jax_enable_x64", True)
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders

    n_mol = n_atoms // 5
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision=precision, strategy="cellpair")
    if nb_kwargs:
        ctx._nb_kwargs.update(nb_kwargs)
        ctx._build_potential()
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    return ctx, integ


def equilibrate(ctx, integ, n_atoms, precision, steps: int):
    """Run `steps` equilibration steps, then rebuild a FRESH context from
    the equilibrated snapshot.  The lattice initial condition is not the
    state the benchmark claims to measure (a liquid): its lumpy cell
    occupancy can overflow the planned cell capacity and force a grow,
    permanently inflating the sweep's padded work.  A fresh context
    re-plans the cell structure for the relaxed liquid."""
    import numpy as np
    integ.step(steps)
    st = ctx.getState(positions=True, velocities=True)
    pos = np.asarray(st.getPositions())
    vel = np.asarray(st.getVelocities())
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    system, _ = builders.build_water_box(n_atoms // 5)
    integ2 = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ2.setMaxDrudeDistance(0.02)
    ctx2 = dn.Context(system, integ2, precision=precision,
                      strategy="cellpair")
    ctx2.setPositions(pos)
    ctx2.setVelocities(vel)
    return ctx2, integ2


def measure_ns_day(ctx, integ, steps: int, repeats: int) -> float:
    import jax
    # warm up with the same step count so every scan length is compiled
    # before timing starts
    integ.step(steps)
    jax.block_until_ready(ctx._state.positions)
    best = 0.0
    for _ in range(repeats):
        t0 = time.time()
        integ.step(steps)
        jax.block_until_ready(ctx._state.positions)
        dt = time.time() - t0
        best = max(best, steps / dt)
    import numpy as np
    # fresh energy (the force-only step leaves state.potential_energy
    # stale; a NaN explosion must not hide behind the cached value)
    pe = ctx.getState(energy=True).getPotentialEnergy()
    if not np.isfinite(pe):
        raise RuntimeError(f"non-finite PE after benchmark: {pe}")
    if ctx.neighborListOverflowed:
        raise RuntimeError("neighbor list overflowed during benchmark")
    if ctx.hardwallRunaway:
        raise RuntimeError("Drude hard-wall runaway during benchmark "
                           "(a shell moved >2x past the wall)")
    return best * integ.getStepSize() * 1e-3 * 86400.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atoms", type=int, default=100_000)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--measure-baseline", action="store_true",
                   help="measure the CPU f64 stand-in baseline and cache it")
    p.add_argument("--measure-baseline-cpp", action="store_true",
                   help="measure the C++ serial Reference-platform cost "
                        "model (native/reference_cost.cpp) and cache it")
    p.add_argument("--baseline-steps", type=int, default=4)
    p.add_argument("--capacity", type=int, default=None,
                   help="force the cell capacity (debug/tuning)")
    p.add_argument("--equil-steps", type=int, default=1000,
                   help="equilibration steps before timing (then the "
                        "context is rebuilt so the cell structure is "
                        "planned from the relaxed liquid; 0 = lattice "
                        "start)")
    args = p.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, "bench_baseline.json")

    if args.measure_baseline_cpp:
        import subprocess
        src = os.path.join(here, "native", "reference_cost.cpp")
        exe = os.path.join("/tmp", "reference_cost")
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src,
                        "-lm"], check=True)
        out = subprocess.run([exe, str(args.atoms), "3"],
                             capture_output=True, text=True, check=True)
        ms = json.loads(out.stdout)["ms_per_step"]
        ns_day = 1e-6 * 86400.0 / (ms * 1e-3)
        with open(cache, "w") as f:
            json.dump({"atoms": args.atoms, "ns_day": ns_day,
                       "what": "C++ serial double-precision Reference-"
                               "platform cost model (direct space + "
                               "per-step neighbor rebuild only — real "
                               "Reference adds PME reciprocal etc., so "
                               "the engine/baseline ratio is an "
                               "underestimate; native/reference_cost.cpp)"},
                      f)
        print(json.dumps({"baseline_ns_day": ns_day}))
        return

    if args.measure_baseline:
        ctx, integ = build_context(args.atoms, "double", "cpu",
                                   {"capacity": args.capacity}
                                   if args.capacity else None)
        ns_day = measure_ns_day(ctx, integ, args.baseline_steps, 1)
        with open(cache, "w") as f:
            json.dump({"atoms": args.atoms, "ns_day": ns_day,
                       "what": "this engine, CPU double precision "
                               "(Reference-platform stand-in)"}, f)
        print(json.dumps({"baseline_ns_day": ns_day}))
        return

    ctx, integ = build_context(args.atoms, "single", None,
                               {"capacity": args.capacity}
                               if args.capacity else None)
    if args.equil_steps:
        ctx, integ = equilibrate(ctx, integ, args.atoms, "single",
                                 args.equil_steps)
    ns_day = measure_ns_day(ctx, integ, args.steps, args.repeats)

    baseline = None
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("atoms") == args.atoms:
            baseline = data["ns_day"]
    vs = (ns_day / baseline) if baseline else None

    print(json.dumps({
        "metric": f"ns/day, {args.atoms}-atom SWM4-NDP Drude water, PME, "
                  "TGNH, 1 fs",
        "value": round(ns_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
