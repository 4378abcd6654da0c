#!/usr/bin/env python
"""A/B the PME contraction MXU precision (pme.MM_PRECISION) on the current
device at the 100k-atom bench config.

Question: jax maps Precision.HIGHEST to full-f32 MXU emulation and
Precision.HIGH to the 3-pass bf16x3 scheme.  bf16x3's dropped lo*lo term
bounds its relative error near 2^-16 ~ 1.5e-5 on the spread/interpolation
contractions — possibly inside the engine's f32 noise floor (rms 3.4e-6
TOTAL-force error vs CPU f64, most of it from the direct-space sweep).  If
HIGH is measurably faster at unchanged accuracy, the PME tail (~8 ms of
the 34 ms step) shrinks for free; if not, HIGHEST stays (CLAUDE.md rule).

Measures, per precision in {HIGHEST, HIGH, DEFAULT}:
  * full-step ms (64-step scans, best of 3) on a short-equilibrated box
  * total-force rms/max relative diff vs the HIGHEST forces on the SAME
    positions (only the PME reciprocal part can differ)

Usage: python scripts/probe_mm_precision.py [--atoms 100000]
"""

import argparse
import json
import os
import sys
import time

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_atoms, precision_name):
    import jax
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.forces import pme
    from openmm_drudenose_tpu.io import builders

    pme.MM_PRECISION = getattr(jax.lax.Precision, precision_name)
    system, positions = builders.build_water_box(n_atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    return ctx, integ


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atoms", type=int, default=100_000)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--equil", type=int, default=256)
    args = p.parse_args()

    import jax
    print("devices:", jax.devices())

    # equilibrate once under HIGHEST, snapshot
    t0 = time.time()
    ctx0, integ0 = build(args.atoms, "HIGHEST")
    from openmm_drudenose_tpu.io import builders
    _, positions = builders.build_water_box(args.atoms // 5)
    ctx0.setPositions(positions)
    ctx0.setVelocitiesToTemperature(300.0, seed=0)
    integ0.step(args.equil)
    st = ctx0.getState(positions=True, velocities=True)
    pos = np.asarray(st.getPositions())
    vel = np.asarray(st.getVelocities())
    print(f"equilibrated {args.equil} steps in {time.time()-t0:.1f}s")

    results = {}
    f_ref = None
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        ctx, integ = build(args.atoms, prec)
        ctx.setPositions(pos)
        ctx.setVelocities(vel)
        # forces on the snapshot positions (before any stepping)
        f = np.asarray(ctx.getState(forces=True).getForces(), np.float64)
        if f_ref is None:
            f_ref = f
            rms = mx = 0.0
        else:
            scale = np.sqrt(np.mean(f_ref ** 2))
            d = np.sqrt(np.mean((f - f_ref) ** 2)) / scale
            mx = float(np.max(np.abs(f - f_ref)) / scale)
            rms = float(d)
        # step timing
        integ.step(args.steps)
        jax.block_until_ready(ctx._state.positions)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            integ.step(args.steps)
            jax.block_until_ready(ctx._state.positions)
            best = min(best, (time.time() - t0) / args.steps * 1e3)
        results[prec] = {"ms_per_step": round(best, 3),
                         "force_rms_rel_vs_HIGHEST": rms,
                         "force_max_rel_vs_HIGHEST": mx}
        print(prec, json.dumps(results[prec]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
