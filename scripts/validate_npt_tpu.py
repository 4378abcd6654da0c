#!/usr/bin/env python
"""NPT observables on the REAL TPU (f32 cellpair + PME + MC barostat):
500-molecule SWM4-NDP water at 300 K / 1 atm, compare density and potential
energy per molecule against the published values (Lamoureux et al. 2006:
rho = 0.994 g/mL, U = -41.5 kJ/mol at 298 K).

This is the on-chip revalidation of the numbers recorded in ROADMAP.md
(they were first measured before the bf16 matmul-precision fix; the CPU-f64
CI density test could not see on-chip dtype corruption).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_npt_tpu.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=500)
    ap.add_argument("--equil-ps", type=float, default=100.0)
    ap.add_argument("--sample-ps", type=float, default=200.0)
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders

    n_mol = args.molecules
    system, positions = builders.build_water_box(n_mol)
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 25))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.minimizeEnergy(maxIterations=300)
    ctx.setVelocitiesToTemperature(300.0, seed=11)

    integ.step(int(args.equil_ps * 1000))
    print(f"equilibrated {args.equil_ps} ps")

    mass_g = n_mol * 18.0154 / 6.02214076e23
    dens, pe, drude_t = [], [], []
    from openmm_drudenose_tpu.units import BOLTZ
    spec = ctx._spec
    nkbt = np.asarray(spec.nh_nkbt, np.float64)
    dof = nkbt / BOLTZ / np.array([300.0, 300.0, 1.0])
    t0 = time.time()
    n_chunks = int(args.sample_ps)
    for k in range(n_chunks):
        integ.step(1000)  # 1 ps
        box = np.asarray(ctx._state.box)
        vol_ml = float(np.prod(np.diagonal(box))) * 1e-21
        dens.append(mass_g / vol_ml)
        pe.append(float(ctx.getState(energy=True).getPotentialEnergy()))
        two_ke = np.asarray(ctx._state.group_ke, np.float64)
        drude_t.append((two_ke / (dof * BOLTZ))[2])
        if (k + 1) % 25 == 0:
            el = time.time() - t0
            print(f"{k+1} ps  rho = {np.mean(dens[-25:]):.4f} g/mL  "
                  f"U = {np.mean(pe[-25:]) / n_mol:.2f} kJ/mol  "
                  f"T_D = {np.mean(drude_t[-25:]):.3f} K  ({el:.0f}s)")

    rho = np.mean(dens)
    rho_err = np.std(dens) / np.sqrt(len(dens))
    u = np.mean(pe) / n_mol
    u_err = np.std(pe) / np.sqrt(len(pe)) / n_mol
    td = np.mean(drude_t)
    print(f"\nFINAL ({args.sample_ps} ps sampling, {n_mol} molecules, f32 "
          f"TPU):")
    print(f"  rho = {rho:.4f} +- {rho_err:.4f} g/mL   (lit. 0.994)")
    print(f"  U   = {u:.2f} +- {u_err:.2f} kJ/mol     (lit. -41.5)")
    print(f"  Drude bath = {td:.3f} K                 (target 1)")


if __name__ == "__main__":
    main()
