#!/usr/bin/env python
"""Per-group temperature drift over ~1 ns (BASELINE.md fidelity row).

500-molecule SWM4-NDP water (2500 atoms), f32 cellpair + pencil PME, TGNH
1 fs / 20 Drude substeps / hard wall, NVT.  Equilibrates, then samples the
per-bath temperatures every ps for `--ns` nanoseconds and fits a linear
drift with standard errors.  Run on the real TPU:

    python scripts/measure_drift.py --ns 1.0 | tee drift_run.log
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
    ap.add_argument("--ns", type=float, default=1.0)
    ap.add_argument("--molecules", type=int, default=500)
    ap.add_argument("--equil-ps", type=float, default=50.0)
    ap.add_argument("--snapshot", action="store_true",
                    help="start from the committed equilibrated benchmark "
                         "state (data/bench_equil_100k.npz; implies "
                         "--molecules 20000) — the BASELINE.md 100k-atom "
                         "config (VERDICT round-3 item 5)")
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.units import BOLTZ

    if args.snapshot:
        args.molecules = 20000
    system, positions = builders.build_water_box(args.molecules)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    nb_opts = None
    snap = None
    if args.snapshot:
        snap_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "bench_equil_100k.npz")
        snap = np.load(snap_path)
        if "capacity" in snap:
            nb_opts = {"capacity": int(snap["capacity"])}
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair",
                     nb_options=nb_opts)
    if snap is not None:
        ctx.setPositions(np.asarray(snap["positions"], np.float64))
        ctx.setVelocities(np.asarray(snap["velocities"], np.float64))
    else:
        ctx.setPositions(positions)
        ctx.minimizeEnergy(maxIterations=300)
        ctx.setVelocitiesToTemperature(300.0, seed=7)

    n_equil = int(args.equil_ps * 1000)
    integ.step(n_equil)
    print(f"equilibrated {args.equil_ps} ps", flush=True)

    spec = ctx._spec
    nkbt = np.asarray(spec.nh_nkbt, np.float64)
    dof = nkbt / BOLTZ / np.array([300.0, 300.0, 1.0])

    def report(temps_arr):
        """OLS drift per bath with standard errors (partial-safe)."""
        m = len(temps_arr)
        t = np.arange(m) / 1000.0  # ns
        print(f"\n[{m} ps] per-bath means:",
              temps_arr.mean(axis=0).round(4), " targets [300, 300, 1]",
              flush=True)
        if m < 10:
            return
        for g, name in enumerate(["internal", "COM", "Drude"]):
            A = np.vstack([t, np.ones_like(t)]).T
            coef, res, *_ = np.linalg.lstsq(A, temps_arr[:, g], rcond=None)
            resid = temps_arr[:, g] - A @ coef
            se = np.sqrt(np.sum(resid**2) / (m - 2)
                         / np.sum((t - t.mean())**2))
            print(f"{name:9s}: drift {coef[0]:+8.3f} +- {se:.3f} K/ns  "
                  f"mean {temps_arr[:, g].mean():.4f} K", flush=True)

    # stream samples so a partial run still yields a full analysis
    csv_path = os.environ.get("DRIFT_CSV", "/tmp/drift_samples.csv")
    n_ps = int(args.ns * 1000)
    t0 = time.time()
    temps = []
    with open(csv_path, "w") as csv:
        csv.write("# ps, T_internal, T_COM, T_Drude\n")
        for k in range(n_ps):
            integ.step(1000)  # 1 ps
            two_ke = np.asarray(ctx._state.group_ke, np.float64)
            temps.append(two_ke / (dof * BOLTZ))
            csv.write(f"{k + 1}, " + ", ".join(
                f"{v:.6f}" for v in temps[-1]) + "\n")
            csv.flush()
            if (k + 1) % 25 == 0:
                el = time.time() - t0
                rate = (k + 1) / el * 86.4  # ns/day
                print(f"{k+1} ps  T = "
                      f"{np.mean(temps[-25:], axis=0).round(3)}"
                      f"  ({el:.0f}s, {rate:.2f} ns/day)", flush=True)
                report(np.array(temps))

    report(np.array(temps))


if __name__ == "__main__":
    main()
