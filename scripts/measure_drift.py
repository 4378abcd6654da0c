#!/usr/bin/env python
"""Per-group temperature drift (BASELINE.md fidelity row), RESUMABLE.

500-molecule SWM4-NDP water (2500 atoms) by default, or the BASELINE
100k-atom bench config with --snapshot.  f32 cellpair + pencil PME, TGNH
1 fs / 20 Drude substeps / hard wall, NVT.  Samples the per-bath
temperatures every ps and fits a linear drift with standard errors
(+ AR(1) residual autocorrelation).

Resumability (VERDICT round-4 item 2): with --snapshot the run
checkpoints the full SimState (data/drift_100k_state.npz) and APPENDS
samples to data/drift_100k_samples.csv, so chip time compounds across
sessions toward the ~1 ns needed for 1 K/ns resolution (SE ~ T^-1.5).
Each invocation continues the same trajectory bit-exactly from the
checkpoint.  Bound a session with --max-new-ps and/or --budget-s; the
state is checkpointed every --ckpt-every ps and at exit.

    python scripts/measure_drift.py --snapshot --max-new-ps 150 --budget-s 5400
"""

import argparse
import os
import signal
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import time

from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import numpy as np


def fit_report(temps_arr):
    """OLS drift per bath with standard errors + lag-1 residual
    autocorrelation (partial-safe)."""
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
        rho = (np.corrcoef(resid[:-1], resid[1:])[0, 1]
               if m > 20 else float("nan"))
        print(f"{name:9s}: drift {coef[0]:+8.3f} +- {se:.3f} K/ns  "
              f"mean {temps_arr[:, g].mean():.4f} K  (AR1 rho {rho:+.3f})",
              flush=True)


def read_csv(path):
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.split(",")[1:]])
    return rows


def truncate_csv(path, n_keep):
    """Drop samples beyond the last checkpoint (a killed session can
    leave the CSV ahead of the state file; resuming would mislabel the
    re-simulated picoseconds)."""
    kept, n_data, dropped = [], 0, 0
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                kept.append(line)
            elif n_data < n_keep:
                kept.append(line)
                n_data += 1
            else:
                dropped += 1
    if dropped:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(kept)
        os.replace(tmp, path)
        print(f"truncated {dropped} post-checkpoint samples from "
              f"{path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=float, default=1.0,
                    help="total accumulation target (all sessions)")
    ap.add_argument("--molecules", type=int, default=500)
    ap.add_argument("--equil-ps", type=float, default=50.0)
    ap.add_argument("--snapshot", action="store_true",
                    help="start from the committed equilibrated benchmark "
                         "state (data/bench_equil_100k.npz; implies "
                         "--molecules 20000) — the BASELINE.md 100k-atom "
                         "config (VERDICT round-3 item 5)")
    ap.add_argument("--state", default=None,
                    help="checkpoint path (default with --snapshot: "
                         "data/drift_100k_state.npz)")
    ap.add_argument("--csv", default=None,
                    help="samples CSV, appended across sessions (default "
                         "with --snapshot: data/drift_100k_samples.csv)")
    ap.add_argument("--max-new-ps", type=int, default=None,
                    help="cap on NEW samples this session")
    ap.add_argument("--budget-s", type=float, default=None,
                    help="wall budget; checkpoint + exit before exceeding")
    ap.add_argument("--ckpt-every", type=int, default=10,
                    help="checkpoint interval (ps)")
    ap.add_argument("--fit-only", action="store_true",
                    help="recompute the OLS drift table from the CSV and "
                         "exit — no chip, no state change (reproduce the "
                         "reported numbers from the committed artifact)")
    args = ap.parse_args()

    if args.fit_only:
        csv_path = args.csv or (os.path.join(REPO, "data",
                                             "drift_100k_samples.csv")
                                if args.snapshot else None)
        if not csv_path or not os.path.exists(csv_path):
            raise SystemExit(f"no samples CSV at {csv_path}")
        rows = read_csv(csv_path)
        fit_report(np.array(rows, np.float64))
        return

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.app.serialization import (save_checkpoint,
                                                        load_checkpoint)
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.units import BOLTZ

    t0 = time.time()
    if args.snapshot:
        args.molecules = 20000
        if args.state is None:
            args.state = os.path.join(REPO, "data", "drift_100k_state.npz")
        if args.csv is None:
            args.csv = os.path.join(REPO, "data", "drift_100k_samples.csv")
    csv_path = args.csv or os.environ.get("DRIFT_CSV",
                                          "/tmp/drift_samples.csv")

    system, positions = builders.build_water_box(args.molecules)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    nb_opts = None
    snap = None
    if args.snapshot:
        snap = np.load(os.path.join(REPO, "data", "bench_equil_100k.npz"))
        if "capacity" in snap:
            nb_opts = {"capacity": int(snap["capacity"])}
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair",
                     nb_options=nb_opts)

    ps_marker = (args.state + ".ps") if args.state else None
    if (ps_marker and os.path.exists(ps_marker)
            and os.path.exists(csv_path)):
        with open(ps_marker) as f:
            truncate_csv(csv_path, int(f.read().strip()))
    rows = read_csv(csv_path)
    resuming = (args.state is not None and os.path.exists(args.state)
                and rows)
    if resuming:
        # materialize neighbors so the state tree matches the checkpoint
        if snap is not None:
            ctx.setPositions(np.asarray(snap["positions"], np.float64))
        else:
            ctx.setPositions(positions)
        ctx._ensure_neighbors()
        load_checkpoint(args.state, ctx)
        print(f"resumed from {args.state} at {len(rows)} ps "
              f"({time.time()-t0:.0f}s)", flush=True)
    else:
        if rows:
            raise SystemExit(
                f"{csv_path} has {len(rows)} samples but no checkpoint "
                f"{args.state} — refusing to append a fresh trajectory to "
                f"an unresumable series; archive the CSV first")
        if snap is not None:
            ctx.setPositions(np.asarray(snap["positions"], np.float64))
            ctx.setVelocities(np.asarray(snap["velocities"], np.float64))
        else:
            ctx.setPositions(positions)
            ctx.minimizeEnergy(maxIterations=300)
            ctx.setVelocitiesToTemperature(300.0, seed=7)
        n_equil = int(args.equil_ps * 1000)
        if n_equil:
            integ.step(n_equil)
            print(f"equilibrated {args.equil_ps} ps "
                  f"({time.time()-t0:.0f}s)", flush=True)
        with open(csv_path, "w") as f:
            f.write("# ps, T_internal, T_COM, T_Drude\n")

    spec = ctx._spec
    nkbt = np.asarray(spec.nh_nkbt, np.float64)
    dof = nkbt / BOLTZ / np.array([300.0, 300.0, 1.0])

    def checkpoint(n_ps):
        if args.state is None:
            return
        tmp = args.state + ".tmp"
        save_checkpoint(tmp, ctx)
        os.replace(tmp, args.state)
        with open(ps_marker + ".tmp", "w") as f:
            f.write(str(n_ps))
        os.replace(ps_marker + ".tmp", ps_marker)

    # SIGTERM (session teardown, kill $(cat pid)) must run the finally
    # block so the checkpoint and the CSV stay consistent
    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)

    n_ps_target = int(args.ns * 1000)
    k0 = len(rows)
    temps = list(rows)
    t_run = time.time()
    new = 0
    csv = open(csv_path, "a")
    at_boundary = True
    try:
        for k in range(k0, n_ps_target):
            at_boundary = False
            integ.step(1000)  # 1 ps
            at_boundary = True
            two_ke = np.asarray(ctx._state.group_ke, np.float64)
            temps.append(list(two_ke / (dof * BOLTZ)))
            csv.write(f"{k + 1}, " + ", ".join(
                f"{v:.6f}" for v in temps[-1]) + "\n")
            csv.flush()
            new += 1
            if new % args.ckpt_every == 0:
                checkpoint(k + 1)
            if new % 25 == 0:
                el = time.time() - t_run
                rate = new / el * 86.4  # ns/day
                print(f"{k+1} ps  T = "
                      f"{np.mean(temps[-25:], axis=0).round(3)}"
                      f"  ({el:.0f}s, {rate:.2f} ns/day)", flush=True)
                fit_report(np.array(temps))
            if args.max_new_ps is not None and new >= args.max_new_ps:
                print(f"session cap {args.max_new_ps} ps reached", flush=True)
                break
            if (args.budget_s is not None
                    and time.time() - t_run > args.budget_s):
                print("wall budget reached", flush=True)
                break
    finally:
        csv.close()
        if at_boundary:
            checkpoint(len(temps))
            print(f"checkpointed at {len(temps)} ps total "
                  f"({new} new this session)", flush=True)
        else:
            print(f"interrupted mid-step; keeping the last periodic "
                  f"checkpoint ({new} new samples this session)",
                  flush=True)

    fit_report(np.array(temps))


if __name__ == "__main__":
    main()
