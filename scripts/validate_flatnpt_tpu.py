#!/usr/bin/env python
"""On-chip validation of flat-ensemble NPT (SimState.rep_scale): an
8-replica x 500-molecule SWM4-NDP water ensemble under per-replica MC
volume moves must relax every replica's box to liquid density
(lit. 0.994 g/mL at 298 K; the single-context on-chip run measured
0.9955 +- 0.0007 — scripts/validate_npt_tpu.py).

    python scripts/validate_flatnpt_tpu.py [--replicas 8] [--mol 216]
                                           [--equil-ps 20] [--sample-ps 40]
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
from openmm_drudenose_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable("/tmp/jaxcache")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--mol", type=int, default=500)
    ap.add_argument("--equil-ps", type=float, default=20.0)
    ap.add_argument("--sample-ps", type=float, default=40.0)
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    t0 = time.time()
    system, positions = builders.build_water_box(
        args.mol, method=dn.NonbondedForce.PME, cutoff=0.7)
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 25))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single",
                     strategy="cellpair")
    ctx.setPositions(positions)
    ens = FlatReplicaEnsemble(ctx, args.replicas)
    ens.setVelocitiesToTemperature(300.0, seed=0)
    print(f"[{time.time()-t0:5.0f}s] ensemble built "
          f"({ens.n_replicas_padded} internal replicas, "
          f"{ens.context._static.n_atoms} atoms)", file=sys.stderr)

    dt_ps = 0.001
    n_eq = int(args.equil_ps / dt_ps)
    ens.step(n_eq)
    print(f"[{time.time()-t0:5.0f}s] equilibrated {args.equil_ps} ps; "
          f"rho now {np.round(ens.densities(), 4)}", file=sys.stderr)

    n_chunks = 20
    per = int(args.sample_ps / dt_ps / n_chunks)
    dens = []
    for c in range(n_chunks):
        ens.step(per)
        dens.append(ens.densities())
    dens = np.array(dens)
    rho_rep = dens.mean(axis=0)
    sem = dens.mean(axis=1).std() / np.sqrt(n_chunks)
    st = ens.context._state
    acc = np.asarray(st.baro_naccept) + 0.0
    att = np.asarray(st.baro_nattempt) + acc  # post-reset counters, rough
    print(f"[{time.time()-t0:5.0f}s] per-replica rho: "
          f"{np.round(rho_rep, 4)}", file=sys.stderr)
    print(f"ensemble rho = {dens.mean():.4f} +- {sem:.4f} g/mL "
          f"(lit. 0.994); scales {np.round(np.asarray(st.rep_scale), 4)}")
    assert np.all((0.92 < rho_rep) & (rho_rep < 1.06)), rho_rep


if __name__ == "__main__":
    main()
