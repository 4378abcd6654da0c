#!/usr/bin/env python
"""On-chip validation + timing of the TRICLINIC cell-pair sweep.

Two parts (one process, batched per CLAUDE.md TPU-tunnel discipline):
  1. parity: TPU f32 triclinic-cellpair forces vs CPU f64 ground truth on
     identical positions (subprocess computes the f64 reference) — guards
    the bf16-matmul class of silent corruption on the new code path.
  2. timing: ms/step of a 100k-atom sheared SWM4 water box (round 4:
     the Pallas kernel rides the same code path as orthorhombic boxes —
     geometry enters only through _centers_and_hvec — so this times the
     kernel when supports() engages it; pass nb_options use_pallas=0 to
     time the XLA fallback).

Usage: python scripts/check_triclinic_tpu.py [--atoms 100000] [--parity-atoms 10240]
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from openmm_drudenose_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

SHEAR = (0.2, 0.1, 0.15)  # bx, cx, cy as fractions of L


def build(n_mol, cutoff=1.0):
    import numpy as np
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(
        n_mol, method=dn.NonbondedForce.PME, cutoff=cutoff)
    L = float(system.getDefaultPeriodicBoxVectors()[0][0])
    tri = np.array([[L, 0, 0], [SHEAR[0] * L, L, 0],
                    [SHEAR[1] * L, SHEAR[2] * L, L]])
    system.setDefaultPeriodicBoxVectors(*tri)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    return system, positions, integ


CHILD = r"""
import sys, json
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
sys.path.insert(0, %(root)r)
from scripts.check_triclinic_tpu import build
import openmm_drudenose_tpu as dn
system, positions, integ = build(%(n_mol)d)
ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
ctx.setPositions(positions)
st = ctx.getState(forces=True, energy=True)
np.savez(%(out)r, forces=np.asarray(st.getForces()),
         pe=st.getPotentialEnergy())
print("cpu f64 reference done")
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atoms", type=int, default=100_000)
    p.add_argument("--parity-atoms", type=int, default=10_240)
    p.add_argument("--steps", type=int, default=64)
    args = p.parse_args()
    import numpy as np

    t0 = time.time()

    def log(m):
        print(f"[tri {time.time()-t0:6.1f}s] {m}", file=sys.stderr,
              flush=True)

    # -- part 1: parity ---------------------------------------------------
    n_mol_p = args.parity_atoms // 5
    ref_npz = "/tmp/tri_ref.npz"
    log(f"computing CPU f64 reference ({n_mol_p} molecules) in subprocess")
    code = CHILD % {"root": os.path.dirname(HERE), "n_mol": n_mol_p,
                    "out": ref_npz}
    subprocess.run([sys.executable, "-c", code], check=True)
    ref = np.load(ref_npz)

    import jax
    import openmm_drudenose_tpu as dn
    log(f"devices: {jax.devices()}")

    system, positions, integ = build(n_mol_p)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    assert ctx._cp_cfg is not None and ctx._cp_cfg.triclinic
    nbf = next(t[0] for t in ctx._terms if hasattr(t[0], "cellpair_cfg"))
    log(f"parity ctx: uses_pallas={getattr(nbf, 'uses_pallas', None)} "
        f"chunk={getattr(nbf, 'pallas_chunk', None)}")
    ctx.setPositions(positions)
    st = ctx.getState(forces=True, energy=True)
    f32 = np.asarray(st.getForces())
    f64 = ref["forces"]
    scale = np.abs(f64).max()
    rel = np.abs(f32 - f64) / scale
    pe_rel = abs(st.getPotentialEnergy() - float(ref["pe"])) / abs(
        float(ref["pe"]))
    log(f"parity: max rel {rel.max():.3e}  rms {np.sqrt((rel**2).mean()):.3e}"
        f"  PE rel {pe_rel:.3e}")
    ok = rel.max() < 5e-3 and np.sqrt((rel**2).mean()) < 1e-4

    # -- part 2: timing at scale -----------------------------------------
    n_mol = args.atoms // 5
    log(f"building {args.atoms}-atom sheared box")
    system2, positions2, integ2 = build(n_mol)
    ctx2 = dn.Context(system2, integ2, precision="single",
                      strategy="cellpair")
    assert ctx2._cp_cfg.triclinic
    nbf2 = next(t[0] for t in ctx2._terms if hasattr(t[0], "cellpair_cfg"))
    log(f"timing ctx: uses_pallas={getattr(nbf2, 'uses_pallas', None)} "
        f"chunk={getattr(nbf2, 'pallas_chunk', None)}")
    ctx2.setPositions(positions2)
    ctx2.setVelocitiesToTemperature(300.0, seed=0)
    interval = ctx2._rebuild_interval
    warm = 8 * interval
    log(f"warmup {warm} steps (compiles)")
    integ2.step(warm)
    jax.block_until_ready(ctx2._state.positions)
    best = None
    for i in range(3):
        k = args.steps // interval * interval
        ts = time.time()
        integ2.step(k)
        jax.block_until_ready(ctx2._state.positions)
        dt = (time.time() - ts) / k * 1e3
        log(f"repeat {i+1}: {dt:.2f} ms/step")
        best = dt if best is None else min(best, dt)
    finite = bool(np.all(np.isfinite(np.asarray(ctx2._state.positions))))
    print(json.dumps({"parity_ok": bool(ok),
                      "parity_max_rel": float(rel.max()),
                      "parity_rms_rel": float(np.sqrt((rel**2).mean())),
                      "pe_rel": float(pe_rel),
                      "atoms": args.atoms, "ms_per_step": round(best, 2),
                      "finite": finite}))


if __name__ == "__main__":
    main()
