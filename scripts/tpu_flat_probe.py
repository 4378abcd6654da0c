#!/usr/bin/env python
"""Batched 64x4k flat-ensemble probe (VERDICT round-4 item 3).

One process, incremental output (the TPU tunnel flaps; batch everything
and flush as results land — CLAUDE.md measurement rules):

  1. auto-layout ensemble: best-of-N step timing + per-phase breakdown
  2. layout A/B at explicit (rx, rz) candidates (the 7x10 auto pick
     predates the round-4 kernel changes)

Usage: python scripts/tpu_flat_probe.py [--layouts] [--skip-breakdown]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache

compile_cache.enable("/tmp/jaxcache")

import numpy as np


def bench_ens(ens, steps=64, reps=4):
    import jax
    ens.step(steps)
    jax.block_until_ready(ens.context._state.positions)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        ens.step(steps)
        jax.block_until_ready(ens.context._state.positions)
        best = min(best, (time.time() - t0) / steps * 1e3)
    return best


def main():
    import jax

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble
    from openmm_drudenose_tpu.utils.profiling import step_breakdown

    R, n_mol = 64, 800
    t0 = time.time()
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(500)
    print(f"template ready ({time.time()-t0:.0f}s)", flush=True)

    ens = FlatReplicaEnsemble(ctx, n_replicas=R, seed=7)
    fc = ens.context
    cfg = fc._cp_cfg
    print(f"auto layout: r_int={ens.n_replicas_padded} grid={cfg.grid} "
          f"cap={cfg.capacity} interval={fc._rebuild_interval}", flush=True)
    ens.setVelocitiesToTemperature(300.0, seed=3)

    ms = bench_ens(ens)
    print(f"AUTO: {ms:7.2f} ms/step  "
          f"({R * 4000 * 86.4 / ms / 1e6:.1f} ns/day agg)", flush=True)

    if "--skip-breakdown" not in sys.argv:
        bd = step_breakdown(fc, 16)
        print("breakdown:", {k: round(v, 2) for k, v in bd.items()},
              flush=True)

    if "--layouts" in sys.argv:
        for rx, rz in ((8, 8), (7, 10), (5, 13), (4, 16), (9, 8), (6, 11)):
            if rx * rz < R:
                continue
            e2 = FlatReplicaEnsemble(ctx, n_replicas=R, rx=rx, rz=rz, seed=7)
            c2 = e2.context._cp_cfg
            e2.setVelocitiesToTemperature(300.0, seed=3)
            ms = bench_ens(e2)
            ke = np.asarray(e2.kinetic_energies())
            assert np.all(np.isfinite(ke))
            print(f"rx={rx:2d} rz={rz:2d} r_int={rx*rz:3d} grid={c2.grid} "
                  f"cap={c2.capacity}: {ms:7.2f} ms/step", flush=True)
    print(f"done ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # tunnel flap: retry once the link recovers
            print(f"attempt {attempt} failed: {type(e).__name__}: {e}",
                  flush=True)
            if attempt == 2:
                raise
            time.sleep(60)
