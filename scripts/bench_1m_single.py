#!/usr/bin/env python
"""1M-atom SWM4-NDP water on ONE chip (no mesh): demonstrates the
single-device engine at the BASELINE scale-out atom count and reports
ms/step.  (The sharded/resident paths cover multi-chip; this pins the
single-chip memory + throughput point: state ~100 MB, sweep fields
~100 MB — far under a v5e's 16 GB.)"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import numpy as np


def main():
    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import jax
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders

    t0 = time.time()
    system, positions = builders.build_water_box(n_mol)
    print(f"built {n_mol * 5} atoms in {time.time() - t0:.0f}s")
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)

    t0 = time.time()
    integ.step(64)                       # compile + settle
    print(f"first 64 steps (incl. compile) {time.time() - t0:.0f}s")
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        integ.step(64)
        jax.block_until_ready(ctx._state.positions)
        best = max(best, 64 / (time.time() - t0))
    pe = ctx.getState(energy=True).getPotentialEnergy()
    assert np.isfinite(pe), pe
    ms = 1e3 / best
    print(f"{n_mol * 5} atoms, 1 device: {ms:.1f} ms/step "
          f"({best * 86400.0 * 1e-6:.3f} ns/day), PE {pe:.3e} kJ/mol")


if __name__ == "__main__":
    main()
