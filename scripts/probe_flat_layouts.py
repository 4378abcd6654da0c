#!/usr/bin/env python
"""A/B flat-ensemble layouts on the current device: times the 64 x 4k
ensemble step at explicit (rx, rz) layouts including padded ones, printing
each layout's internal replica count and ms/step.  Isolates the auto
layout's cost-model error (the padded 7x10 pick measured 30% SLOWER than
8x8 in bench_replicas while the model predicted 3% faster)."""

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
    import jax
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_mol = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    steps = 64

    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(500)

    for rx, rz in ((8, 8), (7, 10), (4, 16), (13, 5)):
        if rx * rz < R:
            continue
        ens = FlatReplicaEnsemble(ctx, n_replicas=R, rx=rx, rz=rz, seed=7)
        cfg = ens.context._cp_cfg
        ens.setVelocitiesToTemperature(300.0, seed=3)
        ens.step(steps)
        jax.block_until_ready(ens.context._state.positions)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            ens.step(steps)
            jax.block_until_ready(ens.context._state.positions)
            best = min(best, (time.time() - t0) / steps * 1e3)
        ke = np.asarray(ens.kinetic_energies())
        assert np.all(np.isfinite(ke))
        print(f"rx={rx:3d} rz={rz:3d} r_int={rx * rz:3d} "
              f"grid={getattr(cfg, 'grid', '?')} "
              f"cap={getattr(cfg, 'capacity', '?')}: {best:7.2f} ms/step")
        del ens


if __name__ == "__main__":
    main()
