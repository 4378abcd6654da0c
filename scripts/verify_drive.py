#!/usr/bin/env python
"""End-to-end verification drive on the current device (meant for the real
TPU): the canonical single-pair dual-bath run with the hard-wall invariant,
then a medium SWM4 water box stepped through the public API with per-group
temperature checks.  One process so an unstable TPU window validates both
in a single grab."""

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


def main():
    import jax
    import openmm_drudenose_tpu as dn
    print("devices:", jax.devices())

    # ---- canonical single-pair drive ---------------------------------
    system = dn.System()
    system.addParticle(1.0)
    system.addParticle(0.1)
    dr = dn.DrudeForce()
    dr.addParticle(1, 0, -1, -1, -1, 0.1, 0.1 * 0.1 / 1.5, 1, 1)
    system.addForce(dr)
    integ = dn.DrudeTGNHIntegrator(300., 0.1, 10., 0.005, 0.003, 20, 2,
                                   False)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="single")
    ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
    ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])
    integ.step(2000)
    st = ctx.getState(positions=True, energy=True, groups=True)
    print("pair KE", st.getKineticEnergy(),
          "groupT", st.getGroupTemperatures())
    d = st.getPositions()[0] - st.getPositions()[1]
    assert np.sqrt(d @ d) <= 0.05 * 1.00001, "hard wall violated"
    assert np.isfinite(st.getPotentialEnergy())
    print("PASS: single-pair drive (hard wall held)")

    # ---- SWM4 water box through the public API ------------------------
    from tests.util import swm4_water_box
    system, positions = swm4_water_box(grid_size=4)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(300.0, seed=1)
    t0 = time.time()
    integ.step(1000)
    st = ctx.getState(energy=True, groups=True)
    wall = time.time() - t0
    temps = st.getGroupTemperatures()
    pe = st.getPotentialEnergy()
    print(f"water: PE {pe:.1f} kJ/mol, groupT {temps}, "
          f"1000 steps in {wall:.1f}s")
    assert np.isfinite(pe)
    assert np.all(np.isfinite(temps))
    # after 1 ps from a 300 K start the real baths sit near 300 K and the
    # Drude bath (thermalized fast) near its 1 K target
    assert 200.0 < temps[0] < 400.0, temps
    assert temps[-1] < 30.0, temps
    print("PASS: SWM4 water drive")

    # ---- flattened replica ensemble through the public API -------------
    ens = dn.FlatReplicaEnsemble(ctx, n_replicas=8, seed=5)
    ens.setVelocitiesToTemperature(300.0, seed=9)
    t0 = time.time()
    ens.step(1000)
    wall = time.time() - t0
    gt = ens.group_temperatures()
    ke = ens.kinetic_energies()
    print(f"flat ensemble: groupT mean {gt.mean(axis=0)}, "
          f"KE spread {ke.std():.2f}, 1000 steps in {wall:.1f}s")
    assert gt.shape == (8, 3) and np.all(np.isfinite(gt))
    assert np.all(np.isfinite(ke))
    assert np.all((200.0 < gt[:, 0]) & (gt[:, 0] < 400.0)), gt
    assert np.all(gt[:, -1] < 30.0), gt
    # replicas were seeded with distinct velocities: they must diverge
    assert ke.std() > 1e-3, "replicas did not diverge"
    print("PASS: flattened replica ensemble drive")


if __name__ == "__main__":
    for attempt in range(4):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 - TPU tunnel flaps
            if "UNAVAILABLE" in str(e) and attempt < 3:
                print(f"TPU unavailable (attempt {attempt}): retrying in 60s")
                time.sleep(60)
                continue
            raise
    print("VERIFY DRIVE OK")
