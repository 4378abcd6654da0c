"""Solvated polarizable polymer (BASELINE.md config 4): bonded terms +
constraints + hard wall + two temperature groups."""

import pytest
import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import polymer


@pytest.mark.slow
def test_polymer_builds_and_steps():
    system, positions, poly, wat = polymer.build_solvated_polymer(
        n_chains=2, chain_length=10, n_water=50,
        method=dn.NonbondedForce.CutoffPeriodic, cutoff=0.9)
    integ = polymer.make_tgnh_integrator(poly, wat,
                                         system.getNumParticles())
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-5)
    ctx.minimizeEnergy(maxIterations=150)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(30)
    st = ctx.getState(energy=True, groups=True)
    assert np.isfinite(st.getPotentialEnergy())
    temps = st.getGroupTemperatures()
    assert len(temps) == 4  # polymer, water, COM, Drude
    assert np.all(np.isfinite(temps))
    # hard wall respected
    pos = ctx.getPositions()
    spec = ctx._spec
    d = np.linalg.norm(pos - pos[np.asarray(spec.partner)], axis=1)
    assert d[np.asarray(spec.is_pair)].max() <= 0.02 * (1 + 1e-5)
