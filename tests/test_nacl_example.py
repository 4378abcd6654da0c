"""End-to-end test of the reference's bundled NaCl/SWM4 example system
(example/nacl_1m_pos.pdb), loaded through io/nacl.py."""

import os

import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import nacl

REFERENCE_PDB = "/root/reference/example/nacl_1m_pos.pdb"

pytestmark = pytest.mark.skipif(not os.path.exists(REFERENCE_PDB),
                                reason="reference PDB not available")


@pytest.mark.slow
def test_load_and_step():
    system, positions, topology = nacl.load_nacl_swm4(REFERENCE_PDB)
    assert system.getNumParticles() == 2500
    # 492 waters * 3 constraints
    assert system.getNumConstraints() == 492 * 3
    # 492 water Drudes + 20 ion Drudes
    drude = [f for f in system.getForces()
             if isinstance(f, dn.DrudeForce)][0]
    assert drude.getNumParticles() == 492 + 20
    # net charge ~ 0
    nb = [f for f in system.getForces()
          if isinstance(f, dn.NonbondedForce)][0]
    qtot = sum(nb.getParticleParameters(i)[0]
               for i in range(nb.getNumParticles()))
    assert abs(qtot) < 1e-9

    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-5)
    ctx.setVelocitiesToTemperature(300.0, seed=1)
    pe0 = ctx.getState(energy=True).getPotentialEnergy()
    assert np.isfinite(pe0)
    integ.step(20)
    st = ctx.getState(energy=True, groups=True)
    assert np.isfinite(st.getPotentialEnergy())
    assert np.isfinite(st.getKineticEnergy())
    temps = st.getGroupTemperatures()
    assert np.all(np.isfinite(temps))
    # hard wall holds for every Drude pair
    pos = ctx.getPositions()
    spec = ctx._spec
    partner = np.asarray(spec.partner)
    is_pair = np.asarray(spec.is_pair)
    d = np.linalg.norm(pos - pos[partner], axis=1)[is_pair]
    assert d.max() <= 0.02 * (1 + 1e-5)
