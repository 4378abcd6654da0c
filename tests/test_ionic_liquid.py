"""Multi-temperature-group TGNH on the ionic-liquid model system (the
paper's use case — BASELINE.md config 3): independent cation/anion/Drude
baths with per-ion group assignment."""

import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import ionic_liquid
from openmm_drudenose_tpu.units import BOLTZ


def test_three_group_setup_and_step():
    system, positions, cations, anions = ionic_liquid.build_ionic_liquid(
        n_pairs=32, method=dn.NonbondedForce.CutoffPeriodic, cutoff=1.2)
    integ = ionic_liquid.make_tgnh_integrator(
        cations, anions, system.getNumParticles())
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(400.0, seed=2)

    # bath layout: groups 0 (cation), 1 (anion), COM, Drude
    spec = ctx._spec
    nkbt = np.asarray(spec.nh_nkbt)
    assert len(nkbt) == 4
    assert (nkbt > 0).all()

    integ.step(50)
    st = ctx.getState(energy=True, groups=True)
    temps = st.getGroupTemperatures()
    assert len(temps) == 4
    assert np.all(np.isfinite(temps))
    assert np.isfinite(st.getPotentialEnergy())


@pytest.mark.slow
def test_three_group_temperatures_converge():
    system, positions, cations, anions = ionic_liquid.build_ionic_liquid(
        n_pairs=32, method=dn.NonbondedForce.CutoffPeriodic, cutoff=1.2)
    integ = ionic_liquid.make_tgnh_integrator(
        cations, anions, system.getNumParticles(), temperature=400.0,
        drude_temperature=1.0, step_size=0.0005)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    # minimize first: a violent start winds up the NH chains, which then
    # refrigerate the system for tens of ps while they unwind
    ctx.minimizeEnergy(maxIterations=300)
    ctx.setVelocitiesToTemperature(400.0, seed=2)
    integ.step(12000)
    samples = []
    for _ in range(1500):
        integ.step(2)
        samples.append(ctx.getState(groups=True).getGroupTemperatures())
    mean = np.mean(samples, axis=0)
    # cation, anion baths at 400 K; Drude bath at 1 K
    np.testing.assert_allclose(mean[0], 400.0, rtol=0.10)
    np.testing.assert_allclose(mean[1], 400.0, rtol=0.10)
    np.testing.assert_allclose(mean[2], 400.0, rtol=0.12)  # COM bath
    np.testing.assert_allclose(mean[3], 1.0, rtol=0.25)
