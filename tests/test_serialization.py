"""Serialization round trip — the reference's testSerialization
(serialization/tests/TestSerializeDrudeTGNHIntegrator.cpp:45-67) plus the
fields its proxy loses (temp groups, maxDrudeDistance, useCOMTempGroup) and
full-state checkpoints including NH chain state."""

import numpy as np

import openmm_drudenose_tpu as dn

from util import single_pair_system


def test_integrator_xml_round_trip():
    integ = dn.DrudeTGNHIntegrator(301.1, 0.11, 10.1, 0.051, 0.0005,
                                   21, 3, True, False)
    integ.setMaxDrudeDistance(0.021)
    integ.setConstraintTolerance(1e-6)
    integ.addTempGroup()
    integ.addTempGroup()
    for g in (0, 0, 1, 1, 0):
        integ.addParticleTempGroup(g)

    xml = dn.serialize_integrator(integ)
    integ2 = dn.deserialize_integrator(xml)

    assert integ2.getTemperature() == integ.getTemperature()
    assert integ2.getCouplingTime() == integ.getCouplingTime()
    assert integ2.getDrudeTemperature() == integ.getDrudeTemperature()
    assert integ2.getDrudeCouplingTime() == integ.getDrudeCouplingTime()
    assert integ2.getStepSize() == integ.getStepSize()
    assert integ2.getDrudeStepsPerRealStep() == integ.getDrudeStepsPerRealStep()
    assert integ2.getNumNHChains() == integ.getNumNHChains()
    assert integ2.getUseDrudeNHChains() == integ.getUseDrudeNHChains()
    assert integ2.getConstraintTolerance() == integ.getConstraintTolerance()
    # fields the reference proxy drops (SURVEY.md section 2.4) — kept here
    assert integ2.getMaxDrudeDistance() == integ.getMaxDrudeDistance()
    assert integ2.getUseCOMTempGroup() == integ.getUseCOMTempGroup()
    assert integ2.getNumTempGroups() == 2
    assert [integ2.getParticleTempGroup(i) for i in range(5)] == [0, 0, 1, 1, 0]


def test_checkpoint_resume_bit_exact(tmp_path):
    """Resume must continue the exact trajectory — including the NH chain
    state the reference silently resets (SURVEY.md section 5)."""
    def make():
        system = single_pair_system()
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 10.0, 0.005, 0.003, 20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double")
        ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
        ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])
        return ctx, integ

    ctx, integ = make()
    integ.step(100)
    path = str(tmp_path / "chk.npz")
    dn.save_checkpoint(path, ctx)
    # continue the original
    integ.step(50)
    ref = ctx.getState(positions=True, velocities=True)

    # fresh context, resume, continue
    ctx2, integ2 = make()
    dn.load_checkpoint(path, ctx2)
    assert int(ctx2._state.step) == 100
    integ2.step(50)
    res = ctx2.getState(positions=True, velocities=True)
    np.testing.assert_array_equal(res.getPositions(), ref.getPositions())
    np.testing.assert_array_equal(res.getVelocities(), ref.getVelocities())


def test_reinitialize_preserves_state():
    import openmm_drudenose_tpu as dn
    system = single_pair_system()
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 10.0, 0.005, 0.003, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
    ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])
    integ.step(50)
    pos_before = ctx.getPositions()
    integ.setDrudeStepsPerRealStep(10)  # edit requiring recompilation
    ctx.reinitialize(preserveState=True)
    np.testing.assert_array_equal(ctx.getPositions(), pos_before)
    assert ctx._static.drude_steps == 10
    integ.step(10)
    st = ctx.getState(energy=True)
    assert np.isfinite(st.getPotentialEnergy())
