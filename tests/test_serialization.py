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


def _decorated_water_system(n_mol=20):
    """A water box decorated with every serializable feature: bonded
    forces, NBFIX LJ overrides, NBTHOLE pairs, a LocalCoordinatesSite,
    and a barostat — so the System XML round trip covers all branches."""
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.system import LocalCoordinatesSite
    system, positions = builders.build_water_box(n_mol)
    nbf = next(f for f in system.getForces()
               if isinstance(f, dn.NonbondedForce))
    nbf.addLJPairOverride([0, 5], [10, 15], 0.31, 0.8)
    drude = next(f for f in system.getForces()
                 if isinstance(f, dn.DrudeForce))
    drude.addNBTholePair(0, 1, 1.3)
    bonds = dn.HarmonicBondForce()
    bonds.addBond(0, 2, 0.1, 1000.0)
    system.addForce(bonds)
    angles = dn.HarmonicAngleForce()
    angles.addAngle(2, 0, 3, 1.82, 100.0)
    system.addForce(angles)
    tors = dn.PeriodicTorsionForce()
    tors.addTorsion(2, 0, 3, 4, 2, 0.5, 5.0)
    system.addForce(tors)
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 23))
    # replace one water's M-site definition with the equivalent
    # LocalCoordinatesSite to exercise that branch
    vs = system.getVirtualSite(4)
    system.setVirtualSite(4, LocalCoordinatesSite(
        list(vs.particles), list(vs.weights), [1.0, -0.5, -0.5],
        [0.0, 1.0, -1.0], [0.0, 0.0, 0.0]))
    return system, positions


def test_system_xml_round_trip():
    """System XML must rebuild an IDENTICAL SystemSpec (hash-equal
    arrays) — the role OpenMM's XmlSerializer<System> plays for the
    reference workflow (SURVEY.md section 2.4)."""
    import jax
    import jax.numpy as jnp
    from openmm_drudenose_tpu.core import spec as spec_mod

    system, _ = _decorated_water_system()
    xml = dn.XmlSerializer.serialize(system)
    system2 = dn.XmlSerializer.deserialize(xml)
    assert isinstance(system2, dn.System)

    def spec_of(s):
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
        integ.setMaxDrudeDistance(0.02)
        return spec_mod.build_spec(s, integ, jnp.float64, jnp.float64)

    spec1, static1, edd1 = spec_of(system)
    spec2, static2, edd2 = spec_of(system2)
    assert static1 == static2
    np.testing.assert_array_equal(edd1, edd2)
    l1, t1 = jax.tree.flatten(spec1)
    l2, t2 = jax.tree.flatten(spec2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # second round trip is textually identical (stable form)
    assert dn.XmlSerializer.serialize(system2) == xml


def test_context_reconstructible_from_files(tmp_path):
    """System XML + integrator XML + state checkpoint => the same
    trajectory, with no live objects carried over."""
    system, positions = _decorated_water_system(8)
    # drop the barostat (the last force added) for a cheap exact-NVT
    # trajectory comparison
    from openmm_drudenose_tpu.forces.cmmotion import MonteCarloBarostat
    idx = next(i for i in range(system.getNumForces())
               if isinstance(system.getForce(i), MonteCarloBarostat))
    system.removeForce(idx)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=3)
    integ.step(20)

    (tmp_path / "system.xml").write_text(dn.XmlSerializer.serialize(system))
    (tmp_path / "integrator.xml").write_text(
        dn.XmlSerializer.serialize(integ))
    dn.save_checkpoint(str(tmp_path / "state.npz"), ctx)
    integ.step(20)
    ref = ctx.getState(positions=True).getPositions()

    system2 = dn.XmlSerializer.deserialize(
        (tmp_path / "system.xml").read_text())
    integ2 = dn.XmlSerializer.deserialize(
        (tmp_path / "integrator.xml").read_text())
    ctx2 = dn.Context(system2, integ2, precision="double")
    dn.load_checkpoint(str(tmp_path / "state.npz"), ctx2)
    integ2.step(20)
    res = ctx2.getState(positions=True).getPositions()
    np.testing.assert_array_equal(res, ref)


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
