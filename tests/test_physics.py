"""Statistical physics tests — the reference's three integration tests
(SURVEY.md section 4), shortened for CI but same invariants:

  * testSinglePair: per-bath temperature convergence + hard-wall invariant
  * testWater: mixed-DOF temperature of an SWM4 box
  * testForceEnergyConsistency: dU = -<F> dx along a PME trajectory
"""

import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.units import BOLTZ

from util import ion_pair_pme_box, single_pair_system, swm4_water_box


def test_single_pair_bath_temperatures():
    """Reference Test*DrudeTGNHIntegrator.cpp:54-109 (reduced sampling;
    tolerances widened accordingly)."""
    temperature, temperature_drude = 300.0, 10.0
    mass1, mass2 = 1.0, 0.1
    total_mass = mass1 + mass2
    reduced_mass = mass1 * mass2 / total_mass
    max_distance = 0.05
    system = single_pair_system(mass1=mass1, mass2=mass2)
    integ = dn.DrudeTGNHIntegrator(temperature, 0.1, temperature_drude,
                                   0.005, 0.003, 20, 2, False)
    integ.setMaxDrudeDistance(max_distance)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
    ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])

    integ.step(1000)
    ke_cm = ke_int = 0.0
    n_samples = 3000
    for _ in range(n_samples):
        integ.step(10)
        st = ctx.getState(positions=True, velocities=True)
        vel = st.getVelocities()
        v_cm = vel[0] * (mass1 / total_mass) + vel[1] * (mass2 / total_mass)
        ke_cm += 0.5 * total_mass * v_cm @ v_cm
        v_int = vel[0] - vel[1]
        ke_int += 0.5 * reduced_mass * v_int @ v_int
        d = st.getPositions()[0] - st.getPositions()[1]
        assert np.sqrt(d @ d) <= max_distance * (1 + 1e-6)
    np.testing.assert_allclose(ke_cm / n_samples, 1.5 * BOLTZ * temperature,
                               rtol=0.15)
    np.testing.assert_allclose(ke_int / n_samples,
                               1.5 * BOLTZ * temperature_drude, rtol=0.02)


def test_water_temperature_smoke():
    """Fast-tier statistical smoke (VERDICT round-3 weak 3): a 2x2x2
    SWM4 box sampled briefly with a loose +-20% bound on the mixed-DOF
    temperature — catches gross thermostat-statistics regressions in
    default CI; the tight version is the slow-tier test below."""
    temperature, temperature_drude = 300.0, 1.0
    system, positions = swm4_water_box(grid_size=2)
    n_mol = 8
    integ = dn.DrudeTGNHIntegrator(temperature, 0.05, temperature_drude,
                                   0.005, 0.0005, 20, 5, False)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-5)
    ctx.setVelocitiesToTemperature(temperature, seed=3)

    integ.step(1500)
    ke = 0.0
    n_samples = 1200
    for _ in range(n_samples):
        integ.step(2)
        ke += ctx.getState(energy=True).getKineticEnergy()
    ke /= n_samples
    n_std = 3 * 3 * n_mol - system.getNumConstraints() - 3
    n_dru = 3 * n_mol
    n_dof = n_std + n_dru
    expected = (n_std * temperature + n_dru * temperature_drude) / n_dof
    np.testing.assert_allclose(ke / (0.5 * n_dof * BOLTZ), expected,
                               rtol=0.20)


@pytest.mark.slow
def test_water_mixed_temperature():
    """Reference testWater (Test*DrudeTGNHIntegrator.cpp:111-192), 3x3x3
    molecules and shorter averaging than the reference's 6x6x6/9000 steps."""
    temperature, temperature_drude = 300.0, 1.0
    system, positions = swm4_water_box(grid_size=3)
    n_mol = 27
    integ = dn.DrudeTGNHIntegrator(temperature, 0.1, temperature_drude,
                                   0.005, 0.0005, 20, 10, False)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-5)

    integ.step(6000)
    ke = 0.0
    n_samples = 4000
    for _ in range(n_samples):
        integ.step(1)
        ke += ctx.getState(energy=True).getKineticEnergy()
    ke /= n_samples
    n_std = 3 * 3 * n_mol - system.getNumConstraints() - 3
    n_dru = 3 * n_mol
    n_dof = n_std + n_dru
    expected = (n_std * temperature + n_dru * temperature_drude) / n_dof
    np.testing.assert_allclose(ke / (0.5 * n_dof * BOLTZ), expected,
                               rtol=0.05)


def test_force_energy_consistency_pme():
    """Force/energy consistency for the PME + switching system of the
    reference's testForceEnergyConsistency (Test*DrudeTGNHIntegrator.cpp:
    194-252), checked the exact way: directional finite differences of the
    potential against the reported forces.  (The reference's trajectory
    version is commented out of its own main() at :259 — the overlapping
    start makes the system explode under near-NVE settings.)"""
    import jax
    import jax.numpy as jnp

    system, positions = ion_pair_pme_box(grid_size=3)
    rng = np.random.default_rng(9)
    positions = positions + rng.normal(0, 0.02, positions.shape)
    integ = dn.DrudeTGNHIntegrator(300.0, 50.0, 10.0, 50.0, 0.001, 20, 1)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    st = ctx.getState(forces=True, energy=True)
    forces = st.getForces()

    def pe_at(pos):
        ctx.setPositions(pos)
        return ctx.getState(energy=True).getPotentialEnergy()

    h = 1e-6
    for _ in range(5):
        i = int(rng.integers(len(positions)))
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        pp = positions.copy(); pp[i] += d * h
        pm = positions.copy(); pm[i] -= d * h
        num = (pe_at(pp) - pe_at(pm)) / (2 * h)
        np.testing.assert_allclose(-num, forces[i] @ d, rtol=5e-5, atol=1e-3)


def test_conserved_energy_drift():
    """The TGNH conserved quantity must be stable along a water trajectory
    — a deterministic integrator-fidelity check the reference lacks."""
    system, positions = swm4_water_box(grid_size=2)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 3)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-7)
    ctx.setVelocitiesToTemperature(200.0, seed=3)
    ctx.applyVelocityConstraints(1e-10)
    integ.step(200)  # settle transients
    e0 = ctx.getConservedEnergy()
    samples = []
    for _ in range(10):
        integ.step(50)
        samples.append(ctx.getConservedEnergy())
    scale = max(abs(e0), 1.0)
    drift = max(abs(s - e0) for s in samples) / scale
    assert drift < 2e-3, (e0, samples)


def test_hardwall_runaway_raises():
    """A Drude flung >2x past the hard wall in one step must raise on the
    host — parity with the Reference platform's throw
    (ReferenceDrudeTGNHKernels.cpp:311-312).  The CUDA platform silently
    proceeds; we follow the stricter Reference semantics."""
    system = single_pair_system()
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 10.0, 0.005, 0.001, 20, 2,
                                   False)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double",
                     hardwall_strict=True)
    # deliberately exploded pair: the shell starts 0.1 nm from the core,
    # far beyond 2 x 0.02 nm (the NH chain damps injected velocities, so a
    # displaced start is the reliable way to exercise the error path)
    ctx.setPositions([[0, 0, 0], [0, 0, 0.1]])
    ctx.setVelocities([[0, 0, 0], [0, 0, 0]])
    with pytest.raises(RuntimeError, match="hard wall"):
        integ.step(5)
    # the latch resets on raise so a recovered simulation can continue
    ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
    ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])
    integ.step(5)
    assert not ctx.hardwallRunaway

    # default (CUDA-platform parity): same explosion only warns + latches
    integ2 = dn.DrudeTGNHIntegrator(300.0, 0.1, 10.0, 0.005, 0.001, 20, 2,
                                    False)
    integ2.setMaxDrudeDistance(0.02)
    ctx2 = dn.Context(system, integ2, precision="double")
    ctx2.setPositions([[0, 0, 0], [0, 0, 0.1]])
    ctx2.setVelocities([[0, 0, 0], [0, 0, 0]])
    with pytest.warns(RuntimeWarning, match="hard wall"):
        integ2.step(5)
    assert ctx2.hardwallRunaway
    ctx2.clearHardwallRunaway()
    assert not ctx2.hardwallRunaway
