"""Ingestion-breadth mechanisms: LocalCoordinatesSite virtual sites,
NBFIX-style LJ pair overrides, and NBTHOLE screened ion pairs.

These close the system-ingestion gaps of general CHARMM-Drude systems
(the reference consumes charmm_polar_2013.xml via OpenMM's ForceField,
/root/reference/example/nacl_tg.py:37-42): lone pairs are
LocalCoordinatesSites, and the XML carries NBFIX/NBTHOLE entries for ion
pairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.constraints.vsites import apply_vsites
from openmm_drudenose_tpu.core import spec as spec_mod
from openmm_drudenose_tpu.system import LocalCoordinatesSite
from openmm_drudenose_tpu.units import ONE_4PI_EPS0


def _base_system(n_massive=3, n_virtual=1):
    system = dn.System()
    for _ in range(n_massive):
        system.addParticle(10.0)
    # one drude pair so the integrator initializes
    system.addParticle(0.4)
    for _ in range(n_virtual):
        system.addParticle(0.0)
    dr = dn.DrudeForce()
    dr.addParticle(n_massive, 0, -1, -1, -1, -1.0, 1e-3, 1, 1)
    system.addForce(dr)
    return system


def test_local_coordinates_site_position():
    system = _base_system()
    vs_index = 4
    local = (0.05, 0.02, 0.01)
    system.setVirtualSite(vs_index, LocalCoordinatesSite(
        (0, 1, 2), (1.0, 0.0, 0.0), (-1.0, 1.0, 0.0), (-1.0, 0.0, 1.0),
        local))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    spec, static, _ = spec_mod.build_spec(system, integ, jnp.float64,
                                          jnp.float64)
    assert static.n_vsites_lc == 1

    rng = np.random.default_rng(0)
    pos = rng.normal(0, 0.3, (5, 3))
    out = np.asarray(apply_vsites(spec, static, jnp.asarray(pos)))

    # manual OpenMM-semantics computation
    origin = pos[0]
    xdir = pos[1] - pos[0]
    ydir = pos[2] - pos[0]
    xhat = xdir / np.linalg.norm(xdir)
    zdir = np.cross(xdir, ydir)
    zhat = zdir / np.linalg.norm(zdir)
    yhat = np.cross(zhat, xhat)
    expect = origin + local[0] * xhat + local[1] * yhat + local[2] * zhat
    np.testing.assert_allclose(out[vs_index], expect, rtol=1e-12)
    # other rows untouched
    np.testing.assert_allclose(out[:4], pos[:4], rtol=1e-12)


def test_local_coordinates_site_force_consistency():
    """Autodiff force redistribution through the local frame must match
    finite differences of a potential pinned to the site."""
    system = _base_system()
    system.setVirtualSite(4, LocalCoordinatesSite(
        (0, 1, 2), (0.4, 0.3, 0.3), (-1.0, 1.0, 0.0), (-1.0, 0.0, 1.0),
        (0.03, -0.01, 0.02)))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    spec, static, _ = spec_mod.build_spec(system, integ, jnp.float64,
                                          jnp.float64)
    target = jnp.asarray([0.1, 0.2, 0.3])

    def pe(p):
        comp = apply_vsites(spec, static, p)
        d = comp[4] - target
        return jnp.sum(d * d) * 17.0

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(0, 0.3, (5, 3)))
    g = jax.grad(pe)(pos)
    h = 1e-7
    for i in (0, 1, 2):
        for c in range(3):
            pp = pos.at[i, c].add(h)
            pm = pos.at[i, c].add(-h)
            num = (pe(pp) - pe(pm)) / (2 * h)
            np.testing.assert_allclose(float(g[i, c]), float(num),
                                       rtol=1e-5, atol=1e-8)


def _two_ion_box(override=False, nbthole=False):
    system = dn.System()
    nb = dn.NonbondedForce()
    dr = dn.DrudeForce()
    system.addForce(nb)
    system.addForce(dr)
    L = 4.0
    system.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))
    nb.setNonbondedMethod(dn.NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(1.2)
    nb.setUseDispersionCorrection(False)
    # ion 1 (core+shell), ion 2 (core+shell)
    for q, sig, eps in ((1.0, 0.25, 0.4), (-1.0, 0.4, 0.6)):
        core = system.addParticle(22.0)
        shell = system.addParticle(0.4)
        nb.addParticle(q + 1.2, sig, eps)
        nb.addParticle(-1.2, 1.0, 0.0)
        nb.addException(core, shell, 0, 1, 0)
        dr.addParticle(shell, core, -1, -1, -1, -1.2, 1.5e-3, 1, 1)
    if override:
        nb.addLJPairOverride([0], [2], 0.33, 0.9)
    if nbthole:
        dr.addNBTholePair(0, 1, 2.6)
    return system


def test_lj_pair_override_energy():
    pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.01],
                    [0.5, 0.1, 0.0], [0.5, 0.1, 0.01]])
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx0 = dn.Context(_two_ion_box(), integ, precision="double")
    ctx0.setPositions(pos)
    e0 = ctx0.getState(energy=True).getPotentialEnergy()

    integ1 = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx1 = dn.Context(_two_ion_box(override=True), integ1,
                      precision="double")
    ctx1.setPositions(pos)
    e1 = ctx1.getState(energy=True).getPotentialEnergy()

    # expected: replace combined LJ by the override for the (0, 2) pair
    r = np.linalg.norm(pos[0] - pos[2])
    def lj(sig, eps):
        x6 = (sig / r) ** 6
        return 4 * eps * x6 * (x6 - 1)
    expect = lj(0.33, 0.9) - lj(0.5 * (0.25 + 0.4), np.sqrt(0.4 * 0.6))
    np.testing.assert_allclose(e1 - e0, expect, rtol=1e-9)


def test_lj_pair_override_outside_cutoff_is_zero():
    pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.01],
                    [1.9, 0.0, 0.0], [1.9, 0.0, 0.01]])
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx0 = dn.Context(_two_ion_box(), integ, precision="double")
    ctx0.setPositions(pos)
    e0 = ctx0.getState(energy=True).getPotentialEnergy()
    integ1 = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx1 = dn.Context(_two_ion_box(override=True), integ1,
                      precision="double")
    ctx1.setPositions(pos)
    e1 = ctx1.getState(energy=True).getPotentialEnergy()
    np.testing.assert_allclose(e1, e0, rtol=1e-12)


def test_nbthole_energy_and_forces():
    pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.012],
                    [0.42, 0.0, 0.0], [0.42, 0.0, -0.008]])
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx0 = dn.Context(_two_ion_box(), integ, precision="double")
    ctx0.setPositions(pos)
    e0 = ctx0.getState(energy=True).getPotentialEnergy()

    integ1 = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx1 = dn.Context(_two_ion_box(nbthole=True), integ1,
                      precision="double")
    ctx1.setPositions(pos)
    st = ctx1.getState(energy=True, forces=True)
    e1 = st.getPotentialEnergy()

    # hand evaluation of the 4-cross-pair screening deficit
    qd = -1.2
    scale = 2.6 / (1.5e-3 * 1.5e-3) ** (1.0 / 6.0)
    def deficit(pa, pb, sign):
        r = np.linalg.norm(pos[pa] - pos[pb])
        u = scale * r
        return sign * ONE_4PI_EPS0 * qd * qd * (-(1 + 0.5 * u)
                                                * np.exp(-u)) / r
    expect = (deficit(1, 3, 1.0) + deficit(1, 2, -1.0)
              + deficit(0, 3, -1.0) + deficit(0, 2, 1.0))
    np.testing.assert_allclose(e1 - e0, expect, rtol=1e-9)

    # force consistency by finite differences
    forces = st.getForces()
    def pe_at(p):
        ctx1.setPositions(p)
        return ctx1.getState(energy=True).getPotentialEnergy()
    h = 1e-7
    for i in (0, 3):
        d = np.array([0.3, -0.5, 0.8]); d /= np.linalg.norm(d)
        pp = pos.copy(); pp[i] += d * h
        pm = pos.copy(); pm[i] -= d * h
        num = (pe_at(pp) - pe_at(pm)) / (2 * h)
        np.testing.assert_allclose(-num, forces[i] @ d, rtol=1e-5,
                                   atol=1e-6)
