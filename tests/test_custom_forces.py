"""General Custom*Force classes (forces/custom.py).

The reference rides OpenMM's Lepton-driven Custom*Force machinery
(example/nacl_tg.py:37-42 loads XML decks with arbitrary Custom*Force
algebra); these tests pin our expression-compiled equivalents against
the stock forces and finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces.custom import (CustomAngleForce,
                                                CustomBondForce,
                                                CustomNonbondedForce,
                                                CustomTorsionForce)

F64 = jnp.float64


def _energy(force, system, positions, box=None):
    fn, params = force.compile(system, F64)
    if box is None:
        box = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
    return fn, params, jnp.asarray(positions, F64), jnp.asarray(box, F64)


def _fd_forces(fn, params, pos, box, h=1e-6):
    pos = np.asarray(pos, np.float64)
    out = np.zeros_like(pos)
    for i in range(pos.shape[0]):
        for c in range(3):
            p = pos.copy()
            p[i, c] += h
            ep = float(fn(params, jnp.asarray(p), box))
            p[i, c] -= 2 * h
            em = float(fn(params, jnp.asarray(p), box))
            out[i, c] = -(ep - em) / (2 * h)
    return out


def _small_system(n):
    s = dn.System()
    for _ in range(n):
        s.addParticle(16.0)
    s.setDefaultPeriodicBoxVectors([4.0, 0, 0], [0, 4.0, 0], [0, 0, 4.0])
    return s


def test_custom_bond_matches_harmonic():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.5, 1.5, (6, 3))
    s = _small_system(6)
    hb = dn.HarmonicBondForce()
    cb = CustomBondForce("0.5*kb*(r-r0)^2")
    cb.addPerBondParameter("r0")
    cb.addPerBondParameter("kb")
    for (i, j) in ((0, 1), (2, 3), (4, 5)):
        hb.addBond(i, j, 0.1, 1000.0)
        cb.addBond(i, j, [0.1, 1000.0])
    fn_h, p_h = hb.compile(s, F64)
    fn_c, p_c = cb.compile(s, F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    np.testing.assert_allclose(float(fn_c(p_c, pj, box)),
                               float(fn_h(p_h, pj, box)), rtol=1e-12)
    g_c = jax.grad(lambda p: fn_c(p_c, p, box))(pj)
    g_h = jax.grad(lambda p: fn_h(p_h, p, box))(pj)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_h), rtol=1e-12)


def test_custom_bond_global_parameter_and_defs():
    s = _small_system(2)
    cb = CustomBondForce("scale*e0; e0=kb*(r-r0)^2")
    cb.addPerBondParameter("r0")
    cb.addPerBondParameter("kb")
    cb.addGlobalParameter("scale", 0.5)
    cb.addBond(0, 1, [0.1, 1000.0])
    fn, params = cb.compile(s, F64)
    pos = jnp.asarray([[0.0, 0, 0], [0.25, 0, 0]], F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    assert np.isclose(float(fn(params, pos, box)),
                      0.5 * 1000.0 * 0.15 ** 2)


def test_custom_angle_matches_harmonic():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0.5, 1.5, (3, 3))
    s = _small_system(3)
    ha = dn.HarmonicAngleForce()
    ca = CustomAngleForce("0.5*ka*(theta-t0)^2")
    ca.addPerAngleParameter("t0")
    ca.addPerAngleParameter("ka")
    ha.addAngle(0, 1, 2, 1.9, 400.0)
    ca.addAngle(0, 1, 2, [1.9, 400.0])
    fn_h, p_h = ha.compile(s, F64)
    fn_c, p_c = ca.compile(s, F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    np.testing.assert_allclose(float(fn_c(p_c, pj, box)),
                               float(fn_h(p_h, pj, box)), rtol=1e-12)


def test_custom_torsion_matches_periodic():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0.0, 1.0, (4, 3))
    s = _small_system(4)
    pt = dn.PeriodicTorsionForce()
    ct = CustomTorsionForce("kt*(1+cos(n*theta-phase))")
    ct.addPerTorsionParameter("kt")
    ct.addPerTorsionParameter("n")
    ct.addPerTorsionParameter("phase")
    pt.addTorsion(0, 1, 2, 3, 2, 0.6, 12.0)
    ct.addTorsion(0, 1, 2, 3, [12.0, 2.0, 0.6])
    fn_p, p_p = pt.compile(s, F64)
    fn_c, p_c = ct.compile(s, F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    np.testing.assert_allclose(float(fn_c(p_c, pj, box)),
                               float(fn_p(p_p, pj, box)), rtol=1e-12)
    g_c = jax.grad(lambda p: fn_c(p_c, p, box))(pj)
    fd = _fd_forces(fn_c, p_c, pos, box)
    np.testing.assert_allclose(-np.asarray(g_c), fd, atol=1e-5)


def test_custom_nonbonded_lj_matches_closed_form():
    # 4 particles, NoCutoff LJ via per-particle sigma/eps,
    # Lorentz-Berthelot in the expression
    rng = np.random.default_rng(3)
    pos = rng.uniform(0.0, 1.2, (4, 3))
    s = _small_system(4)
    cn = CustomNonbondedForce(
        "4*eps*(s6^2-s6); s6=(sig/r)^6; "
        "sig=0.5*(sigma1+sigma2); eps=sqrt(epsilon1*epsilon2)")
    cn.addPerParticleParameter("sigma")
    cn.addPerParticleParameter("epsilon")
    prm = [(0.3, 0.5), (0.32, 0.7), (0.28, 0.4), (0.31, 0.6)]
    for p in prm:
        cn.addParticle(p)
    cn.addExclusion(0, 1)
    fn, params = cn.compile(s, F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    e = float(fn(params, pj, box))
    ref = 0.0
    for i in range(4):
        for j in range(i + 1, 4):
            if (i, j) == (0, 1):
                continue
            r = np.linalg.norm(pos[i] - pos[j])
            sig = 0.5 * (prm[i][0] + prm[j][0])
            eps = np.sqrt(prm[i][1] * prm[j][1])
            s6 = (sig / r) ** 6
            ref += 4 * eps * (s6 * s6 - s6)
    np.testing.assert_allclose(e, ref, rtol=1e-10)
    # forces: autodiff == finite differences (incl. the excluded pair's
    # absence and the double-where guard at the diagonal)
    g = jax.grad(lambda p: fn(params, p, box))(pj)
    fd = _fd_forces(fn, params, pos, box)
    np.testing.assert_allclose(-np.asarray(g), fd, atol=1e-4)


def test_custom_nonbonded_cutoff_periodic_and_switch():
    rng = np.random.default_rng(4)
    n = 20
    box_l = 2.0
    pos = rng.uniform(0.0, box_l, (n, 3))
    s = _small_system(n)
    s.setDefaultPeriodicBoxVectors([box_l, 0, 0], [0, box_l, 0],
                                   [0, 0, box_l])
    cn = CustomNonbondedForce("a1*a2/r^6")
    cn.addPerParticleParameter("a")
    av = rng.uniform(0.5, 1.0, n)
    for i in range(n):
        cn.addParticle([av[i]])
    cn.setNonbondedMethod(CustomNonbondedForce.CutoffPeriodic)
    cn.setCutoffDistance(0.9)
    cn.setUseSwitchingFunction(True)
    cn.setSwitchingDistance(0.7)
    fn, params = cn.compile(s, F64)
    box = jnp.eye(3, dtype=F64) * box_l
    pj = jnp.asarray(pos, F64)
    e = float(fn(params, pj, box))
    ref = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = pos[i] - pos[j]
            d -= box_l * np.round(d / box_l)
            r = np.linalg.norm(d)
            if r >= 0.9:
                continue
            x = np.clip((r - 0.7) / 0.2, 0.0, 1.0)
            sw = 1 - 10 * x ** 3 + 15 * x ** 4 - 6 * x ** 5
            ref += av[i] * av[j] / r ** 6 * sw
    np.testing.assert_allclose(e, ref, rtol=1e-9)


def test_custom_nonbonded_blocking_invariance():
    # row-block size must not change the answer (padding rows masked)
    rng = np.random.default_rng(5)
    n = 7
    pos = rng.uniform(0.0, 1.0, (n, 3))
    s = _small_system(n)
    cn = CustomNonbondedForce("q1*q2/r")
    cn.addPerParticleParameter("q")
    for i in range(n):
        cn.addParticle([(-1.0) ** i])
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    vals = []
    for B in (1, 3, 7, 256):
        fn, params = cn.compile(s, F64, block_rows=B)
        vals.append(float(fn(params, pj, box)))
    np.testing.assert_allclose(vals, vals[0], rtol=1e-12)


def test_custom_forces_in_context_dynamics():
    # a Custom bond + torsion run end to end through Context (forces via
    # autodiff inside the jitted step)
    s = dn.System()
    for _ in range(4):
        s.addParticle(12.0)
    s.addParticle(0.4)           # Drude particle (the integrator requires
    drude = dn.DrudeForce()      # a DrudeForce, reference parity)
    drude.addParticle(4, 0, -1, -1, -1, 0.3, 0.001, 1, 1)
    s.addForce(drude)
    s.setDefaultPeriodicBoxVectors([3.0, 0, 0], [0, 3.0, 0], [0, 0, 3.0])
    cb = CustomBondForce("0.5*kb*(r-r0)^2")
    cb.addPerBondParameter("r0")
    cb.addPerBondParameter("kb")
    for (i, j) in ((0, 1), (1, 2), (2, 3)):
        cb.addBond(i, j, [0.15, 50000.0])
    ct = CustomTorsionForce("kt*(1+cos(theta))")
    ct.addPerTorsionParameter("kt")
    ct.addTorsion(0, 1, 2, 3, [20.0])
    s.addForce(cb)
    s.addForce(ct)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.0005, 1, 1)
    ctx = dn.Context(s, integ, precision="double", strategy="dense")
    pos0 = np.array([[0.0, 0, 0], [0.15, 0, 0], [0.15, 0.15, 0],
                     [0.3, 0.15, 0.05], [0.001, 0.001, 0.0]])
    ctx.setPositions(pos0)
    ctx.setVelocitiesToTemperature(300.0, seed=1)
    e0 = ctx.getState(getEnergy=True).getPotentialEnergy()
    integ.step(200)
    st = ctx.getState(getEnergy=True, getPositions=True)
    assert np.all(np.isfinite(st.getPositions()))
    assert np.isfinite(st.getPotentialEnergy())
    assert abs(st.getPotentialEnergy()) < 1e4 and np.isfinite(e0)


def test_custom_nonbonded_particle_count_mismatch():
    s = _small_system(3)
    cn = CustomNonbondedForce("1/r")
    cn.addParticle([])
    with pytest.raises(ValueError):
        cn.compile(s, F64)


def test_context_set_parameter():
    # OpenMM Context::setParameter semantics: update a Custom*Force
    # global and the recompiled energies follow
    s = _small_system(2)
    s.addParticle(0.4)
    drude = dn.DrudeForce()
    drude.addParticle(2, 0, -1, -1, -1, 0.3, 0.001, 1, 1)
    s.addForce(drude)
    cb = CustomBondForce("scale*0.5*kb*(r-r0)^2")
    cb.addPerBondParameter("r0")
    cb.addPerBondParameter("kb")
    cb.addGlobalParameter("scale", 1.0)
    cb.addBond(0, 1, [0.1, 1000.0])
    s.addForce(cb)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.0005, 1, 1)
    ctx = dn.Context(s, integ, precision="double", strategy="dense")
    pos = np.array([[0.0, 0, 0], [0.25, 0, 0], [0.001, 0, 0]])
    ctx.setPositions(pos)
    e1 = ctx.getState(getEnergy=True).getPotentialEnergy()
    assert ctx.getParameter("scale") == 1.0
    ctx.setParameter("scale", 0.25)
    e2 = ctx.getState(getEnergy=True).getPotentialEnergy()
    # the bond term scales by 0.25; the (unchanged) Drude spring energy
    # is ~0 at this geometry
    drude_e = e1 - 0.5 * 1000.0 * 0.15 ** 2
    np.testing.assert_allclose(e2 - drude_e, 0.25 * (e1 - drude_e),
                               rtol=1e-9, atol=1e-12)
    assert ctx.getParameters()["scale"] == 0.25
    with pytest.raises(ValueError):
        ctx.setParameter("nope", 1.0)


def test_custom_forces_in_vmapped_ensemble():
    # the MIGRATING.md guidance for lambda sweeps: custom-force systems
    # replicate through the vmapped ReplicaEnsemble unchanged
    s = _small_system(4)
    s.addParticle(0.4)
    drude = dn.DrudeForce()
    drude.addParticle(4, 0, -1, -1, -1, 0.3, 0.001, 1, 1)
    s.addForce(drude)
    cb = CustomBondForce("D*(1-exp(-aa*(r-r0)))^2")
    cb.addPerBondParameter("D")
    cb.addPerBondParameter("aa")
    cb.addPerBondParameter("r0")
    for ij in ((0, 1), (1, 2), (2, 3)):
        cb.addBond(*ij, [100.0, 15.0, 0.15])
    cn = CustomNonbondedForce("c1*c2/r^6")
    cn.addPerParticleParameter("c")
    for _ in range(5):
        cn.addParticle([0.001])
    for ij in ((0, 1), (1, 2), (2, 3), (0, 4)):
        cn.addExclusion(*ij)
    s.addForce(cb)
    s.addForce(cn)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.0005, 5, 1)
    ctx = dn.Context(s, integ, precision="double", strategy="dense")
    ctx.setPositions([[0, 0, 0], [0.15, 0, 0], [0.2, 0.14, 0],
                      [0.35, 0.15, 0.04], [0.001, 0.001, 0]])
    ens = dn.ReplicaEnsemble(ctx, n_replicas=3, seed=11)
    ens.setVelocitiesToTemperature(300.0)
    ens.step(50)
    ke = np.asarray(ens.kinetic_energies())
    assert ke.shape == (3,) and np.all(np.isfinite(ke))
    # replicas got distinct velocity draws -> distinct trajectories
    pos = np.asarray(ens.state.positions)
    assert not np.allclose(pos[0], pos[1])


def test_custom_external_harmonic_restraint():
    # E = 0.5*k*((x-x0)^2+(y-y0)^2+(z-z0)^2) per tagged particle —
    # the canonical OpenMM positional restraint
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    s = _small_system(4)
    ce = CustomExternalForce("0.5*kk*((x-x0)^2+(y-y0)^2+(z-z0)^2)")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    ce.addParticle(1, [100.0, 0.5, 0.6, 0.7])
    ce.addParticle(3, [50.0, 1.0, 1.0, 1.0])
    assert ce.getNumParticles() == 2
    assert not ce.usesPeriodicBoundaryConditions()
    rng = np.random.default_rng(7)
    pos = rng.uniform(0.2, 1.4, (4, 3))
    fn, params, pj, box = _energy(ce, s, pos)
    expected = (0.5 * 100.0 * np.sum((pos[1] - [0.5, 0.6, 0.7]) ** 2)
                + 0.5 * 50.0 * np.sum((pos[3] - 1.0) ** 2))
    np.testing.assert_allclose(float(fn(params, pj, box)), expected,
                               rtol=1e-12)
    g = jax.grad(lambda p: fn(params, p, box))(pj)
    np.testing.assert_allclose(np.asarray(-g),
                               _fd_forces(fn, params, pos, box),
                               rtol=2e-5, atol=1e-7)
    # untagged particles feel nothing
    assert np.allclose(np.asarray(g)[[0, 2]], 0.0)


def test_custom_external_periodicdistance():
    # periodicdistance() applies minimum-image convention: a particle
    # restrained to a site across the periodic boundary pulls the short
    # way round
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    s = _small_system(2)     # 4 nm box
    ce = CustomExternalForce(
        "0.5*kk*periodicdistance(x, y, z, x0, y0, z0)^2")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    ce.addParticle(0, [200.0, 3.9, 0.1, 2.0])   # site near the far face
    assert ce.usesPeriodicBoundaryConditions()
    pos = np.array([[0.05, 3.95, 2.0], [1.0, 1.0, 1.0]])
    fn, params, pj, box = _energy(ce, s, pos)
    # minimum-image delta: (0.05-3.9, 3.95-0.1, 0) -> (+0.15, -0.15, 0)
    d2 = 0.15 ** 2 + 0.15 ** 2
    np.testing.assert_allclose(float(fn(params, pj, box)),
                               0.5 * 200.0 * d2, rtol=1e-12)
    g = jax.grad(lambda p: fn(params, p, box))(pj)
    np.testing.assert_allclose(np.asarray(-g),
                               _fd_forces(fn, params, pos, box),
                               rtol=2e-5, atol=1e-7)


def test_custom_external_periodicdistance_triclinic():
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    from openmm_drudenose_tpu.forces import boxutils
    s = dn.System()
    for _ in range(2):
        s.addParticle(16.0)
    s.setDefaultPeriodicBoxVectors([4.0, 0, 0], [1.0, 4.0, 0],
                                   [0.5, 0.8, 4.0])
    ce = CustomExternalForce(
        "0.5*kk*periodicdistance(x, y, z, x0, y0, z0)^2")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    # NOTE: keep the minimum-image delta away from the half-box tie
    # (|d| = L/2): the image choice is degenerate there and the energy
    # has a genuine kink where finite differences cannot match autodiff
    ce.addParticle(1, [120.0, 3.8, 3.9, 3.7])
    pos = np.array([[1.0, 1.0, 1.0], [0.35, 0.2, 0.1]])
    fn, params, pj, box = _energy(ce, s, pos)
    delta = jnp.asarray(pos[1] - np.array([3.8, 3.9, 3.7]), F64)
    d_mi = boxutils.min_image(delta, jnp.asarray(
        s.getDefaultPeriodicBoxVectors(), F64))
    expected = 0.5 * 120.0 * float(jnp.sum(d_mi * d_mi))
    np.testing.assert_allclose(float(fn(params, pj, box)), expected,
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(-jax.grad(lambda p: fn(params, p, box))(pj)),
        _fd_forces(fn, params, pos, box), rtol=2e-5, atol=1e-7)


def test_custom_external_in_context_dynamics():
    # a stiff positional restraint through the full jitted step keeps the
    # tagged atom near its site while untagged atoms drift
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    s = dn.System()
    for _ in range(2):
        s.addParticle(12.0)
    s.addParticle(0.4)
    drude = dn.DrudeForce()
    drude.addParticle(2, 0, -1, -1, -1, 0.3, 0.001, 1, 1)
    s.addForce(drude)
    s.setDefaultPeriodicBoxVectors([3.0, 0, 0], [0, 3.0, 0], [0, 0, 3.0])
    ce = CustomExternalForce("0.5*kk*((x-x0)^2+(y-y0)^2+(z-z0)^2)")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    anchor = np.array([1.0, 1.0, 1.0])
    ce.addParticle(0, [50000.0, *anchor])
    s.addForce(ce)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.0005, 1, 1)
    ctx = dn.Context(s, integ, precision="double", strategy="dense")
    ctx.setPositions(np.array([[1.0, 1.0, 1.0], [1.5, 1.0, 1.0],
                               [1.001, 1.0, 1.0]]))
    ctx.setVelocitiesToTemperature(300.0, seed=3)
    integ.step(300)
    p = ctx.getState(getPositions=True).getPositions()
    assert np.all(np.isfinite(p))
    # restrained atom: RMS thermal displacement sqrt(3kT/k) ~ 0.012 nm
    assert np.linalg.norm(p[0] - anchor) < 0.1
    # its Drude partner follows the parent, not the anchor spring
    assert np.linalg.norm(p[2] - p[0]) < 0.05


def test_custom_external_xml_round_trip():
    from openmm_drudenose_tpu.app.serialization import (deserialize_system,
                                                        serialize_system)
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    s = _small_system(3)
    ce = CustomExternalForce(
        "0.5*kk*periodicdistance(x, y, z, x0, y0, z0)^2")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    ce.addGlobalParameter("lam", 0.75)
    ce.setEnergyFunction(
        "lam*0.5*kk*periodicdistance(x, y, z, x0, y0, z0)^2")
    ce.addParticle(0, [100.0, 0.5, 0.5, 0.5])
    ce.addParticle(2, [80.0, 3.9, 0.2, 1.0])
    s.addForce(ce)
    s2 = deserialize_system(serialize_system(s))
    f2 = next(f for f in s2.getForces()
              if isinstance(f, CustomExternalForce))
    assert f2.getNumParticles() == 2
    assert f2.getParticleParameters(1) == (2, (80.0, 3.9, 0.2, 1.0))
    pos = np.array([[0.1, 3.8, 0.9], [1, 1, 1], [0.2, 0.4, 0.8]])
    fn1, p1 = s.getForces()[-1].compile(s, F64)
    fn2, p2 = f2.compile(s2, F64)
    box = jnp.eye(3, dtype=F64) * 4.0
    pj = jnp.asarray(pos, F64)
    np.testing.assert_allclose(float(fn2(p2, pj, box)),
                               float(fn1(p1, pj, box)), rtol=1e-12)


def test_custom_external_in_flat_ensemble():
    # per-particle restraints replicate with index offsets through the
    # flattened ensemble; each replica's restraint references its own copy
    from openmm_drudenose_tpu.forces.custom import CustomExternalForce
    from openmm_drudenose_tpu.parallel.flatrep import _replicate_force
    s = _small_system(4)
    ce = CustomExternalForce("0.5*kk*((x-x0)^2+(y-y0)^2+(z-z0)^2)")
    for nm in ("kk", "x0", "y0", "z0"):
        ce.addPerParticleParameter(nm)
    ce.addParticle(1, [100.0, 0.5, 0.6, 0.7])
    ce.addParticle(3, [50.0, 1.0, 1.0, 1.0])
    g = _replicate_force(ce, R=3, n0=4)
    assert g.getNumParticles() == 6
    assert g.getParticleParameters(2) == (5, (100.0, 0.5, 0.6, 0.7))
    assert g.getParticleParameters(5) == (11, (50.0, 1.0, 1.0, 1.0))
