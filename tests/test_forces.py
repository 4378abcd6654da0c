"""Force/energy consistency tests.

Forces come from autodiff of the energy, so the key risks are the energy
expressions themselves: checked by finite differences, and PME against a
brute-force Ewald sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.constraints.vsites import apply_vsites
from openmm_drudenose_tpu.core import spec as spec_mod
from openmm_drudenose_tpu.units import ONE_4PI_EPS0

from util import ion_pair_pme_box, swm4_water_box


def _energy_fn(system, strategy="auto"):
    terms = []
    for f in system.getForces():
        if hasattr(f, "compile"):
            fn, params = f.compile(system, jnp.float64)
            if fn is not None:
                terms.append((fn, params))
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))

    def energy(pos):
        return sum(fn(params, pos, box) for fn, params in terms)
    return energy


def _check_finite_diff(energy, pos, h=1e-6, atol=1e-4, skip=()):
    grad = jax.grad(energy)(pos)
    rng = np.random.default_rng(0)
    for _ in range(6):
        i = int(rng.integers(pos.shape[0]))
        if i in skip:
            continue
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dp = jnp.zeros_like(pos).at[i].set(jnp.asarray(d * h))
        num = (energy(pos + dp) - energy(pos - dp)) / (2 * h)
        ana = jnp.sum(grad[i] * jnp.asarray(d))
        np.testing.assert_allclose(float(num), float(ana),
                                   rtol=2e-4, atol=atol)


def test_drude_spring_finite_diff():
    system = dn.System()
    system.addParticle(1.0)
    system.addParticle(0.1)
    drude = dn.DrudeForce()
    drude.addParticle(1, 0, -1, -1, -1, 0.3, 0.001, 1, 1)
    system.addForce(drude)
    energy = _energy_fn(system)
    pos = jnp.asarray(np.array([[0.0, 0, 0], [0.004, -0.003, 0.002]]))
    _check_finite_diff(energy, pos)
    # analytic check: k = q^2 ONE_4PI_EPS0 / alpha, E = 0.5 k r^2
    k = ONE_4PI_EPS0 * 0.3**2 / 0.001
    r2 = float(jnp.sum((pos[1] - pos[0]) ** 2))
    np.testing.assert_allclose(float(energy(pos)), 0.5 * k * r2, rtol=1e-12)


def test_anisotropic_drude_spring_finite_diff():
    system = dn.System()
    for m in (16.0, 0.4, 1.0, 1.0, 12.0):
        system.addParticle(m)
    drude = dn.DrudeForce()
    drude.addParticle(1, 0, 2, 3, 4, 0.5, 0.0015, 0.8, 1.1)
    system.addForce(drude)
    energy = _energy_fn(system)
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.normal(0, 0.2, (5, 3)))
    _check_finite_diff(energy, pos)


def test_thole_screened_pair():
    system = dn.System()
    for m in (16.0, 0.4, 16.0, 0.4):
        system.addParticle(m)
    drude = dn.DrudeForce()
    drude.addParticle(1, 0, -1, -1, -1, -1.0, 0.001, 1, 1)
    drude.addParticle(3, 2, -1, -1, -1, -1.2, 0.0012, 1, 1)
    drude.addScreenedPair(0, 1, 2.6)
    system.addForce(drude)
    energy = _energy_fn(system)
    pos = jnp.asarray(np.array([[0.0, 0, 0], [0.01, 0, 0],
                                [0.4, 0.05, 0], [0.41, 0.04, 0.01]]))
    _check_finite_diff(energy, pos)
    # hand evaluation of the 4-site screened sum
    def s(u):
        return 1 - (1 + u / 2) * np.exp(-u)
    scale = 2.6 / (0.001 * 0.0012) ** (1 / 6)
    qq = ONE_4PI_EPS0 * (-1.0) * (-1.2)
    p = np.asarray(pos)
    expected = 0.0
    for (a, b, sign) in ((1, 3, 1), (1, 2, -1), (0, 3, -1), (0, 2, 1)):
        r = np.linalg.norm(p[a] - p[b])
        expected += sign * qq * s(scale * r) / r
    # plus the two isotropic springs
    for (d, c, q, al) in ((1, 0, -1.0, 0.001), (3, 2, -1.2, 0.0012)):
        k = ONE_4PI_EPS0 * q * q / al
        expected += 0.5 * k * np.sum((p[d] - p[c]) ** 2)
    np.testing.assert_allclose(float(energy(pos)), expected, rtol=1e-9)


def test_nonbonded_nocutoff_matches_hand():
    system = dn.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    nb = dn.NonbondedForce()
    nb.addParticle(0.5, 0.3, 0.8)
    nb.addParticle(-0.4, 0.25, 0.6)
    system.addForce(nb)
    drude = dn.DrudeForce()  # required by spec, not by the energy test
    system.addForce(drude)
    energy = _energy_fn(system)
    pos = jnp.asarray(np.array([[0.0, 0, 0], [0.31, 0.02, -0.01]]))
    r = float(np.linalg.norm(np.asarray(pos[1] - pos[0])))
    sig = 0.5 * (0.3 + 0.25)
    eps = np.sqrt(0.8 * 0.6)
    expected = (4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
                + ONE_4PI_EPS0 * 0.5 * (-0.4) / r)
    np.testing.assert_allclose(float(energy(pos)), expected, rtol=1e-9)
    _check_finite_diff(energy, pos)


def test_water_box_finite_diff():
    system, positions = swm4_water_box(grid_size=2)
    energy = _energy_fn(system)
    # perturb off the lattice, then compose virtual sites
    rng = np.random.default_rng(1)
    pos = positions + rng.normal(0, 0.01, positions.shape)
    integ = dn.DrudeTGNHIntegrator(300, 0.1, 1, 0.005, 0.0005)
    spec, static, _ = spec_mod.build_spec(system, integ, jnp.float64,
                                          jnp.float64)
    pos = apply_vsites(spec, static, jnp.asarray(pos))
    vsite_rows = set(np.asarray(spec.vs_avg_idx).tolist())

    def energy_composed(p):
        return energy(apply_vsites(spec, static, p))
    _check_finite_diff(energy_composed, pos, skip=vsite_rows)
    # vsites must carry zero force after composition
    grad = jax.grad(energy_composed)(pos)
    np.testing.assert_allclose(
        np.asarray(grad)[np.asarray(spec.vs_avg_idx)], 0.0, atol=1e-12)


def brute_force_ewald(charges, pos, box, alpha, kmax=14):
    """O(N^2 kmax^3) Ewald reference."""
    from scipy.special import erfc as serfc
    n = len(charges)
    L = np.diagonal(box)
    # real space over images
    e_real = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = pos[i] - pos[j]
            d -= L * np.round(d / L)
            for sx in (-1, 0, 1):
                for sy in (-1, 0, 1):
                    for sz in (-1, 0, 1):
                        r = np.linalg.norm(d + np.array([sx, sy, sz]) * L)
                        e_real += charges[i] * charges[j] * serfc(alpha * r) / r
    # reciprocal
    vol = np.prod(L)
    e_rec = 0.0
    for mx in range(-kmax, kmax + 1):
        for my in range(-kmax, kmax + 1):
            for mz in range(-kmax, kmax + 1):
                if mx == my == mz == 0:
                    continue
                m = np.array([mx, my, mz]) / L
                m2 = m @ m
                s = np.sum(charges * np.exp(2j * np.pi * pos @ m))
                e_rec += np.exp(-np.pi**2 * m2 / alpha**2) / m2 * np.abs(s)**2
    e_rec /= 2 * np.pi * vol
    e_self = -alpha / np.sqrt(np.pi) * np.sum(charges**2)
    return ONE_4PI_EPS0 * (e_real + e_rec + e_self)


def test_pme_matches_brute_ewald():
    from openmm_drudenose_tpu.forces import pme as pme_mod
    rng = np.random.default_rng(7)
    n = 12
    L = 2.0
    box = np.eye(3) * L
    pos = rng.uniform(0, L, (n, 3))
    charges = rng.normal(0, 0.5, n)
    charges -= charges.mean()  # neutral

    system = dn.System()
    nb = dn.NonbondedForce()
    for i in range(n):
        system.addParticle(1.0)
        nb.addParticle(charges[i], 0.3, 0.0)
    nb.setNonbondedMethod(dn.NonbondedForce.PME)
    nb.setCutoffDistance(0.9)
    nb.setEwaldErrorTolerance(1e-6)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))
    fn, params = nb.compile(system, jnp.float64)
    e = float(fn(params, jnp.asarray(pos), jnp.asarray(box)))

    alpha = pme_mod.choose_alpha(0.9, 1e-6)
    expected = brute_force_ewald(charges, pos, box, alpha)
    np.testing.assert_allclose(e, expected, rtol=2e-5, atol=2e-5)


def test_reaction_field_cutoff_continuity():
    """RF Coulomb energy goes smoothly to ~0 at the cutoff."""
    system = dn.System()
    nb = dn.NonbondedForce()
    system.addParticle(1.0)
    system.addParticle(1.0)
    nb.addParticle(1.0, 0.3, 0.0)
    nb.addParticle(-1.0, 0.3, 0.0)
    nb.setNonbondedMethod(dn.NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(1.0)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors((5, 0, 0), (0, 5, 0), (0, 0, 5))
    fn, params = nb.compile(system, jnp.float64)
    box = jnp.eye(3) * 5.0

    def e_at(r):
        pos = jnp.asarray(np.array([[0.0, 0, 0], [r, 0, 0]]))
        return float(fn(params, pos, box))
    e_in = e_at(0.999)
    e_out = e_at(1.001)
    assert e_out == 0.0
    assert abs(e_in) < 0.5  # RF brings the energy near zero at the cutoff


def test_bonded_terms_finite_diff():
    system = dn.System()
    for m in (12.0, 12.0, 12.0, 12.0, 1.0):
        system.addParticle(m)
    bonds = dn.HarmonicBondForce()
    bonds.addBond(0, 1, 0.15, 30000.0)
    angles = dn.HarmonicAngleForce()
    angles.addAngle(0, 1, 2, np.deg2rad(109.5), 400.0)
    torsions = dn.PeriodicTorsionForce()
    torsions.addTorsion(0, 1, 2, 3, 3, np.deg2rad(30.0), 8.0)
    drude = dn.DrudeForce()
    drude.addParticle(4, 0, -1, -1, -1, 0.5, 0.001, 1, 1)
    for f in (bonds, angles, torsions, drude):
        system.addForce(f)
    energy = _energy_fn(system)
    rng = np.random.default_rng(12)
    pos = jnp.asarray(np.array([
        [0.0, 0, 0], [0.15, 0.01, 0], [0.2, 0.14, 0.01],
        [0.31, 0.18, 0.12], [0.005, -0.004, 0.003]]) +
        rng.normal(0, 0.004, (5, 3)))
    _check_finite_diff(energy, pos)
    # hand-check the bond term
    r = float(jnp.linalg.norm(pos[1] - pos[0]))
    e_bond = 0.5 * 30000.0 * (r - 0.15) ** 2
    v1 = np.asarray(pos[0] - pos[1]); v2 = np.asarray(pos[2] - pos[1])
    th = np.arccos(v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2))
    e_angle = 0.5 * 400.0 * (th - np.deg2rad(109.5)) ** 2
    b1 = np.asarray(pos[1] - pos[0]); b2 = np.asarray(pos[2] - pos[1])
    b3 = np.asarray(pos[3] - pos[2])
    c1 = np.cross(b1, b2); c2 = np.cross(b2, b3)
    phi = np.arctan2(np.cross(c1, b2 / np.linalg.norm(b2)) @ c2, c1 @ c2)
    e_tor = 8.0 * (1 + np.cos(3 * phi - np.deg2rad(30.0)))
    k3 = dn.ONE_4PI_EPS0 * 0.25 / 0.001
    e_spring = 0.5 * k3 * float(jnp.sum((pos[4] - pos[0]) ** 2))
    np.testing.assert_allclose(float(energy(pos)),
                               e_bond + e_angle + e_tor + e_spring,
                               rtol=1e-9)
