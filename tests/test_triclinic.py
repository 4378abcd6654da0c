"""Triclinic periodic boxes (forces/boxutils.py): reduced-form minimum
imaging, general-lattice PME, and the dense-strategy end-to-end path.

The reference runs on OpenMM's substrate, which supports triclinic cells
in NonbondedForce/PME (SURVEY.md layer map); this engine supports them
through the dense all-pairs strategy + the generic PME path (VERDICT
round-2 item 9).  Oracles: brute-force image sums and an O(N^2 k^3)
triclinic Ewald reference, both pure numpy f64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import boxutils
from openmm_drudenose_tpu.units import ONE_4PI_EPS0

# a well-sheared reduced cell: a=(2,0,0), b=(0.7,1.9,0), c=(-0.5,0.6,2.1)
TRI_BOX = np.array([[2.0, 0.0, 0.0],
                    [0.7, 1.9, 0.0],
                    [-0.5, 0.6, 2.1]])


def test_reduce_box():
    # a skewed-but-equivalent cell reduces to canonical form
    skewed = TRI_BOX.copy()
    skewed[2] += 3 * skewed[1] - 2 * skewed[0]
    skewed[1] += 2 * skewed[0]
    red = boxutils.reduce_box(skewed)
    np.testing.assert_allclose(red, TRI_BOX, atol=1e-12)
    with pytest.raises(ValueError, match="xy plane"):
        boxutils.reduce_box([[2, 0, 0], [0, 2, 0.3], [0, 0, 2]])


def test_min_image_matches_brute():
    rng = np.random.default_rng(0)
    d = rng.uniform(-6, 6, (200, 3))
    got = np.asarray(boxutils.min_image(jnp.asarray(d),
                                        jnp.asarray(TRI_BOX)))
    got_t = np.asarray(boxutils.min_image_t(jnp.asarray(d.T),
                                            jnp.asarray(TRI_BOX))).T
    shifts = np.array([(i, j, k) for i in range(-3, 4)
                       for j in range(-3, 4) for k in range(-3, 4)])
    images = d[:, None, :] + shifts[None, :, :] @ TRI_BOX
    brute = images[np.arange(len(d)),
                   np.argmin(np.linalg.norm(images, axis=2), axis=1)]
    # the sequential reduction is exact only within the half-width sphere
    # (cutoff validity rule); check there
    w_half = min(np.diag(TRI_BOX)) / 2
    near = np.linalg.norm(brute, axis=1) < w_half
    assert near.sum() > 20
    np.testing.assert_allclose(got[near], brute[near], atol=1e-12)
    np.testing.assert_allclose(got_t[near], brute[near], atol=1e-12)


def test_inv_box_and_volume():
    ib = np.asarray(boxutils.inv_box(jnp.asarray(TRI_BOX)))
    np.testing.assert_allclose(ib, np.linalg.inv(TRI_BOX), atol=1e-12)
    assert float(boxutils.volume(jnp.asarray(TRI_BOX))) == pytest.approx(
        np.linalg.det(TRI_BOX))


def brute_force_ewald_tri(charges, pos, box, alpha, kmax=12, real_images=1):
    """O(N^2 kmax^3) Ewald reference for a general (reduced) cell."""
    from scipy.special import erfc as serfc
    n = len(charges)
    B = np.linalg.inv(box)
    e_real = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = pos[i] - pos[j]
            d = np.asarray(boxutils.min_image(jnp.asarray(d),
                                              jnp.asarray(box)))
            for sx in range(-real_images, real_images + 1):
                for sy in range(-real_images, real_images + 1):
                    for sz in range(-real_images, real_images + 1):
                        r = np.linalg.norm(
                            d + np.array([sx, sy, sz]) @ box)
                        e_real += (charges[i] * charges[j]
                                   * serfc(alpha * r) / r)
    vol = np.linalg.det(box)
    e_rec = 0.0
    for mx in range(-kmax, kmax + 1):
        for my in range(-kmax, kmax + 1):
            for mz in range(-kmax, kmax + 1):
                if mx == my == mz == 0:
                    continue
                mstar = B @ np.array([mx, my, mz], np.float64)
                m2 = mstar @ mstar
                s = np.sum(charges * np.exp(2j * np.pi * pos @ mstar))
                e_rec += (np.exp(-np.pi**2 * m2 / alpha**2) / m2
                          * np.abs(s)**2)
    e_rec /= 2 * np.pi * vol
    e_self = -alpha / np.sqrt(np.pi) * np.sum(charges**2)
    return ONE_4PI_EPS0 * (e_real + e_rec + e_self)


def _charged_system(n, rng, box, method=None, cutoff=0.9):
    pos = rng.uniform(0, 1, (n, 3)) @ box
    charges = rng.normal(0, 0.5, n)
    charges -= charges.mean()
    system = dn.System()
    nb = dn.NonbondedForce()
    for i in range(n):
        system.addParticle(1.0)
        nb.addParticle(charges[i], 0.3, 0.0)
    nb.setNonbondedMethod(method if method is not None
                          else dn.NonbondedForce.PME)
    nb.setCutoffDistance(cutoff)
    nb.setEwaldErrorTolerance(1e-6)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors(*box)
    return system, nb, pos, charges


def test_triclinic_pme_matches_brute_ewald():
    from openmm_drudenose_tpu.forces import pme as pme_mod
    rng = np.random.default_rng(7)
    system, nb, pos, charges = _charged_system(12, rng, TRI_BOX)
    fn, params = nb.compile(system, jnp.float64)
    e = float(fn(params, jnp.asarray(pos), jnp.asarray(TRI_BOX)))

    alpha = pme_mod.choose_alpha(0.9, 1e-6)
    expected = brute_force_ewald_tri(charges, pos, TRI_BOX, alpha)
    np.testing.assert_allclose(e, expected, rtol=2e-5, atol=2e-5)


def test_triclinic_cutoff_validity_raises():
    rng = np.random.default_rng(3)
    system, nb, pos, _ = _charged_system(12, rng, TRI_BOX)
    with pytest.raises(ValueError, match="half the smallest"):
        nb.setCutoffDistance(1.2)
        nb.compile(system, jnp.float64)


def test_triclinic_cellpair_too_small_raises():
    # TRI_BOX at cutoff 0.9 cannot produce a regular grid (>= 2w+1 cells
    # per dim) — the cellpair strategy must refuse with guidance
    rng = np.random.default_rng(3)
    system, nb, pos, _ = _charged_system(12, rng, TRI_BOX)
    with pytest.raises(ValueError, match="regular"):
        nb.compile(system, jnp.float64, strategy="cellpair")


def test_triclinic_cellpair_matches_dense():
    """The triclinic cell-pair sweep (fractional binning + plane-width
    stencil, forces/cellpair.py) against the dense all-pairs oracle:
    energies and forces on a sheared 2x TRI_BOX with LJ + PME charges."""
    from openmm_drudenose_tpu.forces import cellpair
    rng = np.random.default_rng(17)
    box2 = 2.0 * TRI_BOX
    n = 220
    system = dn.System()
    nb = dn.NonbondedForce()
    charges = rng.normal(0, 0.4, n)
    charges -= charges.mean()
    for i in range(n):
        system.addParticle(1.0)
        nb.addParticle(charges[i], 0.25, 0.4)
    # a few exceptions exercise the exclusion window + reciprocal
    # corrections through both strategies
    for i in range(0, 30, 3):
        nb.addException(i, i + 1, 0.1 * charges[i] * charges[i + 1],
                        0.25, 0.1)
        nb.addException(i, i + 2, 0.0, 1.0, 0.0)
    nb.setNonbondedMethod(dn.NonbondedForce.PME)
    nb.setCutoffDistance(0.9)
    nb.setEwaldErrorTolerance(1e-6)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors(*box2)
    pos = rng.uniform(0, 1, (n, 3)) @ box2
    # keep excepted pairs genuinely close (intramolecular-like)
    for i in range(0, 30, 3):
        pos[i + 1] = pos[i] + rng.normal(0, 0.05, 3)
        pos[i + 2] = pos[i] + rng.normal(0, 0.08, 3)
    box_j = jnp.asarray(box2)
    p0 = jnp.asarray(pos)

    fn_d, params_d = nb.compile(system, jnp.float64, strategy="dense")
    e_d, f_d = jax.value_and_grad(lambda p: fn_d(params_d, p, box_j))(p0)
    fn_c, params_c = nb.compile(system, jnp.float64, strategy="cellpair")
    cfg = fn_c.cellpair_cfg
    assert cfg.triclinic and cfg.regular
    nbl = cellpair.build_cellsort(p0, box_j, cfg)
    assert not bool(nbl.overflow) and not bool(nbl.stencil_invalid)
    e_c, f_c = jax.value_and_grad(
        lambda p: fn_c(params_c, p, box_j, nbl))(p0)
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.slow          # end-to-end run; the fast tier keeps the
                           # parity/MC-delta pins (round-5 tier budget)
def test_triclinic_cellpair_water_end_to_end():
    """Sheared 512-molecule SWM4 box through the public API with
    strategy='cellpair': forces match a dense-strategy Context at the
    start, then TGNH dynamics stay finite (exercises neighbor_fn, the
    force-only path, pairterms/PME with the full reduced matrix)."""
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(
        512, method=dn.NonbondedForce.PME, cutoff=0.52)
    L = float(system.getDefaultPeriodicBoxVectors()[0][0])
    tri = np.array([[L, 0, 0], [0.2 * L, L, 0], [0.1 * L, 0.15 * L, L]])
    system.setDefaultPeriodicBoxVectors(*tri)

    def make(strategy):
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy=strategy)
        ctx.setPositions(positions)
        return ctx, integ

    ctx_d, _ = make("dense")
    ctx_c, integ_c = make("cellpair")
    assert ctx_c._cp_cfg is not None and ctx_c._cp_cfg.triclinic
    st_d = ctx_d.getState(forces=True, energy=True)
    st_c = ctx_c.getState(forces=True, energy=True)
    np.testing.assert_allclose(st_c.getPotentialEnergy(),
                               st_d.getPotentialEnergy(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st_c.getForces()),
                               np.asarray(st_d.getForces()),
                               rtol=1e-6, atol=1e-6)
    ctx_c.applyConstraints(1e-6)
    ctx_c.setVelocitiesToTemperature(200.0, seed=0)
    integ_c.step(2 * ctx_c._cp_cfg.rebuild_interval)
    st = ctx_c.getState(positions=True, energy=True)
    assert np.isfinite(st.getPotentialEnergy())
    assert np.all(np.isfinite(np.asarray(st.getPositions())))


def test_triclinic_lj_rf_forces_finite_diff():
    """Min-image geometry through the full dense pair chain (LJ + RF
    coulomb): analytic forces == numerical gradient."""
    rng = np.random.default_rng(11)
    n = 27
    system = dn.System()
    nb = dn.NonbondedForce()
    # jittered fractional lattice: random-uniform points produce close
    # contacts whose steep LJ makes central differences truncation-limited
    # (f''' h^2 error above the tolerance); a lattice keeps pairs >~0.4 nm
    frac = np.stack(np.meshgrid(*[np.arange(3)] * 3),
                    axis=-1).reshape(-1, 3) / 3.0
    frac = frac + rng.uniform(-0.06, 0.06, frac.shape)
    pos = frac @ TRI_BOX
    for i in range(n):
        system.addParticle(1.0)
        nb.addParticle(rng.normal(0, 0.2), 0.3, 0.5)
    nb.setNonbondedMethod(dn.NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(0.9)
    # switch the LJ off smoothly: truncation's energy step at the cutoff
    # breaks finite differencing whenever a pair straddles r = cutoff
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.75)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors(*TRI_BOX)
    fn, params = nb.compile(system, jnp.float64)
    box = jnp.asarray(TRI_BOX)

    def energy(p):
        return fn(params, p, box)

    p0 = jnp.asarray(pos)
    grad = jax.grad(energy)(p0)
    h = 1e-6
    for _ in range(6):
        i = int(rng.integers(n))
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dp = jnp.zeros_like(p0).at[i].set(jnp.asarray(d * h))
        num = (energy(p0 + dp) - energy(p0 - dp)) / (2 * h)
        ana = jnp.sum(grad[i] * jnp.asarray(d))
        np.testing.assert_allclose(float(num), float(ana),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow          # end-to-end run; the fast tier keeps the
                           # parity/MC-delta pins (round-5 tier budget)
def test_triclinic_water_dynamics():
    """End-to-end: SWM4 Drude water in a sheared box through the public
    API (auto -> dense strategy), TGNH steps, finite PE, and the NBTHOLE/
    screened-pair min-image paths compile."""
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(
        125, method=dn.NonbondedForce.PME, cutoff=0.7)
    L = float(system.getDefaultPeriodicBoxVectors()[0][0])
    tri = np.array([[L, 0, 0], [0.2 * L, L, 0], [0.1 * L, 0.15 * L, L]])
    system.setDefaultPeriodicBoxVectors(*tri)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double", strategy="auto")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    e0 = ctx.getState(energy=True).getPotentialEnergy()
    assert np.isfinite(e0)
    integ.step(20)
    st = ctx.getState(positions=True, energy=True)
    assert np.isfinite(st.getPotentialEnergy())
    assert np.all(np.isfinite(np.asarray(st.getPositions())))
    np.testing.assert_allclose(np.asarray(st.getPeriodicBoxVectors()), tri)


def test_triclinic_system_xml_round_trip():
    rng = np.random.default_rng(5)
    system, nb, pos, _ = _charged_system(8, rng, TRI_BOX)
    xml = dn.XmlSerializer.serialize(system)
    system2 = dn.XmlSerializer.deserialize(xml)
    np.testing.assert_allclose(
        np.array(system2.getDefaultPeriodicBoxVectors()), TRI_BOX,
        atol=1e-15)
