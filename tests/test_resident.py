"""State-resident domain decomposition (parallel/resident.py) on the
virtual CPU devices from conftest: the molecule-sharded trajectory must
match the single-device trajectory to reduction-order rounding, and a
migration/rebuild must be a pure relabeling of the state."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.parallel import resident

from util import swm4_water_box


def _context(method=dn.NonbondedForce.PME):
    system, positions = swm4_water_box(grid_size=6, cutoff=0.7,
                                       add_cm_motion=False)
    system.getForce(0).setNonbondedMethod(method)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    ctx._ensure_forces()
    return ctx


def _mesh(n=2):
    devices = jax.devices()
    assert len(devices) >= n, "conftest must force 8 virtual devices"
    return Mesh(np.array(devices[:n]), ("atom",))


@pytest.mark.parametrize("method", [
    pytest.param(dn.NonbondedForce.PME, marks=pytest.mark.slow),
    dn.NonbondedForce.CutoffPeriodic])
def test_resident_trajectory_matches_single(method):
    """2 rebuild segments of resident stepping == plain stepping."""
    ctx_plain = _context(method)
    ctx_plain.getIntegrator().step(16)
    ref_pos = ctx_plain.getPositions()
    ref_eta = np.asarray(ctx_plain._state.eta)

    ctx = _context(method)
    rctx = resident.ResidentContext(ctx, _mesh(2))
    rctx._rebuild_interval = 8
    rctx.step(16)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rctx.state["eta"]), ref_eta,
                               atol=1e-11)


def test_resident_migration_relabels_only():
    """A rebuild (migration + local re-sort) must not change the gathered
    physical state, even when every molecule's anchor is artificially
    pushed toward the slab boundary."""
    ctx = _context()
    rctx = resident.ResidentContext(ctx, _mesh(2), Rc=200, Ec=96)
    with rctx._mesh:
        st0 = rctx._get_reb()(rctx._st)
    rctx._st = st0
    p0 = rctx.positions()
    v0 = rctx.velocities()
    n0 = np.asarray(st0["n_mol"]).copy()

    # shift all positions by half a slab in x: many anchors change owner
    box_x = float(np.diagonal(np.asarray(ctx._state.box))[0])
    shift = np.zeros(3)
    shift[0] = box_x / 4  # ~2.5 cell planes
    rctx._st = dict(rctx._st)
    rctx._st["pos"] = rctx._st["pos"] + shift
    with rctx._mesh:
        st1 = rctx._get_reb()(rctx._st)
    rctx._st = st1
    assert not bool(np.any(np.asarray(st1["mig_overflow"])))
    n1 = np.asarray(st1["n_mol"])
    assert n1.sum() == n0.sum()
    assert not np.array_equal(n1, n0), "shift should move molecules"
    np.testing.assert_allclose(rctx.positions(), p0 + shift, atol=1e-12)
    np.testing.assert_allclose(rctx.velocities(), v0, atol=1e-12)


@pytest.mark.slow
def test_resident_four_devices():
    """Resident stepping over 4 slabs (needs a wider box) matches plain."""
    system, positions = swm4_water_box(grid_size=10, cutoff=0.7,
                                       add_cm_motion=False)
    system.getForce(0).setNonbondedMethod(dn.NonbondedForce.PME)

    def build():
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair")
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-6)
        ctx.setVelocitiesToTemperature(200.0, seed=0)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    ctx_plain.getIntegrator().step(8)
    ref_pos = ctx_plain.getPositions()

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(4))
    rctx.step(8)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)


@pytest.mark.slow
def test_resident_eight_devices():
    """Resident stepping over ALL 8 virtual devices: an elongated
    (8, 1, 1) box supplies 40 x cell planes (5/slab >= the w+2 halo), so
    the full-mesh decomposition the driver dryrun exercises is also
    trajectory-pinned here (VERDICT round-2 item 5)."""
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(
        216, method=dn.NonbondedForce.PME, cutoff=0.7,
        add_cm_motion=False, density=3.375, shape=(8, 1, 1))

    def build():
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair",
                         nb_options={"grid_x_multiple": 8})
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-6)
        ctx.setVelocitiesToTemperature(200.0, seed=0)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    ctx_plain.getIntegrator().step(8)
    ref_pos = ctx_plain.getPositions()

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(8))
    assert rctx._layout.n_dev == 8
    rctx.step(8)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)


@pytest.mark.slow
def test_resident_barostat_matches_single():
    """MC barostat (NPT) through the resident engine: box moves, COM
    scaling, adaptive schedule and RNG all match plain stepping (the
    replicated key makes every device draw identical MC decisions)."""
    def build():
        system, positions = swm4_water_box(grid_size=6, cutoff=0.7,
                                           add_cm_motion=False)
        system.getForce(0).setNonbondedMethod(dn.NonbondedForce.PME)
        system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 4))
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair")
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-6)
        ctx.setVelocitiesToTemperature(200.0, seed=0)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    ctx_plain.getIntegrator().step(12)
    ref_pos = ctx_plain.getPositions()
    ref_box = np.asarray(ctx_plain._state.box)
    assert int(ctx_plain._state.baro_nattempt) + int(
        ctx_plain._state.baro_naccept) > 0  # at least one MC attempt fired

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(2))
    rctx._rebuild_interval = 6
    rctx.step(12)
    np.testing.assert_allclose(np.asarray(rctx.state["box"]), ref_box,
                               rtol=1e-12)
    assert (int(np.asarray(rctx.state["baro_nt"]))
            == int(ctx_plain._state.baro_nattempt))
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)


@pytest.mark.slow
def test_resident_shake_matches_single():
    """General (non-triangle) constraint clusters through the resident
    engine: SHAKE rows flow through the per-TYPE templates; pad rows
    reference the already-satisfied dummy pair."""
    def build():
        system, positions = swm4_water_box(grid_size=6, cutoff=0.7,
                                           add_cm_motion=False,
                                           rigid_hh=False)
        system.getForce(0).setNonbondedMethod(dn.NonbondedForce.PME)
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair")
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-6)
        ctx.setVelocitiesToTemperature(200.0, seed=0)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    assert ctx_plain._static.n_shake > 0 and ctx_plain._static.n_settle == 0
    ctx_plain.getIntegrator().step(8)
    ref_pos = ctx_plain.getPositions()

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(2))
    rctx.step(8)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)


@pytest.mark.slow
def test_resident_bonded_multigroup():
    """Bonded terms (bonds + angles) + 4 baths (cation/anion/COM/Drude)
    + RF nonbonded through the resident engine == plain stepping."""
    from openmm_drudenose_tpu.io import ionic_liquid

    system, positions, cations, anions = ionic_liquid.build_ionic_liquid(
        n_pairs=140, density=0.5, method=dn.NonbondedForce.CutoffPeriodic,
        cutoff=1.2, add_cm_motion=False)

    def build():
        integ = ionic_liquid.make_tgnh_integrator(
            cations, anions, system.getNumParticles(), temperature=400.0,
            step_size=0.0005)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair")
        ctx.setPositions(positions)
        ctx.setVelocitiesToTemperature(300.0, seed=3)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    ctx_plain.getIntegrator().step(8)
    ref_pos = ctx_plain.getPositions()

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(2))
    rctx.step(8)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)


@pytest.mark.slow
def test_resident_nbthole_matches_single():
    """NBTHOLE (cross-molecule ion screening) through the resident
    engine's class-tagged dense fold-in == the single-device explicit
    pair list.  The builder lists every cross-molecule ion pair (the
    type-complete structure CHARMM NBTHOLE implies), which
    _analyze_nbthole re-derives as (class, w) site tags."""
    from openmm_drudenose_tpu.forces.drude import DrudeForce
    from openmm_drudenose_tpu.units import ONE_4PI_EPS0

    ION = {"NA": (1.0, 0.2430, 0.546, 0.000157, 0.4, 22.59),
           "CL": (-1.0, 0.4612, 0.301, 0.003969, 0.4, 35.05)}

    def build():
        system, positions = swm4_water_box(grid_size=6, cutoff=0.7,
                                           add_cm_motion=False)
        nb = system.getForce(0)
        df = next(f for f in system.getForces()
                  if isinstance(f, DrudeForce))
        # 6 ions in interstitial lattice holes, spread across x so both
        # slabs own some
        spacing = 0.6
        holes = [(0, 0, 0), (1, 2, 3), (2, 4, 1),
                 (3, 1, 4), (4, 3, 2), (4, 0, 0)]
        kinds = ["NA", "CL", "NA", "CL", "NA", "CL"]
        pos_list = [positions]
        ions = []
        for (i, j, k), kind in zip(holes, kinds):
            q, sigma, eps, alpha, d_mass, mass = ION[kind]
            q_d = -np.sqrt(alpha * 100000 * 4.184 / ONE_4PI_EPS0)
            start = system.addParticle(mass - d_mass)
            system.addParticle(d_mass)
            nb.addParticle(q - q_d, sigma, eps)
            nb.addParticle(q_d, 1.0, 0.0)
            nb.addException(start, start + 1, 0, 1, 0)
            ions.append((df.addParticle(start + 1, start, -1, -1, -1,
                                        q_d, alpha, 1, 1), kind))
            center = (np.array([i, j, k]) + 0.5) * spacing
            pos_list.append(np.array([center, center]))
        thole = {("NA", "NA"): 1.0, ("CL", "CL"): 1.2,
                 ("NA", "CL"): 0.8, ("CL", "NA"): 0.8}
        for a in range(len(ions)):
            for b in range(a + 1, len(ions)):
                pa, ka = ions[a]
                pb, kb = ions[b]
                df.addNBTholePair(pa, pb, thole[(ka, kb)])
        positions = np.concatenate(pos_list, axis=0)
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy="cellpair")
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-6)
        ctx.setVelocitiesToTemperature(200.0, seed=5)
        ctx._ensure_forces()
        return ctx

    ctx_plain = build()
    ctx_plain.getIntegrator().step(8)
    ref_pos = ctx_plain.getPositions()

    ctx = build()
    rctx = resident.ResidentContext(ctx, _mesh(2))
    assert rctx._layout.nt_cap > 0
    rctx.step(8)
    np.testing.assert_allclose(rctx.positions(), ref_pos, atol=1e-9)
