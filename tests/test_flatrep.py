"""Flattened replica ensembles: R identical replicas embedded in ONE
extended cell grid (per-replica wrap periods along x and z) so the sweep's
tiles fill the 128-lane axis even when each replica's own (y, z) plane is
tiny.  The embedded sweep must reproduce R independent per-replica sweeps
exactly — replicas share a grid but must never interact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.io import builders
from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble
from openmm_drudenose_tpu.units import ONE_4PI_EPS0


def _lj_system(n0, L, seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, L, (n0, 3))
    q = rng.normal(0, 0.2, n0)
    q -= q.mean()
    sig = rng.uniform(0.2, 0.3, n0)
    eps = rng.uniform(0.1, 0.8, n0)
    return pos, {"charge": jnp.asarray(q), "sigma": jnp.asarray(sig),
                 "eps": jnp.asarray(eps)}


@pytest.mark.parametrize("rx,rz", [
    (2, 2), pytest.param(1, 4, marks=pytest.mark.slow)])
def test_flat_ensemble_sweep_matches_per_replica(rx, rz):
    R = rx * rz
    n0, L, cutoff = 96, 1.6, 0.5
    box = jnp.asarray([L, L, L], jnp.float64)
    peg_args = dict(
        krf=(1 / cutoff**3) * (78.3 - 1) / (2 * 78.3 + 1),
        crf=(1 / cutoff) * 3 * 78.3 / (2 * 78.3 + 1))
    peg = cp.make_pair_eg("rf", cutoff, **peg_args)

    # per-replica reference: R independent sweeps on the template grid
    cfg0 = cp.make_config(cutoff, [L] * 3, n0, [], [], skin=0.1,
                          capacity=16)
    assert cfg0.regular
    es, fs, poss, qs, sigs, epss = [], [], [], [], [], []
    for r in range(R):
        pos, params = _lj_system(n0, L, seed=100 + r)
        cs = cp.build_cellsort(jnp.asarray(pos), box, cfg0)
        assert not bool(cs.overflow)
        e, f = cp.pair_energy_forces(params, jnp.asarray(pos), box, cs,
                                     cfg0, peg, ONE_4PI_EPS0)
        es.append(float(e))
        fs.append(np.asarray(f))
        poss.append(pos)
        qs.append(params["charge"])
        sigs.append(params["sigma"])
        epss.append(params["eps"])

    # flattened: one extended grid, replica-major atoms
    cfg = cp.make_ensemble_config(cutoff, [L] * 3, n0, R, [], [],
                                  rx=rx, rz=rz, skin=0.1, capacity=16)
    assert cfg.n_replicas == R
    assert cfg.phys_grid == tuple(cfg0.grid)
    assert cfg.grid == (rx * cfg0.grid[0], cfg0.grid[1], rz * cfg0.grid[2])
    ext_pos = jnp.asarray(np.concatenate(poss, axis=0))
    ext_params = {"charge": jnp.concatenate(qs),
                  "sigma": jnp.concatenate(sigs),
                  "eps": jnp.concatenate(epss)}
    cs = cp.build_cellsort(ext_pos, box, cfg)
    assert not bool(cs.overflow)
    e_ext, f_ext = cp.pair_energy_forces(ext_params, ext_pos, box, cs,
                                         cfg, peg, ONE_4PI_EPS0)

    np.testing.assert_allclose(float(e_ext), sum(es), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_ext),
                               np.concatenate(fs, axis=0), atol=1e-9)


def test_flat_ensemble_replicas_isolated():
    """Moving every atom of replica 0 must not change replica 1's forces
    (replicas share the extended grid but never interact)."""
    rx, rz, R = 2, 1, 2
    n0, L, cutoff = 96, 1.6, 0.5
    box = jnp.asarray([L, L, L], jnp.float64)
    peg = cp.make_pair_eg("coulomb", cutoff)
    cfg = cp.make_ensemble_config(cutoff, [L] * 3, n0, R, [], [],
                                  rx=rx, rz=rz, skin=0.1, capacity=16)
    pos0, p0 = _lj_system(n0, L, seed=7)
    pos1, p1 = _lj_system(n0, L, seed=8)
    params = {k: jnp.concatenate([p0[k], p1[k]]) for k in p0}

    def forces(pos_a):
        ext = jnp.asarray(np.concatenate([pos_a, pos1], axis=0))
        cs = cp.build_cellsort(ext, box, cfg)
        _, f = cp.pair_energy_forces(params, ext, box, cs, cfg, peg,
                                     ONE_4PI_EPS0)
        return np.asarray(f)

    fa = forces(pos0)
    rng = np.random.default_rng(3)
    fb = forces(np.mod(pos0 + rng.normal(0, 0.05, pos0.shape), L))
    assert np.any(np.abs(fa[:n0] - fb[:n0]) > 1e-6)
    np.testing.assert_allclose(fa[n0:], fb[n0:], atol=1e-12)


# ---------------------------------------------------------------------------
# end to end: FlatReplicaEnsemble == R independent Contexts
# ---------------------------------------------------------------------------

def _template(n_mol=200, cutoff=0.55):
    system, pos = builders.build_water_box(
        n_mol, method=dn.NonbondedForce.PME, cutoff=cutoff)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 2,
                                   False)
    integ.setMaxDrudeDistance(0.02)
    return system, pos, integ


@pytest.mark.slow
def test_flat_ensemble_matches_independent_contexts():
    """Full SWM4 water (PME + Drude + SETTLE + vsites + CM removal): a
    2-replica flattened ensemble must reproduce two independent Contexts
    trajectory-for-trajectory (CPU f64)."""
    R = 2
    nb = {"capacity": 48, "skin": 0.1}
    system, pos, integ = _template()
    n0 = system.getNumParticles()
    rng = np.random.default_rng(11)
    vels = [rng.normal(0, 0.5, (n0, 3)) * 0.0 for _ in range(R)]
    # deterministic distinct velocities per replica, zero on massless sites
    masses = np.array([system.getParticleMass(i) for i in range(n0)])
    for r in range(R):
        v = rng.normal(0, 0.3, (n0, 3))
        v[masses == 0] = 0.0
        vels[r] = v

    # reference: R independent contexts
    ref_pos, ref_ke, ref_gt, ref_pe = [], [], [], []
    for r in range(R):
        s, p, it = _template()
        ctx = dn.Context(s, it, precision="double", strategy="cellpair",
                         nb_options=dict(nb))
        ctx.setPositions(p)
        ctx.setVelocities(vels[r])
        it.step(20)
        st = ctx.getState(positions=True, energy=True, groups=True)
        ref_pos.append(np.asarray(st.getPositions()))
        ref_ke.append(st.getKineticEnergy())
        ref_gt.append(np.asarray(st.getGroupTemperatures()))
        ref_pe.append(st.getPotentialEnergy())

    # flattened ensemble
    tctx = dn.Context(system, integ, precision="double",
                      strategy="cellpair", nb_options=dict(nb))
    tctx.setPositions(pos)
    ens = FlatReplicaEnsemble(tctx, R)
    assert ens.context._static.ensemble_r == R
    ens.context.setVelocities(np.concatenate(vels, axis=0))
    ens.step(20)

    got_pos = ens.positions()
    got_ke = ens.kinetic_energies()
    got_gt = ens.group_temperatures()
    got_pe = ens.potential_energies()
    for r in range(R):
        np.testing.assert_allclose(got_pos[r], ref_pos[r], atol=1e-9)
        np.testing.assert_allclose(got_ke[r], ref_ke[r], rtol=1e-9)
        np.testing.assert_allclose(got_gt[r], ref_gt[r], rtol=1e-8)
        np.testing.assert_allclose(got_pe[r], ref_pe[r], rtol=1e-9)
    # the per-replica decomposition must also sum to the flattened total
    np.testing.assert_allclose(got_pe.sum(), ens.total_potential_energy(),
                               rtol=1e-9)


@pytest.mark.slow
def test_flat_ensemble_padded_layout():
    """rx*rz > R layouts: pad replicas run real physics but are invisible.
    3 requested replicas in a 2x2 = 4-slot embedding must match 3
    independent Contexts, every accessor must return R-shaped arrays, and
    total_potential_energy must exclude the pad."""
    R = 3
    nb = {"capacity": 48, "skin": 0.1}
    system, pos, integ = _template()
    n0 = system.getNumParticles()
    masses = np.array([system.getParticleMass(i) for i in range(n0)])
    rng = np.random.default_rng(23)
    vels = []
    for r in range(R):
        v = rng.normal(0, 0.3, (n0, 3))
        v[masses == 0] = 0.0
        vels.append(v)

    ref_pos, ref_ke, ref_pe = [], [], []
    for r in range(R):
        s, p, it = _template()
        ctx = dn.Context(s, it, precision="double", strategy="cellpair",
                         nb_options=dict(nb))
        ctx.setPositions(p)
        ctx.setVelocities(vels[r])
        it.step(10)
        st = ctx.getState(positions=True, energy=True)
        ref_pos.append(np.asarray(st.getPositions()))
        ref_ke.append(st.getKineticEnergy())
        ref_pe.append(st.getPotentialEnergy())

    tctx = dn.Context(system, integ, precision="double",
                      strategy="cellpair", nb_options=dict(nb))
    tctx.setPositions(pos)
    ens = FlatReplicaEnsemble(tctx, R, rx=2, rz=2)
    assert ens.n_replicas == 3 and ens.n_replicas_padded == 4
    assert ens.context._static.ensemble_r == 4
    ens.setVelocities(np.stack(vels))
    ens.step(10)

    got_pos = ens.positions()
    got_ke = ens.kinetic_energies()
    got_pe = ens.potential_energies()
    assert got_pos.shape == (R, n0, 3)
    assert got_ke.shape == (R,) and got_pe.shape == (R,)
    for r in range(R):
        np.testing.assert_allclose(got_pos[r], ref_pos[r], atol=1e-9)
        np.testing.assert_allclose(got_ke[r], ref_ke[r], rtol=1e-9)
        np.testing.assert_allclose(got_pe[r], ref_pe[r], rtol=1e-9)
    np.testing.assert_allclose(ens.total_potential_energy(), sum(ref_pe),
                               rtol=1e-9)


@pytest.mark.slow
def test_flat_ensemble_two_temp_groups():
    """G=2 user groups exercise apply_vscale_t's masked-sum vs_atom path
    for per-replica (E, G+2) baths: a 2-replica flat ensemble must match
    2 independent Contexts (first 100 molecules group 0, rest group 1)."""
    R = 2
    nb = {"capacity": 48, "skin": 0.1}

    def make():
        system, pos, integ = _template()
        integ.addTempGroup()
        integ.addTempGroup()
        n0 = system.getNumParticles()
        for i in range(n0):
            integ.addParticleTempGroup(0 if i < n0 // 2 else 1)
        return system, pos, integ

    system, pos, integ = make()
    n0 = system.getNumParticles()
    masses = np.array([system.getParticleMass(i) for i in range(n0)])
    rng = np.random.default_rng(31)
    vels = []
    for r in range(R):
        v = rng.normal(0, 0.3, (n0, 3))
        v[masses == 0] = 0.0
        vels.append(v)

    ref_pos, ref_gt = [], []
    for r in range(R):
        s, p, it = make()
        ctx = dn.Context(s, it, precision="double", strategy="cellpair",
                         nb_options=dict(nb))
        ctx.setPositions(p)
        ctx.setVelocities(vels[r])
        it.step(10)
        st = ctx.getState(positions=True, energy=True, groups=True)
        ref_pos.append(np.asarray(st.getPositions()))
        ref_gt.append(np.asarray(st.getGroupTemperatures()))

    tctx = dn.Context(system, integ, precision="double",
                      strategy="cellpair", nb_options=dict(nb))
    tctx.setPositions(pos)
    ens = FlatReplicaEnsemble(tctx, R)
    ens.setVelocities(np.stack(vels))
    ens.step(10)

    got_pos = ens.positions()
    got_gt = ens.group_temperatures()
    assert got_gt.shape == (R, 4)            # G=2 user + COM + Drude
    for r in range(R):
        np.testing.assert_allclose(got_pos[r], ref_pos[r], atol=1e-9)
        np.testing.assert_allclose(got_gt[r], ref_gt[r], rtol=1e-8)


def test_flat_auto_layout_engages_pallas_with_low_padding():
    """The auto layout must pick a Pallas-ENGAGED layout (the XLA fallback
    measured 2.5x slower on the sweep) with near-minimal padded lane slots.
    The session-9 failure mode this pins: a pure lane-fill objective picks
    rz large enough for zero padding but blows the kernel's VMEM gate
    (ops/pallas_sweep.supports), silently landing on the slow XLA sweep."""
    import dataclasses

    import jax.numpy as jnp

    from openmm_drudenose_tpu.ops import pallas_sweep as ps

    system, pos, integ = _template()
    tctx = dn.Context(system, integ, precision="double",
                      strategy="cellpair",
                      nb_options={"capacity": 48, "skin": 0.1})
    tctx.setPositions(pos)
    box = np.diagonal(np.array(system.getDefaultPeriodicBoxVectors()))
    r_list = 0.55 + 0.1
    pg = [max(int(np.floor(L / (r_list / 2))), 1) for L in box]
    n_yz0 = pg[1] * pg[2]
    rx, rz = FlatReplicaEnsemble._auto_layout(tctx, 64, None)
    assert rx * rz >= 64
    assert rx * rz <= 80                     # <= 1.25x replica padding cap

    def engaged(rz_c):
        """supports() verdict for an rz_c-fold embedded grid, via the real
        gate on a config with the ensemble's extended plane."""
        cfg = tctx._cp_cfg
        gx, gy, gz = cfg.grid
        big = dataclasses.replace(
            cfg, grid=(gx, gy, gz * rz_c),
            x_period=getattr(cfg, "x_period", 0) or gx, z_period=gz)
        return ps.supports(big, jnp.float32)

    assert engaged(rz), (rx, rz)
    # near-minimal padded lane slots among engaged candidates
    def slots(rz_c):
        return -(-64 // rz_c) * (-(-n_yz0 * rz_c // 128) * 128)
    best_engaged = min(slots(rz_c) for rz_c in range(1, 65)
                       if engaged(rz_c) and -(-64 // rz_c) * rz_c <= 80)
    assert slots(rz) <= 1.05 * best_engaged, (rx, rz, slots(rz), best_engaged)


@pytest.mark.slow
def test_pallas_sweep_ensemble_interpret():
    """The Pallas kernel's per-band layer wrap / z-period wrap must match
    the XLA ensemble sweep (interpret mode, f32)."""
    from openmm_drudenose_tpu.ops import pallas_sweep as ps
    rx, rz = 2, 4
    R = rx * rz
    n0, L, cutoff = 96, 1.6, 0.5
    box = jnp.asarray([L, L, L], jnp.float32)
    peg = cp.make_pair_eg("rf", cutoff, krf=0.3, crf=1.1)
    cfg = cp.make_ensemble_config(cutoff, [L] * 3, n0, R, [], [],
                                  rx=rx, rz=rz, skin=0.1, capacity=16)
    poss, qs, sigs, epss = [], [], [], []
    for r in range(R):
        pos, params = _lj_system(n0, L, seed=40 + r)
        poss.append(pos)
        qs.append(params["charge"])
        sigs.append(params["sigma"])
        epss.append(params["eps"])
    ext_pos = jnp.asarray(np.concatenate(poss, axis=0), jnp.float32)
    ext_params = {
        "charge": jnp.concatenate(qs).astype(jnp.float32),
        "sigma": jnp.concatenate(sigs).astype(jnp.float32),
        "eps": jnp.concatenate(epss).astype(jnp.float32)}
    cs = cp.build_cellsort(ext_pos, box, cfg)
    assert not bool(cs.overflow)
    _, f_ref = cp.pair_energy_forces(ext_params, ext_pos, box, cs, cfg,
                                     peg, ONE_4PI_EPS0, with_energy=False)
    f_pl = ps.pair_forces_pallas(ext_params, ext_pos, box, cs, cfg, "rf",
                                 krf=0.3, crf=1.1, interpret=True)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               atol=2e-5 * scale)
