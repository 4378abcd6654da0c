"""Flat-ensemble NPT (SimState.rep_scale): per-replica boxes on the ONE
shared embedded cell grid.

Physics: replica r's box is template * s_r; binning and the cell-pair
sweep run in STORED coordinates p/s_r with r^2 scaled per cell
(forces/cellpair._sweep_regular), PME is vmapped with per-replica boxes,
and each replica runs its own MC volume moves
(integrators/barostat.maybe_attempt_mc_move_ensemble).  The pins here
compare against fully independent Contexts built with the scaled boxes —
VERDICT round-2 item 4's ensemble-NPT half."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import builders
from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

N_MOL = 200
CUTOFF = 0.55
SCALES = (1.04, 0.95)


def _template_ctx(barostat=False, nb_options=None):
    system, positions = builders.build_water_box(
        N_MOL, method=dn.NonbondedForce.PME, cutoff=CUTOFF)
    if barostat:
        system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 2))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double",
                     strategy="cellpair", hardwall_strict=False,
                     nb_options=nb_options)
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-8)
    return ctx, system


def _com_scaled(system, positions, s):
    """Positions after a barostat-style molecule-COM scaling by s (5-site
    waters, contiguous)."""
    masses = np.array([system.getParticleMass(i)
                       for i in range(system.getNumParticles())])
    p = np.asarray(positions, np.float64).reshape(-1, 5, 3)
    m = masses.reshape(-1, 5)
    com = (m[:, :, None] * p).sum(axis=1) / m.sum(axis=1)[:, None]
    return (p + (s - 1.0) * com[:, None, :]).reshape(-1, 3)


def _independent_ctx(s, positions, pme_alpha, pme_grid):
    system, _ = builders.build_water_box(
        N_MOL, method=dn.NonbondedForce.PME, cutoff=CUTOFF)
    box = np.array(system.getDefaultPeriodicBoxVectors(), np.float64) * s
    system.setDefaultPeriodicBoxVectors(*box)
    nb = next(f for f in system.getForces()
              if isinstance(f, dn.NonbondedForce))
    # pin the reciprocal plan to the flat template's so the comparison is
    # exact (PME grids are otherwise re-chosen per box)
    nb.setPMEParameters(pme_alpha, *pme_grid)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double",
                     strategy="cellpair", hardwall_strict=False)
    ctx.setPositions(positions)
    return ctx


@pytest.fixture(scope="module")
def scaled_parity_setup():
    tpl, system = _template_ctx()
    ens = FlatReplicaEnsemble(tpl, 2, rx=2, rz=1)
    nb_fn = next(t[0] for t in ens.context._terms
                 if hasattr(t[0], "cellpair_cfg"))
    pme = nb_fn.pme_setup
    p0 = np.asarray(tpl._state.positions, np.float64)
    pos = [_com_scaled(system, p0, s) for s in SCALES]
    ens.context._state = ens.context._state._replace(
        rep_scale=jnp.asarray(np.array(SCALES)))
    ens.setPositions(np.stack(pos))
    indep = [_independent_ctx(s, p, pme.alpha, pme.grid)
             for s, p in zip(SCALES, pos)]
    return ens, indep


def test_flat_npt_energy_matches_independent(scaled_parity_setup):
    ens, indep = scaled_parity_setup
    pe_flat = ens.context.getState(energy=True).getPotentialEnergy()
    pes = [c.getState(energy=True).getPotentialEnergy() for c in indep]
    np.testing.assert_allclose(pe_flat, sum(pes), rtol=1e-10)
    # per-replica reporting path (vmapped template potential with
    # per-replica boxes)
    np.testing.assert_allclose(ens.potential_energies(), pes, rtol=1e-10)


def test_flat_npt_forces_match_independent(scaled_parity_setup):
    ens, indep = scaled_parity_setup
    ens.context._ensure_forces()
    f_flat = np.asarray(ens.context._state.forces,
                        np.float64).reshape(2, -1, 3)
    for r, c in enumerate(indep):
        c._ensure_forces()
        f_r = np.asarray(c._state.forces, np.float64)
        scale = np.abs(f_r).max()
        np.testing.assert_allclose(f_flat[r], f_r, atol=1e-8 * scale)


def test_flat_npt_mc_delta_matches_independent(scaled_parity_setup):
    """The Metropolis energy: mc_energies omits terms invariant under
    molecule-COM volume moves, so its DELTA between two (positions,
    scale) states of the same replica must equal the full-PE delta of
    independent contexts."""
    ens, indep = scaled_parity_setup
    ctx = ens.context
    ctx._ensure_neighbors()
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    st = ctx._state
    e0 = np.asarray(nb_fn.mc_energies(nb_params, st.positions, st.box,
                                      st.neighbors, st.rep_scale),
                    np.float64)

    # propose a further COM scaling of replica 0 by ls
    ls = 1.015
    tpl_sys = ens._template._system
    p = np.asarray(st.positions, np.float64).reshape(2, -1, 3)
    p_new = p.copy()
    p_new[0] = _com_scaled(tpl_sys, p[0], ls)
    s_new = jnp.asarray(np.array(SCALES) * np.array([ls, 1.0]))
    e1 = np.asarray(nb_fn.mc_energies(
        nb_params, jnp.asarray(p_new.reshape(-1, 3)), st.box,
        st.neighbors, s_new), np.float64)

    # independent replica 0 at the same two physical states
    pme = nb_fn.pme_setup
    c_a = indep[0]
    pe_a = c_a.getState(energy=True).getPotentialEnergy()
    c_b = _independent_ctx(SCALES[0] * ls,
                           _com_scaled(tpl_sys, p[0], ls),
                           pme.alpha, pme.grid)
    pe_b = c_b.getState(energy=True).getPotentialEnergy()

    np.testing.assert_allclose(e1[0] - e0[0], pe_b - pe_a,
                               rtol=1e-8, atol=1e-7)
    # replica 1 untouched
    np.testing.assert_allclose(e1[1], e0[1], rtol=1e-12)


@pytest.mark.slow          # end-to-end run; the fast tier keeps the
                           # parity/MC-delta pins (round-5 tier budget)
def test_flat_npt_runs_and_replicas_decouple():
    """End to end: per-replica MC moves fire, scales evolve
    independently, trajectories stay finite, and accessors report
    per-replica boxes/densities."""
    tpl, _ = _template_ctx(barostat=True)
    ens = FlatReplicaEnsemble(tpl, 2, rx=2, rz=1)
    assert ens.context._state.rep_scale is not None
    ens.setVelocitiesToTemperature(300.0, seed=5)
    ens.step(12)
    st = ens.context._state
    assert bool(jnp.all(jnp.isfinite(st.positions)))
    s = np.asarray(st.rep_scale, np.float64)
    nt = np.asarray(st.baro_nattempt) + np.asarray(st.baro_naccept)
    assert nt.min() > 0, "each replica must have attempted MC moves"
    assert np.all(np.isfinite(s)) and np.all(s > 0.5) and np.all(s < 2.0)
    # the two replicas draw different dV -> scales diverge
    assert s[0] != s[1]
    boxes = ens.boxes()
    assert boxes.shape == (2, 3, 3)
    np.testing.assert_allclose(
        boxes[:, 0, 0] / np.asarray(st.box)[0, 0], s, rtol=1e-12)
    d = ens.densities()
    assert np.all(np.isfinite(d)) and np.all(d > 0)
    pes = ens.potential_energies()
    assert np.all(np.isfinite(pes))


def _intermolecular_extras_template():
    """Water template with ionic-liquid-class INTERmolecular extras:
    NBTHOLE screening between two molecules' Drude pairs and an NBFIX LJ
    override between two oxygens of different molecules (synthetic
    parameters; the TGNH authors' ionic-liquid systems need exactly these
    mechanisms — SURVEY intro, Son et al. JPCL 2019)."""
    system, positions = builders.build_water_box(
        N_MOL, method=dn.NonbondedForce.PME, cutoff=CUTOFF)
    drude = next(f for f in system.getForces()
                 if isinstance(f, dn.DrudeForce))
    drude.addNBTholePair(0, 1, 1.3)     # Drude-particle indices (mol 0, 1)
    nb = next(f for f in system.getForces()
              if isinstance(f, dn.NonbondedForce))
    nb.addLJPairOverride([10], [15], 0.31, 0.8)   # O of mol 2 vs mol 3
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 2))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double",
                     strategy="cellpair", hardwall_strict=False)
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-8)
    return ctx, system


def test_flat_npt_mc_delta_with_nbthole_nbfix():
    """Ionic-liquid replica case (VERDICT round-3 item 3): with NBTHOLE +
    NBFIX present, the composed per-replica MC energy (NonbondedForce
    hook + DrudeForce hook) must reproduce the full-PE delta of
    independent scaled-box Contexts under a volume move — i.e. the
    intermolecular extras now participate in the Metropolis acceptance."""
    tpl, tpl_system = _intermolecular_extras_template()
    ens = FlatReplicaEnsemble(tpl, 2, rx=2, rz=1)
    ctx = ens.context
    nb_fn = next(t[0] for t in ctx._terms if hasattr(t[0], "cellpair_cfg"))
    pme = nb_fn.pme_setup
    p0 = np.asarray(tpl._state.positions, np.float64)
    pos = [_com_scaled(tpl_system, p0, s) for s in SCALES]
    ctx._state = ctx._state._replace(
        rep_scale=jnp.asarray(np.array(SCALES)))
    ens.setPositions(np.stack(pos))
    ctx._ensure_neighbors()
    st = ctx._state

    mc_terms = [(t[0].mc_energies, t[1]) for t in ctx._terms
                if getattr(t[0], "mc_energies", None)]
    assert len(mc_terms) == 2, "both the nonbonded and Drude hooks"

    def mc(positions, rs):
        return sum(np.asarray(f(p, positions, st.box, st.neighbors, rs),
                              np.float64) for f, p in mc_terms)

    e0 = mc(st.positions, st.rep_scale)
    ls = 1.015
    p = np.asarray(st.positions, np.float64).reshape(2, -1, 3)
    p_new = p.copy()
    p_new[0] = _com_scaled(tpl_system, p[0], ls)
    s_new = jnp.asarray(np.array(SCALES) * np.array([ls, 1.0]))
    e1 = mc(jnp.asarray(p_new.reshape(-1, 3)), s_new)

    def indep(s, positions):
        system, _ = builders.build_water_box(
            N_MOL, method=dn.NonbondedForce.PME, cutoff=CUTOFF)
        drude = next(f for f in system.getForces()
                     if isinstance(f, dn.DrudeForce))
        drude.addNBTholePair(0, 1, 1.3)
        nbv = next(f for f in system.getForces()
                   if isinstance(f, dn.NonbondedForce))
        nbv.addLJPairOverride([10], [15], 0.31, 0.8)
        box = np.array(system.getDefaultPeriodicBoxVectors(),
                       np.float64) * s
        system.setDefaultPeriodicBoxVectors(*box)
        nbv.setPMEParameters(pme.alpha, *pme.grid)
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005,
                                       20, 2)
        integ.setMaxDrudeDistance(0.05)
        c = dn.Context(system, integ, precision="double",
                       strategy="cellpair", hardwall_strict=False)
        c.setPositions(positions)
        return c.getState(energy=True).getPotentialEnergy()

    pe_a = indep(SCALES[0], pos[0])
    pe_b = indep(SCALES[0] * ls, _com_scaled(tpl_system, p[0], ls))
    np.testing.assert_allclose(e1[0] - e0[0], pe_b - pe_a,
                               rtol=1e-8, atol=1e-7)
    np.testing.assert_allclose(e1[1], e0[1], rtol=1e-12)


@pytest.mark.slow          # end-to-end run; the fast tier keeps the
                           # parity/MC-delta pins (round-5 tier budget)
def test_flat_npt_runs_with_nbthole_nbfix():
    """End to end: the round-3 refusal is gone — flat NPT with NBTHOLE +
    NBFIX steps, fires per-replica MC moves, and stays finite."""
    tpl, _ = _intermolecular_extras_template()
    ens = FlatReplicaEnsemble(tpl, 2, rx=2, rz=1)
    assert ens.context._state.rep_scale is not None
    ens.setVelocitiesToTemperature(300.0, seed=7)
    ens.step(8)
    st = ens.context._state
    assert bool(jnp.all(jnp.isfinite(st.positions)))
    nt = np.asarray(st.baro_nattempt) + np.asarray(st.baro_naccept)
    assert nt.min() > 0
    s = np.asarray(st.rep_scale, np.float64)
    assert np.all(np.isfinite(s)) and np.all(s > 0.5) and np.all(s < 2.0)