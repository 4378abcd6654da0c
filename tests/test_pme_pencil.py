"""Pencil-spread PME (pme.spread_pencils) vs the generic spread.

The pencil path reuses the sweep's cell-sorted slot structure
(forces/cellpair.CellSort) for local-window MXU spreading; it must match
spread_charge_grid exactly (same B-splines, same taps) for in-box,
out-of-box (unwrapped), and drifted-since-rebuild positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.forces import pme as pm


def _setup(n=600, seed=0, capacity=24):
    rng = np.random.default_rng(seed)
    box = np.array([3.1, 2.9, 3.3])
    pos = rng.uniform(-1.0, 4.5, (n, 3))  # includes unwrapped atoms
    q = rng.normal(size=n)
    cfg = cp.make_config(0.9, box, n, [], [], skin=0.1, capacity=capacity)
    setup = pm.setup_pme(0.9, 5e-4, box, cell_grid=cfg.grid)
    cs = cp.build_cellsort(jnp.asarray(pos), jnp.asarray(box), cfg)
    assert not bool(cs.overflow)
    return box, pos, q, cfg, setup, cs


def test_grid_is_cell_multiple():
    box, pos, q, cfg, setup, cs = _setup()
    assert all(K % g == 0 for K, g in zip(setup.grid, cfg.grid))
    assert setup.cell_grid == cfg.grid


def test_energy_matches_generic():
    box, pos, q, cfg, setup, cs = _setup()
    e_ref = setup.reciprocal_energy(jnp.asarray(q), jnp.asarray(pos),
                                    jnp.asarray(box))
    e_new = setup.reciprocal_energy_sorted(jnp.asarray(q), jnp.asarray(pos),
                                           jnp.asarray(box), cs, cfg.capacity)
    np.testing.assert_allclose(float(e_new), float(e_ref), rtol=1e-12)


@pytest.mark.slow
def test_forces_match_generic():
    box, pos, q, cfg, setup, cs = _setup()
    g_ref = jax.grad(lambda p: setup.reciprocal_energy(
        jnp.asarray(q), p, jnp.asarray(box)))(jnp.asarray(pos))
    g_new = jax.grad(lambda p: setup.reciprocal_energy_sorted(
        jnp.asarray(q), p, jnp.asarray(box), cs, cfg.capacity))(
        jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-8 * float(
                                   jnp.max(jnp.abs(g_ref))))


def test_drifted_positions_stay_exact():
    """Atoms moved (within the skin allowance) after the cellsort rebuild:
    the local windows carry >= 1 grid point of drift margin."""
    box, pos, q, cfg, setup, cs = _setup()
    rng = np.random.default_rng(1)
    drift = rng.uniform(-0.045, 0.045, pos.shape)  # skin/2 = 0.05
    pos2 = jnp.asarray(pos + drift)
    e_ref = setup.reciprocal_energy(jnp.asarray(q), pos2, jnp.asarray(box))
    e_new = setup.reciprocal_energy_sorted(jnp.asarray(q), pos2,
                                           jnp.asarray(box), cs, cfg.capacity)
    np.testing.assert_allclose(float(e_new), float(e_ref), rtol=1e-12)


def test_small_box_falls_back():
    """Boxes too small for local windows must keep cell_grid=None."""
    box = np.array([1.2, 1.2, 1.2])
    cfg = cp.make_config(0.55, box, 50, [], [], skin=0.05)
    setup = pm.setup_pme(0.55, 5e-4, box, cell_grid=cfg.grid)
    assert setup.cell_grid is None


def _setup_packed(n=600, seed=0, capacity=24):
    import dataclasses
    rng = np.random.default_rng(seed)
    box = np.array([3.1, 2.9, 3.3])
    pos = rng.uniform(-1.0, 4.5, (n, 3))
    q = rng.normal(size=n)
    cfg = cp.make_config(0.9, box, n, [], [], skin=0.1, capacity=capacity)
    setup = pm.setup_pme(0.9, 5e-4, box, cell_grid=cfg.grid)
    n_pen = cfg.grid[0] * cfg.grid[1]
    Cp = max(-(-(int(np.ceil(1.35 * n / n_pen)) + 8) // 128) * 128, 128)
    cfg = dataclasses.replace(cfg, pen_capacity=Cp)
    cs = cp.build_cellsort(jnp.asarray(pos), jnp.asarray(box), cfg)
    assert not bool(cs.overflow)
    assert cs.pen_atom is not None
    return box, pos, q, cfg, setup, cs


def test_packed_spread_matches_generic():
    """The compact per-pencil packing (CellSort.pen_atom) must reproduce
    the generic spread exactly, including unwrapped positions, and its
    autodiff forces."""
    box, pos, q, cfg, setup, cs = _setup_packed()
    Q_ref = pm.spread_charge_grid(setup.grid, jnp.asarray(q),
                                  jnp.asarray(pos), jnp.asarray(box))
    Q_new = pm.spread_pencils_packed(setup.grid, setup.cell_grid,
                                     jnp.asarray(q), jnp.asarray(pos),
                                     jnp.asarray(box), cs)
    np.testing.assert_allclose(np.asarray(Q_new), np.asarray(Q_ref),
                               atol=1e-13)
    # reciprocal_energy_sorted dispatches to the packed path
    g_ref = jax.grad(lambda p: setup.reciprocal_energy(
        jnp.asarray(q), p, jnp.asarray(box)))(jnp.asarray(pos))
    g_new = jax.grad(lambda p: setup.reciprocal_energy_sorted(
        jnp.asarray(q), p, jnp.asarray(box), cs, cfg.capacity))(
        jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-8 * float(
                                   jnp.max(jnp.abs(g_ref))))


def test_packed_drifted_positions_stay_exact():
    box, pos, q, cfg, setup, cs = _setup_packed()
    rng = np.random.default_rng(1)
    drift = rng.uniform(-0.045, 0.045, pos.shape)
    pos2 = jnp.asarray(pos + drift)
    e_ref = setup.reciprocal_energy(jnp.asarray(q), pos2, jnp.asarray(box))
    e_new = setup.reciprocal_energy_sorted(jnp.asarray(q), pos2,
                                           jnp.asarray(box), cs,
                                           cfg.capacity)
    np.testing.assert_allclose(float(e_new), float(e_ref), rtol=1e-12)


def test_recip_forces_analytic_matches_autodiff():
    """The hand-written interpolation-force path (pme.recip_forces) must
    match reverse-mode autodiff through the spread to roundoff, energy
    included, for in-box, unwrapped, and drifted positions."""
    box, pos, q, cfg, setup, cs = _setup_packed()
    rng = np.random.default_rng(2)
    for drift in (None, rng.uniform(-0.045, 0.045, pos.shape)):
        p = jnp.asarray(pos if drift is None else pos + drift)
        e_ref, g_ref = jax.value_and_grad(lambda p_: setup.reciprocal_energy(
            jnp.asarray(q), p_, jnp.asarray(box)))(p)
        e_new, f_new = setup.recip_forces(jnp.asarray(q), p,
                                          jnp.asarray(box), cs)
        np.testing.assert_allclose(float(e_new), float(e_ref), rtol=1e-12)
        scale = float(jnp.max(jnp.abs(g_ref)))
        np.testing.assert_allclose(np.asarray(f_new), -np.asarray(g_ref),
                                   rtol=1e-9, atol=1e-9 * scale)


def _setup_ens(R=6, rx=2, rz=3, n0=300, seed=2):
    """Flattened-ensemble pencil structure: R replicas on an embedded
    grid with per-(x, y, z-band) pencils (cellpair.pencil_perm order)."""
    import dataclasses
    rng = np.random.default_rng(seed)
    box0 = np.array([2.6, 2.4, 2.5])
    pos0 = rng.uniform(-0.5, 3.0, (R, n0, 3))
    q0 = rng.normal(size=(R, n0))
    q = q0.reshape(-1)
    pos = pos0.reshape(-1, 3)
    cfg = cp.make_ensemble_config(0.7, box0, n0, R, [], [], rx=rx, rz=rz,
                                  skin=0.1, capacity=24)
    setup = pm.setup_pme(0.7, 5e-4, box0, cell_grid=cfg.phys_grid)
    assert setup.cell_grid is not None
    n_pen0 = cfg.phys_grid[0] * cfg.phys_grid[1]
    cp_need = int(np.ceil(1.35 * n0 / n_pen0)) + 8
    cfg = dataclasses.replace(cfg, pen_capacity=max(
        -(-cp_need // 128) * 128, 128))
    cs = cp.build_cellsort(jnp.asarray(pos), jnp.asarray(box0), cfg)
    assert not bool(cs.overflow)
    return box0, pos0, q0, cfg, setup, cs


def test_ens_pencil_energies_match_generic():
    """Replica-batched pencil reciprocal sum == per-replica generic
    spread (the flattened-ensemble fast path, pme.recip_ens_packed)."""
    R = 6
    box0, pos0, q0, cfg, setup, cs = _setup_ens(R=R)
    e_ref = np.array([
        float(setup.reciprocal_energy(jnp.asarray(q0[r]),
                                      jnp.asarray(pos0[r]),
                                      jnp.asarray(box0)))
        for r in range(R)])
    e_new, _ = setup.recip_ens(R, jnp.asarray(q0.reshape(-1)),
                               jnp.asarray(pos0.reshape(-1, 3)),
                               jnp.asarray(box0), cs)
    np.testing.assert_allclose(np.asarray(e_new), e_ref, rtol=1e-11)


def test_ens_pencil_forces_match_autodiff():
    R = 6
    box0, pos0, q0, cfg, setup, cs = _setup_ens(R=R)
    q = jnp.asarray(q0.reshape(-1))
    p = jnp.asarray(pos0.reshape(-1, 3))
    e, f = setup.recip_ens(R, q, p, jnp.asarray(box0), cs,
                           with_forces=True)
    g = jax.grad(lambda pp: jnp.sum(setup.recip_ens(
        R, q, pp, jnp.asarray(box0), cs)[0]))(p)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9,
                               atol=1e-9 * float(jnp.max(jnp.abs(g))))


def test_ens_pencil_rep_scale_matches_scaled_boxes():
    """Flat-NPT semantics: stored-frame positions with per-replica scales
    == independent generic sums at physical positions in scaled boxes."""
    R = 6
    box0, pos0, q0, cfg, setup, cs = _setup_ens(R=R)
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.uniform(0.97, 1.03, R))
    # pos0 here plays the STORED role; physical = stored * s
    e_new, f_new = setup.recip_ens(R, jnp.asarray(q0.reshape(-1)),
                                   jnp.asarray(pos0.reshape(-1, 3)),
                                   jnp.asarray(box0), cs, rep_scale=s,
                                   with_forces=True)
    for r in range(R):
        sr = float(s[r])
        e_ref = float(setup.reciprocal_energy(
            jnp.asarray(q0[r]), jnp.asarray(pos0[r] * sr),
            jnp.asarray(box0 * sr)))
        np.testing.assert_allclose(float(e_new[r]), e_ref, rtol=1e-11)
        g_ref = jax.grad(lambda pp: setup.reciprocal_energy(
            jnp.asarray(q0[r]), pp, jnp.asarray(box0 * sr)))(
            jnp.asarray(pos0[r] * sr))
        np.testing.assert_allclose(
            np.asarray(f_new.reshape(R, -1, 3)[r]), -np.asarray(g_ref),
            rtol=1e-9, atol=1e-9 * float(jnp.max(jnp.abs(g_ref))))


def test_spread_gradient_exact_on_knots():
    """Atoms EXACTLY on PME grid knots (binary-fraction lattice starts hit
    this in both f32 and f64): autodiff through the spread must equal
    finite differences of the same energy.  Without _bspline_weights'
    custom JVP the Cox-de Boor recursion's |x|-kinks land exactly at
    sign(0) = 0 and the gradient is wrong by O(1) while the energy is
    exact (found on chip in round 4: +88 vs the true -18 kJ/mol/nm)."""
    box = np.array([2.0, 2.0, 2.0])
    setup = pm.setup_pme(0.9, 5e-4, box)
    K = np.array(setup.grid)
    rng = np.random.default_rng(3)
    n = 24
    # half the atoms on exact knots (binary-rational fractions), half off
    knots = (rng.integers(0, K, (n // 2, 3)) / K) * box
    rest = rng.uniform(0, 1, (n - n // 2, 3)) * box
    pos = jnp.asarray(np.concatenate([knots, rest]))
    q = jnp.asarray(rng.normal(size=n))
    bx = jnp.asarray(box)

    E = lambda p: setup.reciprocal_energy(q, p, bx)
    g = jax.grad(E)(pos)
    h = 1e-6
    for a in list(range(0, n // 2, 3)) + [n - 1]:
        for c in range(3):
            dp = jnp.zeros_like(pos).at[a, c].set(h)
            fd = (float(E(pos + dp)) - float(E(pos - dp))) / (2 * h)
            np.testing.assert_allclose(
                float(g[a, c]), fd, rtol=5e-5, atol=5e-5,
                err_msg=f"knot-gradient mismatch at atom {a} comp {c}")
