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
