"""Runtime guards: NPT stencil replanning and rebuild-drift detection.

VERDICT round-1 'weak' items: a shrinking NPT box could silently
invalidate the compile-time cell stencil, and atoms outrunning the skin
between rebuilds silently missed interactions."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import builders


def _ctx(n_mol=200):
    system, positions = builders.build_water_box(n_mol, cutoff=0.52)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx.setPositions(positions)
    return ctx, integ, positions


def test_npt_shrink_replans_stencil():
    ctx, integ, positions = _ctx()
    grid0 = ctx._cp_cfg.grid
    # shrink the box (and scale positions) well past stencil validity
    s = 0.62
    ctx._state = ctx._state._replace(
        box=ctx._state.box * s,
        positions=ctx._state.positions * s,
        neighbors=None)
    ctx._forces_valid = False
    ctx._ensure_neighbors()          # must replan, not raise
    assert ctx._cp_cfg.grid != grid0
    # the replanned config covers r_list at the new box
    box = np.diagonal(np.asarray(ctx._state.box))
    cell = box / np.asarray(ctx._cp_cfg.grid)
    assert np.all(np.asarray(ctx._cp_cfg.window) * cell
                  >= ctx._cp_cfg.r_list - 1e-9)


def test_rebuild_drift_warns():
    # fast tier on purpose: this is the only detector of silent
    # missed-pair corruption (ADVICE round 3)
    ctx, integ, positions = _ctx()
    integ.step(2)
    # teleport one atom past the 2x-skin latch threshold without
    # invalidating neighbors
    p = np.array(ctx._state.positions)
    p[0] += 2 * ctx._cp_cfg.skin + 0.05
    ctx._state = ctx._state._replace(positions=jnp.asarray(p))
    with pytest.warns(RuntimeWarning, match="neighbor skin"):
        integ.step(2 * ctx._cp_cfg.rebuild_interval)


def test_rebuild_drift_warns_two_atom_closing():
    # two atoms each moving ~1.6x skin toward each other close ~3.2x
    # skin combined — invisible to the single-atom 2x latch, caught by
    # the top-two-sum 3x latch (ADVICE round 3)
    ctx, integ, positions = _ctx()
    integ.step(2)
    skin = ctx._cp_cfg.skin
    # two oxygens of different molecules (5 sites per SWM4 water); the
    # latch measures displacement magnitudes, so direction is irrelevant
    p = np.array(ctx._state.positions)
    d = p[5] - p[0]
    d /= np.linalg.norm(d)
    p[0] -= 1.65 * skin * d
    p[5] += 1.65 * skin * d
    ctx._state = ctx._state._replace(positions=jnp.asarray(p))
    with pytest.warns(RuntimeWarning, match="neighbor skin"):
        integ.step(2 * ctx._cp_cfg.rebuild_interval)


@pytest.mark.slow
def test_no_drift_warning_in_normal_run():
    ctx, integ, positions = _ctx()
    ctx.minimizeEnergy(maxIterations=200)
    ctx.setVelocitiesToTemperature(50.0, seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        integ.step(2 * ctx._cp_cfg.rebuild_interval)
