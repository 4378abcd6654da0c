"""Cell-list neighbor path must reproduce the dense path exactly (same
pairs within cutoff, same exclusions)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import neighborlist

from util import swm4_water_box


def _context_pe_forces(system, positions, strategy):
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    ctx = dn.Context(system, integ, precision="double", strategy=strategy)
    ctx.setPositions(positions)
    st = ctx.getState(forces=True, energy=True)
    return st.getPotentialEnergy(), st.getForces(), ctx, integ


def test_cell_matches_dense_energy_forces():
    system, positions = swm4_water_box(grid_size=3)
    rng = np.random.default_rng(5)
    positions = positions + rng.normal(0, 0.005, positions.shape)
    pe_d, f_d, _, _ = _context_pe_forces(system, positions, "dense")
    pe_c, f_c, _, _ = _context_pe_forces(system, positions, "cell")
    np.testing.assert_allclose(pe_c, pe_d, rtol=1e-10)
    np.testing.assert_allclose(f_c, f_d, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_cell_dynamics_match_dense():
    """Short trajectories from identical initial conditions must agree
    (the rebuild interval's skin must cover the motion)."""
    system, positions = swm4_water_box(grid_size=3)
    results = []
    for strategy in ("dense", "cell"):
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double", strategy=strategy)
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-5)
        ctx.setVelocitiesToTemperature(100.0, seed=11)
        integ.step(50)
        st = ctx.getState(positions=True, energy=True)
        results.append((st.getPositions(), st.getKineticEnergy()))
        if strategy == "cell":
            assert not ctx.neighborListOverflowed
    np.testing.assert_allclose(results[1][0], results[0][0], atol=1e-8)
    np.testing.assert_allclose(results[1][1], results[0][1], rtol=1e-7)


def test_build_neighbors_bruteforce_parity():
    rng = np.random.default_rng(2)
    n = 300
    L = 3.0
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)))
    box = jnp.asarray([L, L, L])
    cfg = neighborlist.make_config(1.0, [L, L, L], n, skin=0.1)
    nbl = neighborlist.build_neighbors(pos, box, cfg)
    assert not bool(nbl.overflow)
    idx = np.asarray(nbl.idx)
    # brute-force reference
    p = np.asarray(pos)
    d = p[:, None, :] - p[None, :, :]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, axis=-1)
    want = (r2 <= cfg.r_list**2) & ~np.eye(n, dtype=bool)
    for i in range(n):
        got = set(idx[i][idx[i] < n].tolist())
        expect = set(np.nonzero(want[i])[0].tolist())
        assert got == expect, (i, got ^ expect)


def test_overflow_flag():
    rng = np.random.default_rng(3)
    n = 400
    L = 2.0
    # overfill: tiny capacity
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)))
    cfg = neighborlist.NeighborConfig(
        cutoff=0.9, skin=0.1, grid=(2, 2, 2), cell_capacity=8,
        max_neighbors=16, rebuild_interval=16)
    nbl = neighborlist.build_neighbors(pos, jnp.asarray([L, L, L]), cfg)
    assert bool(nbl.overflow)
