"""Cell-pair block strategy must reproduce the dense path exactly:
same pairs, same exclusions, analytic forces == autodiff forces."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair

from util import swm4_water_box


def _pe_forces(system, positions, strategy, **ctx_kw):
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    ctx = dn.Context(system, integ, precision="double", strategy=strategy,
                     **ctx_kw)
    ctx.setPositions(positions)
    st = ctx.getState(forces=True, energy=True)
    return st.getPotentialEnergy(), st.getForces(), ctx, integ


def test_cellpair_matches_dense():
    system, positions = swm4_water_box(grid_size=3)
    rng = np.random.default_rng(5)
    positions = positions + rng.normal(0, 0.005, positions.shape)
    pe_d, f_d, _, _ = _pe_forces(system, positions, "dense")
    pe_c, f_c, ctx, _ = _pe_forces(system, positions, "cellpair")
    assert not ctx.neighborListOverflowed
    np.testing.assert_allclose(pe_c, pe_d, rtol=1e-10)
    np.testing.assert_allclose(f_c, f_d, rtol=1e-7, atol=1e-7)


def test_cellpair_pme_matches_dense():
    from util import ion_pair_pme_box
    system, positions = ion_pair_pme_box(grid_size=4)  # 128 atoms
    rng = np.random.default_rng(6)
    positions = positions + rng.normal(0, 0.01, positions.shape)
    pe_d, f_d, _, _ = _pe_forces(system, positions, "dense")
    pe_c, f_c, _, _ = _pe_forces(system, positions, "cellpair")
    np.testing.assert_allclose(pe_c, pe_d, rtol=1e-9)
    np.testing.assert_allclose(f_c, f_d, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_cellpair_dynamics_match_dense():
    system, positions = swm4_water_box(grid_size=3)
    results = []
    for strategy in ("dense", "cellpair"):
        integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
        integ.setMaxDrudeDistance(0.05)
        ctx = dn.Context(system, integ, precision="double",
                         strategy=strategy)
        ctx.setPositions(positions)
        ctx.applyConstraints(1e-5)
        ctx.setVelocitiesToTemperature(100.0, seed=11)
        integ.step(50)
        st = ctx.getState(positions=True, energy=True)
        results.append((st.getPositions(), st.getKineticEnergy()))
    np.testing.assert_allclose(results[1][0], results[0][0], atol=1e-8)
    np.testing.assert_allclose(results[1][1], results[0][1], rtol=1e-7)


def test_cellsort_round_trip():
    rng = np.random.default_rng(0)
    n = 500
    L = 3.0
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)))
    cfg = cellpair.make_config(1.0, [L] * 3, n, [], [], capacity=16)
    cs = cellpair.build_cellsort(pos, jnp.asarray([L] * 3), cfg)
    assert not bool(cs.overflow)
    sa = np.asarray(cs.slot_atom)
    inv = np.asarray(cs.inv_slot)
    # every atom in exactly one slot, inverse is consistent
    atoms = sa[sa < n]
    assert len(atoms) == n and len(set(atoms.tolist())) == n
    np.testing.assert_array_equal(sa[inv], np.arange(n))


def test_cellpair_overflow_grows():
    # clustered atoms exceed a tiny forced capacity -> context grows it
    system, positions = swm4_water_box(grid_size=3)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx._nb_kwargs["capacity"] = 4  # 5-site molecules cannot fit
    ctx._build_potential()
    ctx.setPositions(positions)
    st = ctx.getState(energy=True)
    assert np.isfinite(st.getPotentialEnergy())
    assert not ctx.neighborListOverflowed
    assert ctx._cp_cfg.capacity > 4
