"""Scatter-free vsite force spread (constraints/vsites.spread_vsite_forces).

For average-only vsite systems the Jacobian of apply_vsites is a constant
sparse matrix; spec build captures J^T as (N, R) gather tables and the
force-only path applies it with pure gathers instead of autodiffing the
vsite scatter.  The tables must reproduce jax.vjp exactly, and the full
force-only path must keep matching the autodiff energy gradient."""

import jax
import jax.numpy as jnp
import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.constraints.vsites import (apply_vsites,
                                                     spread_vsite_forces)
from tests.util import swm4_water_box


def _ctx():
    system, positions = swm4_water_box(grid_size=2, cutoff=0.45)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    return ctx


def test_spread_matches_vjp():
    ctx = _ctx()
    spec, static = ctx._spec, ctx._static
    assert spec.vs_spread_src is not None     # SWM4 water: avg sites only
    n = static.n_atoms
    pos = ctx._state.positions
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=(n, 3)))

    _, vjp_fn = jax.vjp(lambda p: apply_vsites(spec, static, p), pos)
    want = vjp_fn(f)[0]
    got = spread_vsite_forces(spec, static, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-12)
    # massless-site rows come out exactly zero (force moved to parents)
    sites = np.asarray(spec.vs_avg_idx)
    assert np.all(np.asarray(got)[sites] == 0.0)


def test_forces_only_matches_energy_grad():
    system, positions = swm4_water_box(grid_size=4)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx.setPositions(positions)
    assert ctx._forces_only is not None
    assert ctx._spec.vs_spread_src is not None
    ctx._ensure_neighbors()
    st = ctx._state
    pe_f = ctx._energy_and_forces(st.positions, st.box, st.neighbors,
                                  st.pos_err)[1]
    fo = ctx._forces_only(st.positions, st.box, st.neighbors, st.pos_err)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(pe_f),
                               rtol=1e-9, atol=1e-9)


def test_lane_shift_composition_matches_generic():
    """The static lane-shift vsite composition (StaticSpec.vs_comp_shifts)
    must equal the generic gather/scatter path exactly."""
    import dataclasses

    import jax.numpy as jnp

    from openmm_drudenose_tpu.constraints.vsites import apply_vsites
    from openmm_drudenose_tpu.io import builders
    import openmm_drudenose_tpu as dn

    system, positions = builders.build_water_box(40)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx = dn.Context(system, integ, precision="double")
    spec, static = ctx._spec, ctx._static
    assert static.vs_comp_shifts, "SWM4 water must enable the fast path"
    p = jnp.asarray(np.asarray(positions) + 0.01)
    fast = apply_vsites(spec, static, p)
    generic = apply_vsites(spec, dataclasses.replace(
        static, vs_comp_shifts=()), p)
    np.testing.assert_array_equal(np.asarray(fast)[:, 0].shape,
                                  np.asarray(generic)[:, 0].shape)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(generic),
                               atol=1e-14)
