"""The uniform molecule-major layout fast path (core/spec.py detection +
integrators/tgnh._partner_rows lane shifts) must be EXACT: the shift-select
partner read is the same permutation the random gather performs, so full
trajectories must match bit-for-bit with the fast path forced off."""

import pytest
import dataclasses

import jax
import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.integrators import tgnh

from util import swm4_water_box


def _context():
    system, positions = swm4_water_box(grid_size=4, cutoff=0.9,
                                       add_cm_motion=False)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(250.0, seed=1)
    ctx._ensure_forces()
    return ctx


def test_uniform_layout_detected():
    ctx = _context()
    st = ctx._static
    assert st.uniform_k == 5            # O, D, H, H, M
    assert st.partner_offsets == (1, -1, 0, 0, 0)


def test_partner_rows_matches_gather():
    ctx = _context()
    spec, static = ctx._spec, ctx._static
    x = np.asarray(ctx._state.positions)
    fast = np.asarray(tgnh._partner_rows(spec, static, ctx._state.positions))
    ref = x[np.asarray(spec.partner)]
    np.testing.assert_array_equal(fast, ref)


@pytest.mark.slow
def test_trajectory_matches_gather_path():
    """The partner READ is the same permutation either way; the two
    compiled programs may still contract FMAs differently downstream, so
    the trajectories agree to reassociation rounding (~1 ulp/step), not
    bit-for-bit."""
    ctx_fast = _context()
    ctx_fast.getIntegrator().step(5)

    ctx_ref = _context()
    # force the gather path by erasing the detected layout
    ctx_ref._static = dataclasses.replace(ctx_ref._static, uniform_k=0,
                                          partner_offsets=())
    ctx_ref._build_potential()
    ctx_ref.getIntegrator().step(5)

    np.testing.assert_allclose(np.asarray(ctx_fast._state.positions),
                               np.asarray(ctx_ref._state.positions),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(ctx_fast._state.velocities),
                               np.asarray(ctx_ref._state.velocities),
                               rtol=0, atol=1e-12)
