"""NH-pair fusion (tgnh._make_multi_step_fused): the scan body that merges
the second NH half of step k with the first NH half of step k+1 must
reproduce the unfused step-by-step trajectory.  The composition is exact in
real arithmetic (the one KE measurement serves both halves via the chain's
own damped-KE invariant; bath scalings compose elementwise; CM removal
shifts only the COM bath by -M_tot |v_cm|^2), so on CPU f64 the two paths
agree to tight tolerance."""

import jax
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.integrators import tgnh
from tests.util import swm4_water_box


def _ctx(cm=True):
    system, positions = swm4_water_box(grid_size=2, cutoff=0.45)
    if not cm:
        for i, f in enumerate(system.getForces()):
            if isinstance(f, dn.CMMotionRemover):
                system.removeForce(i)
                break
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 2)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-8)
    ctx.setVelocitiesToTemperature(300.0, seed=4)
    ctx._ensure_forces()
    return ctx


@pytest.mark.parametrize("cm", [
    True, pytest.param(False, marks=pytest.mark.slow)])
def test_fused_matches_unfused(cm):
    ctx = _ctx(cm=cm)
    spec, static, st = ctx._spec, ctx._static, ctx._state

    n = 9
    plain = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, n,
                                         fuse_nh=False))
    fused = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, n,
                                         fuse_nh=True))
    out_p = jax.block_until_ready(plain(spec, st))
    out_f = jax.block_until_ready(fused(spec, st))

    np.testing.assert_allclose(np.asarray(out_f.positions),
                               np.asarray(out_p.positions),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out_f.velocities),
                               np.asarray(out_p.velocities),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out_f.eta),
                               np.asarray(out_p.eta), rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out_f.group_ke),
                               np.asarray(out_p.group_ke),
                               rtol=1e-10, atol=0)
    assert int(out_f.step) == int(out_p.step) == n
    # KESum semantics: the cached value from the last NH half-step
    np.testing.assert_allclose(float(out_f.ke_sum), float(out_p.ke_sum),
                               rtol=1e-10)


def test_fused_single_step_falls_back():
    ctx = _ctx()
    spec, static, st = ctx._spec, ctx._static, ctx._state
    one = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, 1))
    step = jax.jit(tgnh.make_step(static, ctx._energy_and_forces))
    out_a = jax.block_until_ready(one(spec, st))
    out_b = jax.block_until_ready(step(spec, st))
    np.testing.assert_allclose(np.asarray(out_a.positions),
                               np.asarray(out_b.positions), atol=0)
