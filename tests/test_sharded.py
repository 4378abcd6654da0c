"""Work-sharded force engine + step (parallel/sharded.py) on the 8 virtual
CPU devices from conftest: the sharded trajectory must match the
single-device trajectory to reduction-order rounding."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.parallel import sharded

from util import swm4_water_box


def _context(method):
    system, positions = swm4_water_box(grid_size=3, add_cm_motion=False)
    system.getForce(0).setNonbondedMethod(method)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    ctx._ensure_forces()
    return ctx


def _mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must force 8 virtual devices"
    return Mesh(np.array(devices[:8]), ("atom",))


@pytest.mark.parametrize("method", [
    pytest.param(dn.NonbondedForce.PME, marks=pytest.mark.slow),
    dn.NonbondedForce.CutoffPeriodic])
def test_sharded_eaf_matches_plain(method):
    """Slab-sharded sweep + sharded PME spreading + replicated extras must
    reproduce the single-device energy AND forces."""
    ctx = _context(method)
    mesh = _mesh()
    eaf = sharded.make_sharded_energy_and_forces(ctx, mesh)
    st = ctx._state
    with mesh:
        pe_s, f_s = jax.jit(eaf)(st.positions, st.box, st.neighbors)
        pe_s, f_s = np.asarray(pe_s), np.asarray(f_s)
    pe, f = jax.jit(ctx._energy_and_forces)(st.positions, st.box,
                                            st.neighbors)
    np.testing.assert_allclose(pe_s, float(pe), rtol=1e-12)
    scale = np.abs(np.asarray(f)).max()
    np.testing.assert_allclose(f_s, np.asarray(f), atol=1e-9 * scale)


@pytest.mark.slow
def test_sharded_trajectory_matches_single():
    """20 TGNH steps with the work-sharded engine == 20 plain steps."""
    ctx_plain = _context(dn.NonbondedForce.PME)
    ctx_plain.getIntegrator().step(20)
    ref_pos = ctx_plain.getPositions()
    ref_eta = np.asarray(ctx_plain._state.eta)

    ctx = _context(dn.NonbondedForce.PME)
    sctx = sharded.ShardedContext(ctx, _mesh())
    sctx.step(20)
    np.testing.assert_allclose(np.asarray(sctx.state.positions), ref_pos,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sctx.state.eta), ref_eta,
                               atol=1e-12)


@pytest.mark.slow
def test_sharded_distributed_fft_matches_plain():
    """Sharded pencil FFT (x-slab 2D FFT + all_to_all + 1D FFT) == the
    replicated-FFT reciprocal sum, including forces through autodiff."""
    ctx = _context(dn.NonbondedForce.PME)
    nb_fn = next(t[0] for t in ctx._terms if hasattr(t[0], "cellpair_cfg"))
    from openmm_drudenose_tpu.parallel import distfft
    import jax as _jax
    from jax.sharding import Mesh as _Mesh
    n_dev = next(n for n in (8, 4, 2)
                 if distfft.shardable(nb_fn.pme_setup.grid, n)
                 and nb_fn.cellpair_cfg.n_cells % n == 0)
    mesh = _Mesh(np.array(_jax.devices()[:n_dev]), ("atom",))
    eaf = sharded.make_sharded_energy_and_forces(ctx, mesh,
                                                 distributed_fft=True)
    st = ctx._state
    with mesh:
        pe_s, f_s = jax.jit(eaf)(st.positions, st.box, st.neighbors)
        pe_s, f_s = np.asarray(pe_s), np.asarray(f_s)
    pe, f = jax.jit(ctx._energy_and_forces)(st.positions, st.box,
                                            st.neighbors)
    np.testing.assert_allclose(pe_s, float(pe), rtol=1e-10)
    scale = np.abs(np.asarray(f)).max()
    np.testing.assert_allclose(f_s, np.asarray(f), atol=1e-8 * scale)
