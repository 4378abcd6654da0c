"""f32 Drude fidelity via two-float compensated positions (SimState.pos_err).

Mechanism test: at |position| ~ 8 nm an f32 coordinate grid is ~1e-6 nm, so
a 0.01 nm Drude-parent displacement carries only ~1e-4 relative precision —
enough quantization noise to heat a 1 K Drude bath by ~0.3 K (round-1
measurement).  The compensated update keeps the dropped bits in pos_err;
the spring term and hard wall consume them.  This test pins the
deterministic half of the fix: compensated f32 spring energies/forces track
the f64 ground truth ~100x closer than raw f32 at a far-from-origin site.
"""

import jax
import jax.numpy as jnp
import numpy as np

import openmm_drudenose_tpu as dn


def _pair_system(origin):
    system = dn.System()
    system.addParticle(15.6)
    system.addParticle(0.4)
    dr = dn.DrudeForce()
    # charge/polarizability give k3 = ONE_4PI_EPS0 q^2 / alpha
    dr.addParticle(1, 0, -1, -1, -1, -1.0, 1e-3, 1, 1)
    system.addForce(dr)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    pos = np.array([[0.0, 0.0, 0.0], [1.234567e-3, -2.34567e-3, 3.456789e-3]])
    return system, integ, pos + np.asarray(origin)


def test_compensated_spring_tracks_f64():
    origin = [8.1234567, 7.6543219, 9.2837465]
    system, integ, pos = _pair_system(origin)

    ctx64 = dn.Context(system, integ, precision="double")
    ctx64.setPositions(pos)
    ctx64._ensure_forces()
    f64 = np.asarray(ctx64._state.forces, np.float64)
    e64 = float(ctx64._state.potential_energy)

    system2, integ2, _ = _pair_system(origin)
    ctx32 = dn.Context(system2, integ2, precision="single")
    ctx32.setPositions(pos)
    assert ctx32._state.pos_err is not None   # compensation active
    ctx32._ensure_forces()
    f32c = np.asarray(ctx32._state.forces, np.float64)
    e32c = float(ctx32._state.potential_energy)

    # raw f32 (compensation zeroed): the error the fix removes
    ctx32._state = ctx32._state._replace(
        pos_err=jnp.zeros_like(ctx32._state.pos_err))
    ctx32._forces_valid = False
    ctx32._ensure_forces()
    f32r = np.asarray(ctx32._state.forces, np.float64)

    scale = np.abs(f64).max()
    err_comp = np.abs(f32c - f64).max() / scale
    err_raw = np.abs(f32r - f64).max() / scale
    # compensated must be at least ~30x closer than raw f32 and below 1e-5
    assert err_comp < 1e-5, (err_comp, err_raw)
    assert err_comp * 30 < err_raw, (err_comp, err_raw)
    assert abs(e32c - e64) / abs(e64) < 1e-4


def test_pos_err_survives_steps_and_checkpoints():
    origin = [8.1234567, 7.6543219, 9.2837465]
    system, integ, pos = _pair_system(origin)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single")
    ctx.setPositions(pos)
    ctx.setVelocities(np.zeros((2, 3)))
    integ.step(25)
    st = ctx._state
    assert st.pos_err is not None
    assert np.all(np.isfinite(np.asarray(st.pos_err)))
    # err stays sub-ulp of the positions
    ulp = np.abs(np.asarray(st.positions)) * 1.2e-7 + 1e-12
    assert np.all(np.abs(np.asarray(st.pos_err)) <= 4 * ulp)
