"""Constraint solver tests: Jacobi SHAKE/RATTLE invariants and analytic
SETTLE vs the converged iterative solution."""

import jax.numpy as jnp
import numpy as np

from openmm_drudenose_tpu.constraints import settle, shake


def _water_cluster_arrays(n_waters=40, seed=0):
    rng = np.random.default_rng(seed)
    d_oh, d_hh = 0.09572, 0.15139
    pos = []
    idx = []
    for w in range(n_waters):
        origin = rng.uniform(0, 3, 3)
        # exact geometry, random orientation
        h = np.sqrt(d_oh**2 - (d_hh / 2) ** 2)
        local = np.array([[0, h, 0], [-d_hh / 2, 0, 0], [d_hh / 2, 0, 0]])
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w_, x, y, z = q
        rot = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y)],
            [2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x)],
            [2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)]])
        pos.append(local @ rot.T + origin)
        idx.append([3 * w, 3 * w + 1, 3 * w + 2])
    positions = jnp.asarray(np.concatenate(pos))
    inv_mass = jnp.asarray(np.tile([1 / 15.6, 1.0, 1.0], n_waters))
    settle_idx = jnp.asarray(np.array(idx, np.int32))
    settle_dist = jnp.asarray(np.tile([[d_oh, d_hh]], (n_waters, 1)))
    shake_idx = jnp.asarray(np.concatenate([
        np.stack([settle_idx[:, 0], settle_idx[:, 1]], 1),
        np.stack([settle_idx[:, 0], settle_idx[:, 2]], 1),
        np.stack([settle_idx[:, 1], settle_idx[:, 2]], 1)]))
    shake_dist = jnp.asarray(np.concatenate([
        np.full(n_waters, d_oh), np.full(n_waters, d_oh),
        np.full(n_waters, d_hh)]))
    return (positions, inv_mass, settle_idx, settle_dist, shake_idx,
            shake_dist, d_oh, d_hh)


def _check_distances(pos, settle_idx, d_oh, d_hh, tol):
    p = np.asarray(pos)
    si = np.asarray(settle_idx)
    for (a, b, c) in si:
        np.testing.assert_allclose(np.linalg.norm(p[a] - p[b]), d_oh, rtol=tol)
        np.testing.assert_allclose(np.linalg.norm(p[a] - p[c]), d_oh, rtol=tol)
        np.testing.assert_allclose(np.linalg.norm(p[b] - p[c]), d_hh, rtol=tol)


def test_settle_positions_exact():
    (pos, inv_mass, si, sd, ki, kd, d_oh, d_hh) = _water_cluster_arrays()
    rng = np.random.default_rng(1)
    delta = jnp.asarray(rng.normal(0, 0.005, pos.shape))
    out = settle.apply_position_constraints(pos, delta, inv_mass, si, sd)
    _check_distances(pos + out, si, d_oh, d_hh, 1e-10)
    # momentum of the correction is zero (constraint forces are internal)
    m = 1.0 / np.asarray(inv_mass)
    dp = np.asarray(out - delta) * m[:, None]
    per_mol = dp.reshape(-1, 3, 3).sum(axis=1)
    np.testing.assert_allclose(per_mol, 0.0, atol=1e-12)


def test_settle_matches_converged_shake():
    (pos, inv_mass, si, sd, ki, kd, d_oh, d_hh) = _water_cluster_arrays(seed=3)
    rng = np.random.default_rng(2)
    delta = jnp.asarray(rng.normal(0, 0.002, pos.shape))
    out_settle = settle.apply_position_constraints(pos, delta, inv_mass,
                                                   si, sd)
    out_shake = shake.apply_position_constraints(pos, delta, inv_mass, ki,
                                                 kd, 1e-12, 2000)
    np.testing.assert_allclose(np.asarray(out_settle),
                               np.asarray(out_shake), atol=5e-8)


def test_settle_velocities_exact():
    (pos, inv_mass, si, sd, ki, kd, d_oh, d_hh) = _water_cluster_arrays(seed=5)
    rng = np.random.default_rng(4)
    vel = jnp.asarray(rng.normal(0, 1.0, pos.shape))
    out = settle.apply_velocity_constraints(pos, vel, inv_mass, si, sd)
    p = np.asarray(pos)
    v = np.asarray(out)
    ki_np = np.asarray(ki)
    kd_np = np.asarray(kd)
    # bond-direction relative velocities vanish
    r = p[ki_np[:, 0]] - p[ki_np[:, 1]]
    rv = np.sum(r * (v[ki_np[:, 0]] - v[ki_np[:, 1]]), axis=1)
    np.testing.assert_allclose(rv, 0.0, atol=1e-10)
    # matches the iterative RATTLE solution (the problem is linear)
    out_it = shake.apply_velocity_constraints(pos, vel, inv_mass, ki, kd,
                                              1e-13, 3000)
    np.testing.assert_allclose(v, np.asarray(out_it), atol=1e-7)


def test_shake_general_pair():
    """A non-triangle constraint cluster handled by Jacobi SHAKE."""
    pos = jnp.asarray(np.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0.01, 0]]))
    inv_mass = jnp.asarray(np.array([1.0, 1.0, 0.5]))
    idx = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    dist = jnp.asarray(np.array([0.1, np.linalg.norm([0.1, 0.01, 0])]))
    rng = np.random.default_rng(0)
    delta = jnp.asarray(rng.normal(0, 0.004, (3, 3)))
    out = shake.apply_position_constraints(pos, delta, inv_mass, idx, dist,
                                           1e-10, 500)
    p = np.asarray(pos + out)
    np.testing.assert_allclose(np.linalg.norm(p[0] - p[1]), 0.1, rtol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(p[1] - p[2]),
                               float(dist[1]), rtol=1e-8)


def test_settle_uniform_matches_gather():
    """The strided-slice uniform SETTLE path (StaticSpec.settle_uniform)
    must reproduce the gather-table path exactly."""
    import numpy as np
    import jax.numpy as jnp

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.constraints import settle
    from openmm_drudenose_tpu.io import builders

    system, positions = builders.build_water_box(30)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    ctx = dn.Context(system, integ, precision="double")
    spec, static = ctx._spec, ctx._static
    assert static.settle_uniform, "SWM4 water must enable the fast path"
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-10)
    pos = ctx._state.positions
    rng = np.random.default_rng(3)
    delta = jnp.asarray(rng.normal(0, 0.004, pos.shape))
    a = settle.apply_position_constraints(
        pos, delta, spec.inv_mass, spec.settle_idx, spec.settle_dist,
        spec.settle_gather, uniform=static.settle_uniform)
    b = settle.apply_position_constraints(
        pos, delta, spec.inv_mass, spec.settle_idx, spec.settle_dist,
        spec.settle_gather)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)

    vel = jnp.asarray(rng.normal(0, 0.5, pos.shape))
    av = settle.apply_velocity_constraints(
        pos, vel, spec.inv_mass, spec.settle_idx, spec.settle_dist,
        spec.settle_gather, uniform=static.settle_uniform)
    bv = settle.apply_velocity_constraints(
        pos, vel, spec.inv_mass, spec.settle_idx, spec.settle_dist,
        spec.settle_gather)
    np.testing.assert_allclose(np.asarray(av), np.asarray(bv), atol=1e-13)
