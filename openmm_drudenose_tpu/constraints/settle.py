"""Direct (non-iterative-loop) constraint solver for rigid triangles (water).

Replaces the Jacobi SHAKE sweep for 3-constraint clusters with a fixed
6-iteration vectorized Newton solve on the three Lagrange multipliers —
quadratically convergent to machine precision, no lax.while_loop, ~100
flops/cluster/iteration of fused elementwise math plus an analytic 3x3
inverse.  (At 100k atoms the Jacobi while_loop was ~60% of step time.)

This computes exactly the SHAKE/SETTLE solution: corrections along the
pre-step bond directions, coefficients from the Lagrange conditions
(Miyamoto & Kollman's SETTLE is the closed-form of the same system; Newton
on 3 unknowns is equally exact and much harder to get wrong).

The velocity constraint problem is linear, so it is solved exactly with a
single 3x3 solve per cluster.

Cross-checked against the converged Jacobi solution in
tests/test_constraints.py.
"""

from __future__ import annotations

import jax.numpy as jnp

NEWTON_ITERS = 6


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _solve33(J, f):
    """Solve J x = f for batched 3x3 J via the adjugate (analytic)."""
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, g = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    h, i, j = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    A = e * j - g * i
    B = -(d * j - g * h)
    C = d * i - e * h
    D = -(b * j - c * i)
    E = a * j - c * h
    F = -(a * i - b * h)
    G = b * g - c * e
    H = -(a * g - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    x0 = (A * f[..., 0] + D * f[..., 1] + G * f[..., 2]) * inv_det
    x1 = (B * f[..., 0] + E * f[..., 1] + H * f[..., 2]) * inv_det
    x2 = (C * f[..., 0] + F * f[..., 1] + I * f[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def _coef_matrix(wa, wb, wc):
    """C[k][j]: coefficient of lambda_j u_j in bond vector k
    (k,j in {ab, ac, bc})."""
    return ((wa + wb, wa, -wb),
            (wa, wa + wc, wc),
            (-wb, wc, wb + wc))


def _apply_corrections(target, corr_abc, settle_gather):
    """Add per-role cluster corrections to the per-atom array without a
    scatter: rows are fetched through the precomputed atom -> (role, cluster)
    gather table (spec.settle_gather; roles are disjoint by construction)."""
    if settle_gather is None:
        # fallback: index-based scatter (unique indices)
        return None
    flat = jnp.concatenate(list(corr_abc)
                           + [jnp.zeros((1, 3), corr_abc[0].dtype)])
    return target + flat[settle_gather]


def apply_position_constraints(positions, delta, inv_mass, settle_idx,
                               settle_dist, settle_gather=None):
    """Adjust `delta` so positions+delta satisfies the triangle constraints
    (positions must satisfy them already — they supply the SHAKE reference
    directions)."""
    if settle_idx.shape[0] == 0:
        return delta
    ia, ib, ic = settle_idx[:, 0], settle_idx[:, 1], settle_idx[:, 2]
    wa = inv_mass[ia][:, None]
    wb = inv_mass[ib][:, None]
    wc = inv_mass[ic][:, None]
    d2 = jnp.stack([settle_dist[:, 0], settle_dist[:, 0],
                    settle_dist[:, 1]], axis=1) ** 2  # (S, 3)

    pa, pb, pc = positions[ia], positions[ib], positions[ic]
    u = [pa - pb, pa - pc, pb - pc]            # reference bond directions
    qa = pa + delta[ia]
    qb = pb + delta[ib]
    qc = pc + delta[ic]
    r0 = [qa - qb, qa - qc, qb - qc]           # unconstrained bond vectors
    C = _coef_matrix(wa, wb, wc)

    lam = jnp.zeros((settle_idx.shape[0], 3), positions.dtype)
    for _ in range(NEWTON_ITERS):
        r = [r0[k] + sum(C[k][j] * lam[:, j:j + 1] * u[j] for j in range(3))
             for k in range(3)]
        f = jnp.stack([_dot(r[k], r[k]) for k in range(3)], axis=1) - d2
        J = jnp.stack([
            jnp.stack([2.0 * C[k][j][:, 0] * _dot(r[k], u[j])
                       for j in range(3)], axis=1)
            for k in range(3)], axis=1)        # (S, 3, 3)
        lam = lam - _solve33(J, f)

    la, lb, lc = lam[:, 0:1], lam[:, 1:2], lam[:, 2:3]
    corr = (wa * (la * u[0] + lb * u[1]),
            wb * (-la * u[0] + lc * u[2]),
            wc * (-lb * u[1] - lc * u[2]))
    out = _apply_corrections(delta, corr, settle_gather)
    if out is not None:
        return out
    delta = delta.at[ia].add(corr[0])
    delta = delta.at[ib].add(corr[1])
    delta = delta.at[ic].add(corr[2])
    return delta


def apply_velocity_constraints(positions, velocities, inv_mass, settle_idx,
                               settle_dist, settle_gather=None):
    """Exact (single 3x3 solve) velocity projection: bond-direction relative
    velocities are zeroed."""
    if settle_idx.shape[0] == 0:
        return velocities
    ia, ib, ic = settle_idx[:, 0], settle_idx[:, 1], settle_idx[:, 2]
    wa = inv_mass[ia][:, None]
    wb = inv_mass[ib][:, None]
    wc = inv_mass[ic][:, None]

    pa, pb, pc = positions[ia], positions[ib], positions[ic]
    va, vb_, vc = velocities[ia], velocities[ib], velocities[ic]
    u = [pa - pb, pa - pc, pb - pc]            # current bond vectors
    v = [va - vb_, va - vc, vb_ - vc]
    C = _coef_matrix(wa, wb, wc)

    f = jnp.stack([_dot(u[k], v[k]) for k in range(3)], axis=1)
    J = jnp.stack([
        jnp.stack([C[k][j][:, 0] * _dot(u[k], u[j]) for j in range(3)],
                  axis=1)
        for k in range(3)], axis=1)
    lam = _solve33(J, -f)

    la, lb, lc = lam[:, 0:1], lam[:, 1:2], lam[:, 2:3]
    corr = (wa * (la * u[0] + lb * u[1]),
            wb * (-la * u[0] + lc * u[2]),
            wc * (-lb * u[1] - lc * u[2]))
    out = _apply_corrections(velocities, corr, settle_gather)
    if out is not None:
        return out
    velocities = velocities.at[ia].add(corr[0])
    velocities = velocities.at[ib].add(corr[1])
    velocities = velocities.at[ic].add(corr[2])
    return velocities
