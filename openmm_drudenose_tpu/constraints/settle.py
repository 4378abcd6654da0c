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

All internal math runs in (3, S) lane-major layout — a trailing size-3
axis on ~20k-cluster elementwise chains pads TPU lanes 3 -> 128 (CLAUDE.md
perf rules); the 3x3 solves are batched over bare (S,) scalars.

Cross-checked against the converged Jacobi solution in
tests/test_constraints.py.
"""

from __future__ import annotations

import jax.numpy as jnp

NEWTON_ITERS = 6


def _uniform_cols(xt, uniform):
    """(3, N) -> three (3, S) strided-slice columns for the uniform
    one-triangle-per-K-atom-residue layout (StaticSpec.settle_uniform):
    replaces the random (3, S) gathers, which cost ~40x a linear pass on
    v5e (CLAUDE.md perf rules)."""
    K, qa, qb, qc = uniform
    S = xt.shape[1] // K
    r = xt.reshape(3, S, K)
    return r[:, :, qa], r[:, :, qb], r[:, :, qc]


def _uniform_add(target, corr_abc, uniform):
    """Add per-role (3, S) corrections back into the per-atom (N, 3) array
    as a stack-reshape (no gather, no scatter)."""
    K, qa, qb, qc = uniform
    S = corr_abc[0].shape[1]
    zero = jnp.zeros_like(corr_abc[0])
    cols = []
    for k in range(K):
        if k == qa:
            cols.append(corr_abc[0])
        elif k == qb:
            cols.append(corr_abc[1])
        elif k == qc:
            cols.append(corr_abc[2])
        else:
            cols.append(zero)
    add = jnp.stack(cols, axis=2).reshape(3, S * K)
    return target + add.T



def _dot_t(a, b):
    """Row dot of (3, S) arrays -> (S,)."""
    return jnp.sum(a * b, axis=0)


def _solve33_s(J, f):
    """Solve the batched 3x3 system via the adjugate (analytic).

    J: 3x3 nested tuple of (S,) entries; f: 3-tuple of (S,).
    Returns a 3-tuple of (S,)."""
    (a, b, c), (d, e, g), (h, i, j) = J
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
    x0 = (A * f[0] + D * f[1] + G * f[2]) * inv_det
    x1 = (B * f[0] + E * f[1] + H * f[2]) * inv_det
    x2 = (C * f[0] + F * f[1] + I * f[2]) * inv_det
    return x0, x1, x2


def _coef_matrix(wa, wb, wc):
    """C[k][j]: coefficient of lambda_j u_j in bond vector k
    (k,j in {ab, ac, bc}); entries (S,)."""
    return ((wa + wb, wa, -wb),
            (wa, wa + wc, wc),
            (-wb, wc, wb + wc))


def _apply_corrections_t(target, corr_abc, settle_gather):
    """Add per-role (3, S) cluster corrections to the per-atom (N, 3) array
    without a scatter: rows are fetched through the precomputed
    atom -> (role, cluster) gather table (spec.settle_gather; roles are
    disjoint by construction)."""
    if settle_gather is None:
        return None
    flat = jnp.concatenate(list(corr_abc)
                           + [jnp.zeros((3, 1), corr_abc[0].dtype)], axis=1)
    return target + flat[:, settle_gather].T


def apply_position_constraints(positions, delta, inv_mass, settle_idx,
                               settle_dist, settle_gather=None,
                               uniform=()):
    """Adjust `delta` so positions+delta satisfies the triangle constraints
    (positions must satisfy them already — they supply the SHAKE reference
    directions).  `uniform` (StaticSpec.settle_uniform): strided-slice
    fast path for one-triangle-per-residue uniform layouts."""
    if settle_idx.shape[0] == 0:
        return delta
    d2 = (settle_dist[:, 0] ** 2, settle_dist[:, 0] ** 2,
          settle_dist[:, 1] ** 2)

    pos_t = positions.T
    del_t = delta.T
    if uniform:
        K_u = uniform[0]
        wm = inv_mass.reshape(-1, K_u)
        wa, wb, wc = (wm[:, uniform[1]], wm[:, uniform[2]],
                      wm[:, uniform[3]])
        pa, pb, pc = _uniform_cols(pos_t, uniform)
        da, db, dc = _uniform_cols(del_t, uniform)
    else:
        ia, ib, ic = settle_idx[:, 0], settle_idx[:, 1], settle_idx[:, 2]
        wa = inv_mass[ia]
        wb = inv_mass[ib]
        wc = inv_mass[ic]
        pa, pb, pc = pos_t[:, ia], pos_t[:, ib], pos_t[:, ic]
        da, db, dc = del_t[:, ia], del_t[:, ib], del_t[:, ic]
    u = [pa - pb, pa - pc, pb - pc]            # reference bond directions
    qa = pa + da
    qb = pb + db
    qc = pc + dc
    r0 = [qa - qb, qa - qc, qb - qc]           # unconstrained bond vectors
    C = _coef_matrix(wa, wb, wc)

    zero = jnp.zeros(settle_idx.shape[0], positions.dtype)
    lam = (zero, zero, zero)
    for _ in range(NEWTON_ITERS):
        r = [r0[k] + sum(C[k][j] * lam[j] * u[j] for j in range(3))
             for k in range(3)]
        f = tuple(_dot_t(r[k], r[k]) - d2[k] for k in range(3))
        J = tuple(tuple(2.0 * C[k][j] * _dot_t(r[k], u[j])
                        for j in range(3)) for k in range(3))
        dx = _solve33_s(J, f)
        lam = tuple(lam[k] - dx[k] for k in range(3))

    la, lb, lc = lam
    corr = (wa * (la * u[0] + lb * u[1]),
            wb * (-la * u[0] + lc * u[2]),
            wc * (-lb * u[1] - lc * u[2]))
    if uniform:
        return _uniform_add(delta, corr, uniform)
    out = _apply_corrections_t(delta, corr, settle_gather)
    if out is not None:
        return out
    delta = delta.at[ia].add(corr[0].T)
    delta = delta.at[ib].add(corr[1].T)
    delta = delta.at[ic].add(corr[2].T)
    return delta


def apply_velocity_constraints(positions, velocities, inv_mass, settle_idx,
                               settle_dist, settle_gather=None,
                               uniform=()):
    """Exact (single 3x3 solve) velocity projection: bond-direction relative
    velocities are zeroed."""
    if settle_idx.shape[0] == 0:
        return velocities
    pos_t = positions.T
    vel_t = velocities.T
    if uniform:
        K_u = uniform[0]
        wm = inv_mass.reshape(-1, K_u)
        wa, wb, wc = (wm[:, uniform[1]], wm[:, uniform[2]],
                      wm[:, uniform[3]])
        pa, pb, pc = _uniform_cols(pos_t, uniform)
        va, vb_, vc = _uniform_cols(vel_t, uniform)
    else:
        ia, ib, ic = settle_idx[:, 0], settle_idx[:, 1], settle_idx[:, 2]
        wa = inv_mass[ia]
        wb = inv_mass[ib]
        wc = inv_mass[ic]
        pa, pb, pc = pos_t[:, ia], pos_t[:, ib], pos_t[:, ic]
        va, vb_, vc = vel_t[:, ia], vel_t[:, ib], vel_t[:, ic]
    u = [pa - pb, pa - pc, pb - pc]            # current bond vectors
    v = [va - vb_, va - vc, vb_ - vc]
    C = _coef_matrix(wa, wb, wc)

    f = tuple(-_dot_t(u[k], v[k]) for k in range(3))
    J = tuple(tuple(C[k][j] * _dot_t(u[k], u[j]) for j in range(3))
              for k in range(3))
    la, lb, lc = _solve33_s(J, f)

    corr = (wa * (la * u[0] + lb * u[1]),
            wb * (-la * u[0] + lc * u[2]),
            wc * (-lb * u[1] - lc * u[2]))
    if uniform:
        return _uniform_add(velocities, corr, uniform)
    out = _apply_corrections_t(velocities, corr, settle_gather)
    if out is not None:
        return out
    velocities = velocities.at[ia].add(corr[0].T)
    velocities = velocities.at[ib].add(corr[1].T)
    velocities = velocities.at[ic].add(corr[2].T)
    return velocities
