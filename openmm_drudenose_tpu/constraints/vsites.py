"""Virtual-site position computation.

Positions of massless sites are pure functions of their parents
(ThreeParticleAverageSite used by SWM4-NDP water, reference test
Test*DrudeTGNHIntegrator.cpp:148).  The step calls this after moving real
particles (the reference calls integration.computeVirtualSites() at
CudaDrudeTGNHKernels.cpp:377).

Force redistribution needs no code at all: the energy function composes
apply_vsites with the potential, so autodiff pushes vsite forces onto the
parents by the chain rule — exactly the W^T F spreading OpenMM hand-codes.
"""

from __future__ import annotations

import jax.numpy as jnp


def spread_vsite_forces(spec, static, forces):
    """J^T of apply_vsites as pure gathers (scatter-free).

    Exact for systems whose vsites are ALL 2/3-particle averages (the
    Jacobian is a constant sparse matrix captured in spec.vs_spread_src /
    vs_spread_w at spec build); callers must fall back to jax.vjp when the
    tables are None (OOP / LocalCoordinates sites).  Matches the autodiff
    spread to roundoff (tests/test_vsite_spread.py); rows of massless
    average sites come out exactly zero — their force has been moved to
    the parents, the W^T F spreading OpenMM hand-codes."""
    src = spec.vs_spread_src
    w = spec.vs_spread_w
    out = w[:, 0, None] * forces[src[:, 0]]
    for k in range(1, src.shape[1]):
        out = out + w[:, k, None] * forces[src[:, k]]
    return out


def apply_vsites(spec, static, positions):
    if getattr(static, "vs_comp_shifts", ()) and spec.vs_comp_w is not None:
        # average-only systems: composition as static lane shifts in the
        # (3, N) layout — out[j] = sum_k w[k, j] * positions[j - d_k].
        # Replaces the (Va, 3, 3) trailing-axis gathers + row scatter
        # below (banned ops per the TPU perf rules; measured 14 ms -> VPU
        # streams at 1M atoms).  Non-vsite rows carry w = 1 at shift 0.
        pt = positions.T                                    # (3, N)
        w = spec.vs_comp_w.astype(positions.dtype)
        out = None
        for k, d in enumerate(static.vs_comp_shifts):
            src = pt if d == 0 else jnp.roll(pt, d, axis=1)
            term = w[k][None, :] * src
            out = term if out is None else out + term
        return out.T
    if static.n_vsites_avg:
        p = positions[spec.vs_avg_p]             # (Va, 3, 3)
        w = spec.vs_avg_w[:, :, None]            # (Va, 3, 1)
        positions = positions.at[spec.vs_avg_idx].set(jnp.sum(w * p, axis=1))
    if static.n_vsites_oop:
        p1 = positions[spec.vs_oop_p[:, 0]]
        p2 = positions[spec.vs_oop_p[:, 1]]
        p3 = positions[spec.vs_oop_p[:, 2]]
        r12 = p2 - p1
        r13 = p3 - p1
        w = spec.vs_oop_w
        site = (p1 + w[:, 0:1] * r12 + w[:, 1:2] * r13
                + w[:, 2:3] * jnp.cross(r12, r13))
        positions = positions.at[spec.vs_oop_idx].set(site)
    if static.n_vsites_lc:
        # LocalCoordinatesSite (OpenMM semantics; lone pairs of
        # CHARMM-Drude systems): weighted origin/axes, orthonormal frame
        p = positions[spec.vs_lc_p]                   # (Vl, K, 3)
        origin = jnp.sum(spec.vs_lc_ow[:, :, None] * p, axis=1)
        xdir = jnp.sum(spec.vs_lc_xw[:, :, None] * p, axis=1)
        ydir = jnp.sum(spec.vs_lc_yw[:, :, None] * p, axis=1)
        zdir = jnp.cross(xdir, ydir)
        xhat = xdir / jnp.linalg.norm(xdir, axis=-1, keepdims=True)
        zhat = zdir / jnp.linalg.norm(zdir, axis=-1, keepdims=True)
        yhat = jnp.cross(zhat, xhat)
        local = spec.vs_lc_local
        site = (origin + local[:, 0:1] * xhat + local[:, 1:2] * yhat
                + local[:, 2:3] * zhat)
        positions = positions.at[spec.vs_lc_idx].set(site)
    return positions
