#!/usr/bin/env python
"""Decompose the 64 x 4k-atom ensemble step's NON-force time.

probe_ensemble.py sized the force side (vmapped sweep 109 ms, full
energy+forces 131 ms of the 296 ms step); this probe times every
kinematics/constraints/NH component of the vmapped fused step body
individually, plus full multi-step variants (energy+forces vs
forces-only), to locate the remaining ~165 ms before building the
replica lane-fold.  Run on the real TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 4


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best * 1e3 / ITERS


def chain(f, x0):
    @jax.jit
    def run():
        def body(c, _):
            return f(c), None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out
    return run


def main():
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.constraints import settle
    from openmm_drudenose_tpu.constraints.vsites import apply_vsites
    from openmm_drudenose_tpu.integrators import tgnh
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.ensemble import replicate_state

    R = 64
    n_mol = 800
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(200)
    ctx._ensure_forces()
    spec, static, st0 = ctx._spec, ctx._static, ctx._state
    accum = st0.eta.dtype

    key = jax.random.PRNGKey(0)
    bst = replicate_state(st0._replace(neighbors=None), R, seed=1)
    bst = bst._replace(positions=bst.positions + 0.01 * jax.random.normal(
        key, bst.positions.shape, bst.positions.dtype))
    # per-replica neighbors
    nbl = jax.jit(jax.vmap(ctx._neighbor_fn))(bst.positions, bst.box)
    bst = bst._replace(neighbors=nbl)
    bvt = jnp.swapaxes(bst.velocities, -1, -2)  # (R, 3, N)

    def t_v(label, f, x0):
        print(f"  {label:28s}: {timeit(chain(f, x0)):7.2f} ms")

    print(f"R={R} n_atoms={static.n_atoms}")

    # --- kinematics pieces (all vmapped over the leading replica axis) ----
    def ke_f(vt):
        ke, cv, nv = jax.vmap(
            lambda v: tgnh.group_kinetic_energies_t(spec, static, v, accum)
        )(vt)
        return vt + 0.0 * nv
    t_v("group KE (1x)", ke_f, bvt)

    ke0, cv0, nv0 = jax.vmap(
        lambda v: tgnh.group_kinetic_energies_t(spec, static, v, accum))(bvt)
    eta, ed, edd = bst.eta, bst.eta_dot, bst.eta_dot_dot

    def nh_f(ke):
        vs, *_ = jax.vmap(lambda k, e, d, dd: tgnh.propagate_nh_chain(
            spec, static, k, e, d, dd, spec.dt))(ke, eta, ed, edd)
        return ke + 0.0 * vs
    t_v("NH chain propagate (1x)", nh_f, ke0)

    def vscale_f(vt):
        out = jax.vmap(lambda v, c, n, k: tgnh.apply_vscale_t(
            spec, static, v, c, n, jnp.ones_like(k)))(vt, cv0, nv0, ke0)
        return vt + 0.0 * out
    t_v("apply_vscale (1x)", vscale_f, bvt)

    bft = jnp.swapaxes(bst.forces, -1, -2)

    def kick_f(vt):
        out = jax.vmap(lambda v, f: tgnh.half_kick_t(
            spec, static, v, f, spec.dt.astype(v.dtype)))(vt, bft)
        return vt + 0.0 * out
    t_v("half_kick (1x)", kick_f, bvt)

    if static.n_settle:
        def settle_f(p):
            d = jax.vmap(lambda q, v: settle.apply_position_constraints(
                q, spec.dt.astype(q.dtype) * v, spec.inv_mass,
                spec.settle_idx, spec.settle_dist, spec.settle_gather)
            )(p, bst.velocities)
            return p + 0.0 * d
        t_v("settle positions (1x)", settle_f, bst.positions)

        def settlev_f(p):
            v = jax.vmap(lambda q, v: settle.apply_velocity_constraints(
                q, v, spec.inv_mass, spec.settle_idx, spec.settle_dist,
                spec.settle_gather))(p, bst.velocities)
            return p + 0.0 * v
        t_v("settle velocities (1x)", settlev_f, bst.positions)

    if static.has_hardwall and static.has_pairs:
        def hw_f(p):
            q, v, _ = jax.vmap(lambda pp, vv, ee: tgnh.apply_hardwall(
                spec, static, pp, vv, spec.dt.astype(pp.dtype), pos_err=ee)
            )(p, bst.velocities, bst.pos_err)
            return p + 0.0 * q + 0.0 * v
        t_v("hardwall (1x)", hw_f, bst.positions)

    def vs_f(p):
        q = jax.vmap(lambda pp: apply_vsites(spec, static, pp))(p)
        return p + 0.0 * q
    t_v("apply_vsites (1x)", vs_f, bst.positions)

    # --- full multi-step variants (per step; 16-step scans like the bench)
    for label, ffn in (("multi eaf (bench path)", None),
                       ("multi forces-only", ctx._forces_only)):
        multi = tgnh.make_multi_step(static, ctx._energy_and_forces, 16,
                                     forces_fn=ffn)
        vstep = jax.jit(jax.vmap(lambda s: multi(spec, s)))
        out = vstep(bst)
        jax.block_until_ready(out.positions)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = vstep(bst)
            jax.block_until_ready(out.positions)
            best = min(best, time.time() - t0)
        print(f"  {label:28s}: {best * 1e3 / 16:7.2f} ms/step")


if __name__ == "__main__":
    main()
