#!/usr/bin/env python
"""Finer breakdown of the 100k-atom force pass and kinematics: times each
force term's value_and_grad separately, the vsite composition, and the
kinematics sub-phases.  Run on the real TPU."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

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


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atoms", type=int, default=100_000)
    args = p.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.constraints.vsites import apply_vsites
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.integrators import tgnh

    n_mol = args.atoms // 5
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state

    pos, box, nbl = st.positions, st.box, st.neighbors

    # each term's value_and_grad, with and without the vsite composition
    for fn, params in ctx._terms:
        name = getattr(fn, "__qualname__", str(fn))[:40]
        if getattr(fn, "needs_neighbors", False):
            e_fn = lambda p: fn(params, p, box, nbl)
        else:
            e_fn = lambda p: fn(params, p, box)
        t = timeit(jax.jit(jax.value_and_grad(e_fn)), pos)
        print(f"term {name:42s}: {t:8.2f} ms (e+grad, raw pos)")
        comp = jax.jit(jax.value_and_grad(
            lambda p: e_fn(apply_vsites(spec, static, p))))
        t = timeit(comp, pos)
        print(f"term {name:42s}: {t:8.2f} ms (e+grad, thru vsites)")

    # vsites alone: forward and a dummy grad through them
    vs = jax.jit(lambda p: apply_vsites(spec, static, p))
    print(f"vsites forward       : {timeit(vs, pos):8.2f} ms")
    vg = jax.jit(jax.grad(lambda p: jnp.sum(
        apply_vsites(spec, static, p) * 1.5)))
    print(f"vsites fwd+transpose : {timeit(vg, pos):8.2f} ms")

    # full composed eaf for reference
    eaf = jax.jit(ctx._energy_and_forces)
    print(f"full eaf             : {timeit(lambda: eaf(pos, box, nbl)):8.2f} ms")

    # kinematics sub-phases
    v = st.velocities
    a = st.eta.dtype
    ke_fn = jax.jit(lambda v: tgnh.group_kinetic_energies(spec, static, v, a))
    print(f"group KE + com/norm  : {timeit(ke_fn, v):8.2f} ms")
    ke, com_vel, norm_vel = ke_fn(v)
    nh = jax.jit(lambda ke: tgnh.propagate_nh_chain(
        spec, static, ke, st.eta, st.eta_dot, st.eta_dot_dot, spec.dt))
    print(f"NH chain (MTS loop)  : {timeit(nh, ke):8.2f} ms")
    vsc = jax.jit(lambda v: tgnh.apply_vscale(
        spec, static, v, com_vel, norm_vel, jnp.ones_like(ke)))
    print(f"apply vscale         : {timeit(vsc, v):8.2f} ms")
    kick = jax.jit(lambda v: tgnh.half_kick(spec, static, v, st.forces,
                                            spec.dt.astype(v.dtype)))
    print(f"half kick            : {timeit(kick, v):8.2f} ms")
    from openmm_drudenose_tpu.constraints import settle
    if static.n_settle:
        delta = jnp.zeros_like(pos)
        sc = jax.jit(lambda d: settle.apply_position_constraints(
            pos, d, spec.inv_mass, spec.settle_idx, spec.settle_dist))
        print(f"settle positions     : {timeit(sc, delta):8.2f} ms")
        sv = jax.jit(lambda v: settle.apply_velocity_constraints(
            pos, v, spec.inv_mass, spec.settle_idx, spec.settle_dist))
        print(f"settle velocities    : {timeit(sv, v):8.2f} ms")
    hw = jax.jit(lambda p, v: tgnh.apply_hardwall(
        spec, static, p, v, spec.dt.astype(p.dtype)))
    print(f"hard wall            : {timeit(hw, pos, v):8.2f} ms")


if __name__ == "__main__":
    main()
