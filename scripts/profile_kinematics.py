#!/usr/bin/env python
"""Per-component timing of the kinematics (non-force) step work at the
benchmark size: NH half-step pieces, constraints, hard wall, vsites,
kicks.  All probes scan-chained (30 ms dispatch floor otherwise).  Run on
the real TPU."""

import argparse
import os
import sys
import time

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=100000)
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.constraints import settle
    from openmm_drudenose_tpu.constraints.vsites import apply_vsites
    from openmm_drudenose_tpu.integrators import tgnh
    from openmm_drudenose_tpu.io import builders

    system, positions = builders.build_water_box(args.atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state
    accum = st.eta.dtype
    dt = spec.dt.astype(st.positions.dtype)

    def chain(body):
        def run(v):
            def f(x, _):
                return body(x), None
            out, _ = jax.lax.scan(f, v, None, length=8)
            return out
        return jax.jit(run)

    # group KEs (COM reduction + pair split + masked sums)
    f = chain(lambda v: v + 0.0 * tgnh.group_kinetic_energies(
        spec, static, v, accum)[2])
    print(f"group KEs            : {timeit(f, st.velocities) / 8:7.2f} ms")

    # NH chain fori (MTS loop on (G+2)-vectors)
    ke0, cv, nv = tgnh.group_kinetic_energies(spec, static, st.velocities,
                                              accum)

    def nh_only(carry):
        eta, eta_dot, eta_dot_dot = carry
        vs, eta, eta_dot, eta_dot_dot = tgnh.propagate_nh_chain(
            spec, static, ke0, eta, eta_dot, eta_dot_dot, spec.dt)
        return (eta, eta_dot, eta_dot_dot)
    f = chain(nh_only)
    t = timeit(f, (st.eta, st.eta_dot, st.eta_dot_dot))
    print(f"NH chain (MTS fori)  : {t / 8:7.2f} ms")

    # vscale
    f = chain(lambda v: tgnh.apply_vscale(
        spec, static, v, cv, nv, jnp.ones_like(ke0)))
    print(f"apply_vscale         : {timeit(f, st.velocities) / 8:7.2f} ms")

    # half kick
    f = chain(lambda v: tgnh.half_kick(spec, static, v, st.forces, dt))
    print(f"half_kick            : {timeit(f, st.velocities) / 8:7.2f} ms")

    # settle position + velocity
    if static.n_settle:
        f = chain(lambda d: settle.apply_position_constraints(
            st.positions, d, spec.inv_mass, spec.settle_idx,
            spec.settle_dist, spec.settle_gather,
            uniform=getattr(static, "settle_uniform", ())))
        t = timeit(f, dt * st.velocities)
        print(f"settle (positions)   : {t / 8:7.2f} ms")
        f = chain(lambda v: settle.apply_velocity_constraints(
            st.positions, v, spec.inv_mass, spec.settle_idx,
            spec.settle_dist, spec.settle_gather,
            uniform=getattr(static, "settle_uniform", ())))
        print(f"settle (velocities)  : {timeit(f, st.velocities) / 8:7.2f} ms")

    # hard wall
    if static.has_hardwall:
        def hw(pv):
            p, v = pv
            p2, v2, _ = tgnh.apply_hardwall(spec, static, p, v, dt,
                                            pos_err=st.pos_err)
            return (p2, v2)
        f = chain(hw)
        t = timeit(f, (st.positions, st.velocities))
        print(f"hard wall            : {t / 8:7.2f} ms")

    # vsites
    f = chain(lambda p: apply_vsites(spec, static, p))
    print(f"vsites               : {timeit(f, st.positions) / 8:7.2f} ms")


if __name__ == "__main__":
    main()
