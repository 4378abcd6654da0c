#!/usr/bin/env python
"""Decompose the flattened-ensemble step's NON-force tail at extended
shapes (R x n0 atoms as ONE system).

probe_flat.py sized the force side of the 64 x 4k flattened step
(forces_only ~85 ms of the ~122 ms step); this times each kinematics /
constraints / NH component at ext shapes, plus a dummy-forces multi-step
(the whole step minus the force pass), to locate the remaining tail.
Run on the real TPU."""

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

ITERS = 8


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
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_mol = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    tctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    tctx.setPositions(positions)
    tctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(200)

    ens = FlatReplicaEnsemble(tctx, n_replicas=R, seed=7)
    ens.setVelocitiesToTemperature(300.0, seed=3)
    ens.step(128)
    ctx = ens.context
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state
    accum = st.eta.dtype
    print(f"R={R} N={static.n_atoms} ensemble_r={static.ensemble_r}")

    vt0 = jnp.swapaxes(st.velocities, -1, -2)

    def t_v(label, f, x0):
        print(f"  {label:28s}: {timeit(chain(f, x0)):7.2f} ms")

    def ke_f(vt):
        ke, cv, nv = tgnh.group_kinetic_energies_t(spec, static, vt, accum)
        return vt + 0.0 * nv + 0.0 * ke[..., :1].sum()
    t_v("group KE", ke_f, vt0)

    ke0, cv0, nv0 = tgnh.group_kinetic_energies_t(spec, static, vt0, accum)

    def nh_f(ke):
        vs, *_ = tgnh.propagate_nh_chain(spec, static, ke, st.eta,
                                         st.eta_dot, st.eta_dot_dot, spec.dt)
        return ke + 0.0 * vs
    t_v("NH chain propagate", nh_f, ke0)

    def vscale_f(vt):
        out = tgnh.apply_vscale_t(spec, static, vt, cv0, nv0,
                                  jnp.ones_like(ke0))
        return vt + 0.0 * out
    t_v("apply_vscale", vscale_f, vt0)

    ft0 = jnp.swapaxes(st.forces, -1, -2)

    def kick_f(vt):
        out = tgnh.half_kick_t(spec, static, vt, ft0,
                               spec.dt.astype(vt.dtype))
        return vt + 0.0 * out
    t_v("half_kick", kick_f, vt0)

    if static.n_settle:
        def settle_f(p):
            d = settle.apply_position_constraints(
                p, spec.dt.astype(p.dtype) * st.velocities, spec.inv_mass,
                spec.settle_idx, spec.settle_dist, spec.settle_gather)
            return p + 0.0 * d
        t_v("settle positions", settle_f, st.positions)

        def settlev_f(p):
            v = settle.apply_velocity_constraints(
                p, st.velocities, spec.inv_mass, spec.settle_idx,
                spec.settle_dist, spec.settle_gather)
            return p + 0.0 * v
        t_v("settle velocities", settlev_f, st.positions)

    if static.has_hardwall and static.has_pairs:
        def hw_f(p):
            q, v, _ = tgnh.apply_hardwall(spec, static, p, st.velocities,
                                          spec.dt.astype(p.dtype),
                                          pos_err=st.pos_err)
            return p + 0.0 * q + 0.0 * v
        t_v("hardwall", hw_f, st.positions)

    def vs_f(p):
        return p + 0.0 * apply_vsites(spec, static, p)
    t_v("apply_vsites", vs_f, st.positions)

    # whole step minus the force pass: dummy forces_fn returns the cached
    # forces, so everything else (NH fused pair, kicks, constraints,
    # hardwall, vsites, CM removal) runs exactly as production
    multi_tail = jax.jit(tgnh.make_multi_step(
        static, ctx._energy_and_forces, 16,
        forces_fn=lambda p, b, nb, pe: st.forces))
    for _ in range(1):
        out = multi_tail(spec, st)
    jax.block_until_ready(out.positions)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = multi_tail(spec, st)
        jax.block_until_ready(out.positions)
        best = min(best, time.time() - t0)
    print(f"  {'multi-step, DUMMY forces':28s}: {best * 1e3 / 16:7.2f} "
          f"ms/step")


if __name__ == "__main__":
    main()
