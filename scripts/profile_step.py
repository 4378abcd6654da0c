#!/usr/bin/env python
"""Per-component timing of the 100k-atom benchmark step on the current
device: full step, block sweep (energy+forces), PME reciprocal (fwd and
grad), exceptions, kinematics-only step.  Guides the perf work — run on the
real TPU."""

import argparse
import os
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
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--full-stencil", action="store_true",
                   help="row-sum-only full-stencil sweep (no reactions)")
    p.add_argument("--equil", type=int, default=0,
                   help="equilibration steps before profiling (the lattice "
                        "start's uniform cell occupancy understates the "
                        "liquid's layer-max slot bounds)")
    p.add_argument("--sweep-only", action="store_true")
    p.add_argument("--pallas2", action="store_true",
                   help="use the Pallas v2 force-only sweep kernel")
    args = p.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.integrators import tgnh

    n_mol = args.atoms // 5
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    if args.full_stencil:
        ctx._nb_kwargs = {"allow_half": False}
        ctx._build_potential()
    if args.pallas2:
        ctx._nb_kwargs = {"use_pallas": 2}
        ctx._build_potential()
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    if args.equil:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        ctx, integ = bench.equilibrate(ctx, integ, args.atoms, "single",
                                       args.equil)
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state
    cfg = ctx._cp_cfg
    print(f"atoms={static.n_atoms} grid={cfg.grid} capacity={cfg.capacity} "
          f"n_offsets={cfg.n_offsets} half={cfg.half_stencil}")

    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    pme = nb_fn.pme_setup
    print(f"pme grid={pme.grid} alpha={pme.alpha:.3f}")

    box_diag = jnp.diagonal(st.box)

    if args.sweep_only:
        from openmm_drudenose_tpu.forces import cellpair as cp

        def sweep_scan(positions):
            def body(p, _):
                e, f = cp.pair_energy_forces(
                    nb_params, p, box_diag, st.neighbors, cfg,
                    nb_fn.pair_eg, nb_fn.coulomb_scale)
                return p + 0.0 * f, e
            _, es = jax.lax.scan(body, positions, None, length=8)
            return es
        t = timeit(jax.jit(sweep_scan), st.positions, n=3)
        print(f"block sweep (e+f)    : {t / 8:8.2f} ms (8-sweep scan)")
        return

    # the in-step sweep alone (Pallas kernel when enabled)
    def sf_scan(positions):
        def body(p, _):
            f = nb_fn.sweep_forces(nb_params, p, box_diag, st.neighbors)
            return p + 0.0 * f, None
        p, _ = jax.lax.scan(body, positions, None, length=8)
        return p
    t = timeit(jax.jit(sf_scan), st.positions, n=3)
    print(f"in-step sweep forces : {t / 8:8.2f} ms (8-scan)")

    # forces-only pass (what the step actually runs)
    if ctx._forces_only is not None:
        def fo_scan(positions):
            def body(p, _):
                f = ctx._forces_only(p, st.box, st.neighbors, st.pos_err)
                return p + 0.0 * f, None
            p, _ = jax.lax.scan(body, positions, None, length=8)
            return p
        t = timeit(jax.jit(fo_scan), st.positions, n=3)
        print(f"forces-only pass     : {t / 8:8.2f} ms (8-scan)")

    # full multi-step (per-step cost amortizing dispatch), force-only path
    multi = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces,
                                         args.steps,
                                         forces_fn=ctx._forces_only))
    t = timeit(lambda: multi(spec, st), n=3)
    print(f"full step            : {t / args.steps:8.2f} ms/step "
          f"({args.steps}-step scan)")

    # the production step fn (in-scan rebuild included)
    prod = ctx._get_step_fn(args.steps)
    t = timeit(lambda: prod(spec, st), n=3)
    print(f"production step      : {t / args.steps:8.2f} ms/step "
          f"({args.steps}-step scan, in-scan rebuilds)")

    # energy+forces (the whole force pass incl. vsites + autodiff)
    def eaf_scan(positions):
        def body(p, _):
            pe, f = ctx._energy_and_forces(p, st.box, st.neighbors, st.pos_err)
            return p + 0.0 * f, pe
        _, es = jax.lax.scan(body, positions, None, length=8)
        return es
    eaf = jax.jit(eaf_scan)
    t = timeit(eaf, st.positions, n=3)
    print(f"energy+forces        : {t / 8:8.2f} ms (8-eaf scan)")

    # sweep alone: fwd (energy+forces in one pass), scan-chained so the
    # per-call dispatch floor is amortized like the real step
    from openmm_drudenose_tpu.forces import cellpair as cp

    def sweep_scan(positions):
        def body(p, _):
            e, f = cp.pair_energy_forces(
                nb_params, p, box_diag, st.neighbors, cfg,
                nb_fn.pair_eg, nb_fn.coulomb_scale)
            return p + 0.0 * f, e
        _, es = jax.lax.scan(body, positions, None, length=8)
        return es
    sweep = jax.jit(sweep_scan)
    t = timeit(sweep, st.positions, n=3)
    print(f"block sweep (e+f)    : {t / 8:8.2f} ms (8-sweep scan)")

    # PME reciprocal (the pencil path the step actually uses), scan-chained
    if pme.cell_grid is not None:
        recip = lambda p: pme.reciprocal_energy_sorted(
            nb_params["charge"], p, box_diag, st.neighbors, cfg.capacity)
    else:
        recip = lambda p: pme.reciprocal_energy(
            nb_params["charge"], p, box_diag)

    def recip_scan(positions):
        def body(p, _):
            return p + 0.0 * recip(p), None
        p, _ = jax.lax.scan(body, positions, None, length=8)
        return p
    t = timeit(jax.jit(recip_scan), st.positions, n=3)
    print(f"pme recip (energy)   : {t / 8:8.2f} ms (8-scan)")

    def recipg_scan(positions):
        def body(p, _):
            return p + 0.0 * jax.grad(recip)(p), None
        p, _ = jax.lax.scan(body, positions, None, length=8)
        return p
    t = timeit(jax.jit(recipg_scan), st.positions, n=3)
    print(f"pme recip (e+grad)   : {t / 8:8.2f} ms (8-scan)")

    # extras (exceptions, self, dispersion) e+grad
    extras_g = jax.jit(lambda pos: jax.value_and_grad(
        lambda p: nb_fn.extras_energy(nb_params, p, st.box))(pos))
    t = timeit(extras_g, st.positions)
    print(f"extras (e+grad)      : {t:8.2f} ms")

    # kinematics-only step (force pass replaced by cached forces)
    fake_eaf = lambda pos, box, nbl, err=None: (st.potential_energy, st.forces)
    kin = jax.jit(tgnh.make_multi_step(static, fake_eaf, args.steps))
    t = timeit(lambda: kin(spec, st), n=3)
    print(f"kinematics-only step : {t / args.steps:8.2f} ms/step")

    # neighbor rebuild
    nbl_fn = jax.jit(ctx._neighbor_fn)
    t = timeit(nbl_fn, st.positions, st.box)
    print(f"cellsort rebuild     : {t:8.2f} ms (every "
          f"{cfg.rebuild_interval} steps)")


if __name__ == "__main__":
    main()
