#!/usr/bin/env python
"""Where does the flattened 64 x 4k-atom ensemble step's time go?  Times
the embedded-grid components (one big rebuild, the ext sweep, the vmapped
per-replica PME reciprocal + its autodiff gradient, the full force pass,
the production multi-step) on the real TPU — sizing the next optimization
before building it."""

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
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.integrators import tgnh
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
    cfg = ctx._cp_cfg
    print(f"R={R} n0={n_mol * 5}: ext grid {cfg.grid} capacity "
          f"{cfg.capacity} n_yz {cfg.grid[1] * cfg.grid[2]} "
          f"pallas={'?'}")
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "sweep_forces"))
    boxd = jnp.diagonal(st.box)
    pos = st.positions
    cs = st.neighbors

    t = timeit(chain(lambda p: p + 0.0 * cp.build_cellsort(
        p, boxd, cfg).ref_positions[0], pos))
    print(f"ext rebuild (one argsort)   : {t:7.2f} ms")

    t = timeit(chain(lambda p: p + 0.0 * nb_fn.sweep_forces(
        nb_params, p, boxd, cs), pos))
    print(f"ext sweep forces            : {t:7.2f} ms")

    # the vmapped per-replica PME reciprocal: energy and its gradient
    # (the force-only step autodiffs rest_energy, which includes it)
    pme = nb_fn.pme_setup
    n0 = n_mol * 5

    R_int = static.n_atoms // n0   # internal replicas (padded layouts)

    def recip_e(p):
        q = nb_params["charge"].reshape(R_int, n0)
        pp = p.reshape(R_int, n0, 3)
        return jnp.sum(jax.vmap(
            lambda qq, xx: pme.reciprocal_energy(qq, xx, boxd))(q, pp))

    t = timeit(chain(lambda p: p + 0.0 * recip_e(p), pos))
    print(f"vmapped PME recip energy    : {t:7.2f} ms")
    t = timeit(chain(lambda p: p + 0.0 * jax.grad(recip_e)(p), pos))
    print(f"vmapped PME recip e+grad    : {t:7.2f} ms")

    def rest_grad(p):
        return jax.grad(lambda q: nb_fn.rest_energy(
            nb_params, q, st.box, cs))(p)
    t = timeit(chain(lambda p: p + 0.0 * rest_grad(p), pos))
    print(f"rest energy grad (all extras): {t:7.2f} ms")

    t = timeit(chain(lambda p: p + 0.0 * ctx._forces_only(
        p, st.box, cs, st.pos_err)[0], pos))
    print(f"full forces_only            : {t:7.2f} ms")

    # production multi-step (per step)
    multi = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, 16,
                                         forces_fn=ctx._forces_only))
    for _ in range(1):
        out = multi(spec, st)
    jax.block_until_ready(out.positions)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = multi(spec, st)
        jax.block_until_ready(out.positions)
        best = min(best, time.time() - t0)
    print(f"multi-step (16-scan)        : {best * 1e3 / 16:7.2f} ms/step")


if __name__ == "__main__":
    main()
