#!/usr/bin/env python
"""Where does the 64 x 4k-atom ensemble step's 296 ms go?  Times the
vmapped components separately (sweep forces, PME reciprocal, rebuild,
full multi-step) to size the replica lane-fold win before building it.
Run on the real TPU."""

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
    spec, static, st = ctx._spec, ctx._static, ctx._state
    cfg = ctx._cp_cfg
    print(f"grid {cfg.grid} capacity {cfg.capacity} n_yz "
          f"{cfg.grid[1] * cfg.grid[2]}")

    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "sweep_forces"))
    boxd = jnp.diagonal(st.box)

    # batched positions with per-replica jitter
    key = jax.random.PRNGKey(0)
    bpos = (st.positions[None] +
            0.01 * jax.random.normal(key, (R,) + st.positions.shape,
                                     st.positions.dtype))

    def rebuild_one(p):
        return cp.build_cellsort(p, boxd, cfg)

    vsort = jax.jit(jax.vmap(rebuild_one))
    cs_b = vsort(bpos)
    t_sort = timeit(chain(lambda p: p + 0.0 * jax.vmap(
        lambda q: cp.build_cellsort(q, boxd, cfg).ref_positions)(p)[0, 0, 0],
        bpos))
    print(f"vmapped cellsort rebuild : {t_sort:7.2f} ms")

    def sweep_b(p):
        f = jax.vmap(lambda q, cs: nb_fn.sweep_forces(nb_params, q, boxd,
                                                      cs))(p, cs_b)
        return p + 0.0 * f
    print(f"vmapped sweep forces     : {timeit(chain(sweep_b, bpos)):7.2f} ms")

    if nb_fn.pme_setup is not None:
        pme = nb_fn.pme_setup

        def recip_b(p):
            e = jax.vmap(lambda q, cs: pme.reciprocal_energy_sorted(
                nb_params["charge"], q, boxd, cs, cfg.capacity))(p, cs_b)
            return p + 0.0 * e[:, None, None]
        print(f"vmapped PME recip energy : "
              f"{timeit(chain(recip_b, bpos)):7.2f} ms")

    # full per-replica force evaluation (what the ensemble body calls)
    def eaf_b(p):
        pe, f = jax.vmap(lambda q, cs: ctx._energy_and_forces(
            q, st.box, cs, st.pos_err))(p, cs_b)
        return p + 0.0 * f
    print(f"vmapped energy+forces    : {timeit(chain(eaf_b, bpos)):7.2f} ms")


if __name__ == "__main__":
    main()
