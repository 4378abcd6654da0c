#!/usr/bin/env python
"""One-process TPU batch: Pallas-vs-XLA parity at 50k atoms, then the
100k-atom sweep timing and full-step timing.  Exists so an unstable
remote-TPU window can validate + measure a kernel change in a single
grab (separate processes each pay compile-service roulette)."""

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
    return best * 1e3


def build(n_atoms):
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(n_atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    return ctx, integ


def main():
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.integrators import tgnh
    from openmm_drudenose_tpu.ops import pallas_sweep

    # ---- parity at 50k ----------------------------------------------------
    ctx, integ = build(50_000)
    ctx._ensure_forces()
    integ.step(5)
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = nb_fn.cellpair_cfg
    st = ctx._state
    box_diag = jnp.diagonal(st.box)
    pme = nb_fn.pme_setup
    f_pal = jax.jit(lambda p: pallas_sweep.pair_forces_pallas(
        nb_params, p, box_diag, st.neighbors, cfg, "ewald",
        alpha=pme.alpha))(st.positions)
    _, f_xla = jax.jit(lambda p: cp.pair_energy_forces(
        nb_params, p, box_diag, st.neighbors, cfg, nb_fn.pair_eg,
        nb_fn.coulomb_scale, with_energy=False))(st.positions)
    f_pal, f_xla = np.asarray(f_pal), np.asarray(f_xla)
    err = np.abs(f_pal - f_xla).max() / np.abs(f_xla).max()
    print(f"parity 50k: rel err={err:.3e}")
    assert err < 1e-3, f"Pallas/XLA force mismatch {err}"
    print("PASS: Pallas sweep matches the XLA sweep on chip")

    # ---- timing at 100k ---------------------------------------------------
    import bench
    ctx, integ = build(100_000)
    ctx, integ = bench.equilibrate(ctx, integ, 100_000, "single", 1000)
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    box_diag = jnp.diagonal(st.box)

    def sf_scan(positions):
        def body(p, _):
            f = nb_fn.sweep_forces(nb_params, p, box_diag, st.neighbors)
            return p + 0.0 * f, None
        p, _ = jax.lax.scan(body, positions, None, length=8)
        return p
    t = timeit(jax.jit(sf_scan), st.positions)
    print(f"sweep forces (100k, equilibrated): {t / 8:7.2f} ms")

    multi = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, 64,
                                         forces_fn=ctx._forces_only))
    t = timeit(lambda: multi(spec, st))
    print(f"full step (64-scan)              : {t / 64:7.2f} ms/step")

    t0 = time.time()
    integ.step(64)
    jax.block_until_ready(ctx._state.positions)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        integ.step(64)
        jax.block_until_ready(ctx._state.positions)
        best = min(best, time.time() - t0)
    ms = best / 64 * 1e3
    print(f"production integ.step(64)        : {ms:7.2f} ms/step "
          f"({86.4 / ms:.3f} ns/day)")


if __name__ == "__main__":
    main()
