#!/usr/bin/env python
"""One-process TPU batch for the y-chunked Pallas sweep: forced-chunked
parity vs the XLA sweep at 50k atoms, then the 1M-atom point where the
chunked kernel is the AUTO dispatch (the full-layer kernel's VMEM gate
fails at n_yz = 1024): sweep timing + full-step timing.

    python scripts/check_chunked_tpu.py [--skip-parity] [--skip-1m]
                                        [--mol 200000]
"""

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


def build(n_atoms, **kw):
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    system, positions = builders.build_water_box(n_atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair",
                     **kw)
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    return ctx, integ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--mol", type=int, default=200_000)
    args = ap.parse_args()

    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.ops import pallas_sweep

    if not args.skip_parity:
        ctx, integ = build(50_000)
        ctx._ensure_forces()
        integ.step(5)
        nb_fn, nb_params = next(t for t in ctx._terms
                                if hasattr(t[0], "cellpair_cfg"))
        cfg = nb_fn.cellpair_cfg
        st = ctx._state
        box_diag = jnp.diagonal(st.box)
        pme = nb_fn.pme_setup
        _, f_xla = jax.jit(lambda p: cp.pair_energy_forces(
            nb_params, p, box_diag, st.neighbors, cfg, nb_fn.pair_eg,
            nb_fn.coulomb_scale, with_energy=False))(st.positions)
        f_xla = np.asarray(f_xla)
        scale = np.abs(f_xla).max()
        cands = {pallas_sweep.choose_chunk(cfg, jnp.float32, force=True)}
        # add the smallest valid chunk height (exercises multi-chunk
        # overlap-add on chip); Mosaic needs >= 128 pair-tile lanes
        for cy2 in range(1, cfg.grid[1] + 1):
            if cfg.grid[1] % cy2 == 0 and cy2 * cfg.grid[2] >= 128:
                cands.add(cy2)
                break
        for cy in sorted(c for c in cands if c):
            if cfg.grid[1] % cy:
                continue
            f_ch = jax.jit(lambda p: pallas_sweep.pair_forces_pallas_chunked(
                nb_params, p, box_diag, st.neighbors, cfg, "ewald", cy,
                alpha=pme.alpha))(st.positions)
            err = np.abs(np.asarray(f_ch) - f_xla).max() / scale
            print(f"parity 50k chunked cy={cy} grid={cfg.grid}: "
                  f"rel err={err:.3e}")
            assert err < 1e-3, f"chunked/XLA force mismatch {err}"
        print("PASS: chunked Pallas sweep matches the XLA sweep on chip")

    if args.skip_1m:
        return

    # ---- 1M-atom point: chunked kernel engages automatically ------------
    n_atoms = args.mol * 5
    t0 = time.time()
    ctx, integ = build(n_atoms)
    print(f"built {n_atoms} atoms in {time.time() - t0:.0f}s")
    ctx._ensure_forces()
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = nb_fn.cellpair_cfg
    cy = pallas_sweep.choose_chunk(cfg, jnp.float32)
    print(f"grid={cfg.grid} C={cfg.capacity} "
          f"full-layer supports={pallas_sweep.supports(cfg, jnp.float32)} "
          f"chunk cy={cy}")
    st = ctx._state
    box_diag = jnp.diagonal(st.box)

    def sf_scan(positions):
        def body(p, _):
            f = nb_fn.sweep_forces(nb_params, p, box_diag, st.neighbors)
            return p + 0.0 * f, None
        p, _ = jax.lax.scan(body, positions, None, length=8)
        return p
    t = timeit(jax.jit(sf_scan), st.positions)
    print(f"sweep forces ({n_atoms}): {t / 8:7.2f} ms")

    t0 = time.time()
    integ.step(64)
    jax.block_until_ready(ctx._state.positions)
    print(f"first 64 steps (incl. compile) {time.time() - t0:.0f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        integ.step(64)
        jax.block_until_ready(ctx._state.positions)
        best = min(best, time.time() - t0)
    ms = best / 64 * 1e3
    pe = ctx.getState(energy=True).getPotentialEnergy()
    assert np.isfinite(pe), pe
    print(f"{n_atoms} atoms, 1 device: {ms:.1f} ms/step "
          f"({86.4 / ms:.3f} ns/day), PE {pe:.3e} kJ/mol")


if __name__ == "__main__":
    main()
